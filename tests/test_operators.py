

def test_asof_all_map_payload_deterministic_tiebreak(spark):
    """When EVERY right payload column is unorderable (map-typed),
    the tiebreaker must fall back to a payload-hash surrogate rather
    than an empty struct — same-(key, ts) ties then break identically
    on every run/partitioning instead of arbitrarily."""
    from feray_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 5, {"a": 1}), (1, 5, {"z": 9})],
        "k long, ts long, attrs map<string,long>",
    )
    outs = set()
    for _ in range(3):
        row = asof_join(
            left.repartition(4), right.repartition(3), ["k"], "ts",
            right_cols=["attrs"],
        ).collect()[0]
        outs.add(tuple(sorted(row.attrs.items())))
    assert len(outs) == 1, f"tie broke nondeterministically: {outs}"
