

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


def test_hll_sketches_union_across_persisted_batches(spark, sf_dir, tmp_path):
    """The A5b scale contract: per-batch HLL sketch state persisted in
    a TableStore answers distinct-count rollups WITHOUT rescanning raw
    rows — the union over stored batch sketches estimates within
    sketch error of the exact distinct count over all rows. (Merged
    and direct sketches are deliberately NOT asserted equal:
    Datasketches unions promote sparse-mode state, so estimates can
    differ slightly — both must sit inside the bound.)"""
    from pyspark.sql import functions as F

    from feray_spark.catalog import load_table
    from feray_spark.sources.table_store import TableStore

    o = load_table(spark, sf_dir, "orders")
    store = TableStore(str(tmp_path / "sketches"))
    for batch in (
        o.filter(F.col("o_orderkey") % 2 == 0),
        o.filter(F.col("o_orderkey") % 2 == 1),
    ):
        store.write(
            batch.groupBy("o_orderpriority").agg(
                F.hll_sketch_agg("o_custkey").alias("sk")
            ),
            "cust_sketches",
            mode="append",
        )
    rolled = (
        store.read(spark, "cust_sketches")
        .groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    truth = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("direct"),
    )
    rows = rolled.join(truth, "o_orderpriority").collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r.est / r.exact - 1.0) <= 0.15, (r.o_orderpriority, r.est, r.exact)
        assert abs(r.direct / r.exact - 1.0) <= 0.15, (r.o_orderpriority, r.direct, r.exact)


def test_ann_operators_accept_empty_query_set(spark, sf_dir):
    """A filter that matches nothing (or an empty micro-batch) hands
    the ANN operators ZERO query vectors; both broadcast paths must
    return an empty typed frame instead of crashing on the collapsed
    (0, 0) driver matrix."""
    from pyspark.sql import functions as F

    from feray_spark.catalog import load_table
    from feray_spark.operators.similarity import ivf_topk, lsh_bucketed_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.lit(False)).select(F.col("vec_id").alias("q_id"), "embedding")
    c = e.select(F.col("vec_id").alias("c_id"), "embedding")
    for ann in (ivf_topk(q, c, k=3), lsh_bucketed_topk(q, c, k=3)):
        assert ann.count() == 0


def test_asof_map_tiebreak_canonicalizes_entry_order(spark):
    """Two semantically equal maps built in different entry orders
    must hash to the SAME tiebreak surrogate — the winner at a
    same-(key, ts) tie cannot depend on how a pipeline happened to
    construct the map."""
    from pyspark.sql import functions as F

    from feray_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, ts long")

    def right(order_flip: bool):
        pairs = [("a", 1), ("z", 9)]
        if order_flip:
            pairs = pairs[::-1]
        m1 = F.map_from_arrays(
            F.array(*[F.lit(k) for k, _ in pairs]),
            F.array(*[F.lit(v) for _, v in pairs]),
        )
        # the competing row is a distinct map; also order-flipped
        m2 = F.map_from_arrays(
            F.array(*[F.lit(k) for k, _ in reversed(pairs)]),
            F.array(*[F.lit(v + 100) for _, v in reversed(pairs)]),
        )
        base = spark.createDataFrame([(1, 5)], "k long, ts long")
        return base.select("k", "ts", m1.alias("attrs")).unionAll(
            base.select("k", "ts", m2.alias("attrs"))
        )

    wins = set()
    for flip in (False, True):
        row = asof_join(
            left, right(flip), ["k"], "ts", right_cols=["attrs"]
        ).collect()[0]
        wins.add(tuple(sorted(row.attrs.items())))
    assert len(wins) == 1, f"construction order changed the winner: {wins}"
