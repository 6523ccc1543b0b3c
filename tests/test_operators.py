

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


def test_ann_paths_tolerate_null_embeddings(spark):
    """One NULL embedding row must not kill the job on any ANN path
    (np.stack over a None-bearing Arrow batch) — NULL vectors simply
    drop, exactly like the fold path's NULL-cosine filter."""
    from feray_spark.operators.similarity import (
        embedding_neardup_pairs,
        exact_scan_topk,
        ivf_topk,
        lsh_bucketed_topk,
    )

    rows = [(i, [float(i + d) for d in range(4)]) for i in range(12)]
    rows += [(98, None), (99, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id IN (0, 98)").selectExpr(
        "vec_id AS q_id", "embedding"
    )
    c = df.selectExpr("vec_id AS c_id", "embedding")

    got = exact_scan_topk(q, c, k=3).collect()
    assert {r.q_id for r in got} == {0}  # NULL query vanished
    assert all(r.c_id not in (98, 99) for r in got)
    for fn in (
        lambda: lsh_bucketed_topk(q, c, k=3, dim=4),
        lambda: lsh_bucketed_topk(q, c, k=3, dim=4, broadcast_queries=False),
        lambda: ivf_topk(q, c, k=3, centroid_stride=3, nprobe=4),
    ):
        out = fn().collect()
        assert all(r.c_id not in (98, 99) and r.q_id == 0 for r in out)
    pairs = embedding_neardup_pairs(
        df, id_col="vec_id", tau=0.9
    ).collect()
    assert all(98 not in (r.id_a, r.id_b) and 99 not in (r.id_a, r.id_b)
               for r in pairs)


def test_ivf_topk_string_ids_keep_real_cell_plan(spark):
    """String corpus ids must hash-sample real seed cells — the old
    (id % stride) predicate cast strings to NULL, matched nothing,
    and silently degraded to an 8-cell brute-force scan."""
    import numpy as np

    from feray_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(7)
    rows = [
        (f"doc_{i}", [float(x) for x in rng.standard_normal(8)])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    q = df.limit(5).selectExpr("doc_id AS q_id", "embedding")
    c = df.selectExpr("doc_id AS c_id", "embedding")
    got = ivf_topk(
        q, c, query_id="q_id", corpus_id="c_id", k=3,
        centroid_stride=10, nprobe=4,
    ).collect()
    # approximate path: every query returns <= k ranked rows
    per_q = {}
    for r in got:
        per_q.setdefault(r.q_id, []).append(r.rank)
    assert per_q and all(sorted(v) == list(range(1, len(v) + 1))
                         for v in per_q.values())


def test_salted_join_guards_and_determinism(spark):
    """salts<1 fails fast (pmod NULL would silently return 0 rows);
    the salt is a content hash, so the join result equals the plain
    join even with exact-duplicate rows in play."""
    import pytest as _pytest

    from feray_spark.operators.skew import salted_join

    large = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    small = spark.createDataFrame([(1, "X"), (3, "Y")], "k long, w string")
    with _pytest.raises(ValueError, match="salts must be"):
        salted_join(large, small, ["k"], salts=0)
    got = sorted(
        (r.k, r.v, r.w) for r in salted_join(large, small, ["k"], salts=4).collect()
    )
    want = sorted((r.k, r.v, r.w) for r in large.join(small, "k").collect())
    assert got == want


def test_point_interval_join_dirty_interval_valve(spark):
    """One corrupt wide interval fails loudly with the knob named,
    instead of asking sequence() for 70M elements and killing the
    join; reserved __rj_* names are rejected up front."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from feray_spark.operators.rangejoin import point_interval_join

    pts = spark.createDataFrame(
        [(1, "2024-01-01 05:30:00")], "pid long, ts string"
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "9999-12-31 00:00:00")],
        "iid long, lo string, hi string",
    ).select(
        "iid",
        F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"),
    )
    with _pytest.raises(Exception, match="max_bins_per_interval"):
        point_interval_join(
            pts, iv, point_ts="ts", interval_lo="lo", interval_hi="hi"
        ).count()
    with _pytest.raises(ValueError, match="reserves column"):
        point_interval_join(
            pts.withColumn("__rj_bin", F.lit(1)), iv,
            point_ts="ts", interval_lo="lo", interval_hi="hi",
        )


def test_isolated_map_rejects_missing_id_col(spark):
    from feray_spark.operators.fanout import isolated_map

    df = spark.createDataFrame([(1, 2.0)], "event_id long, x double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in the input columns"):
        isolated_map(df, lambda r: r["x"], id_col="event_ID_typo")


def test_events_nanos_floor_pre_epoch(spark, tmp_path):
    """Nanos->micros must FLOOR for both signs: a pre-epoch -1500 ns
    is -2 us, not the toward-zero -1 us."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from feray_spark.catalog import normalize_events_ts

    p = str(tmp_path / "e.parquet")
    pq.write_table(pa.table({"ts": pa.array([-1500, 1500], pa.int64())}), p)
    df = spark.read.parquet(p)
    out = normalize_events_ts(df).selectExpr("unix_micros(ts) AS us")
    assert sorted(r.us for r in out.collect()) == [-2, 1]


def test_external_job_tolerates_non_utf8_channel(tmp_path):
    """A binary/latin-1 channel file degrades to an empty report (the
    documented contract), never an escaping UnicodeDecodeError."""
    import sys

    from feray_spark.external import CHANNEL_ENV, run_external_job

    script = tmp_path / "bad_channel.py"
    script.write_text(
        "import os\n"
        f"open(os.environ['{CHANNEL_ENV}'], 'wb').write(b'\\xff\\xfe junk')\n"
        "print('done')\n"
    )
    res = run_external_job([sys.executable, str(script)])
    assert res.returncode == 0
    assert res.metadata == {} and res.data_version is None


def test_stage_root_rejects_loose_permissions(tmp_path, monkeypatch):
    import os

    import pytest as _pytest

    from feray_spark.sources.staging import private_stage_root, stage_single_file

    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    root = private_stage_root("t1")
    assert oct(os.lstat(root).st_mode & 0o777) == "0o700"
    os.chmod(root, 0o775)
    with _pytest.raises(RuntimeError, match="group/world accessible"):
        private_stage_root("t1")
    os.chmod(root, 0o700)
    # a planted symlink tag dir is refused, not followed
    src = tmp_path / "data.parquet"
    src.write_bytes(b"x")
    import hashlib

    tag = hashlib.sha256(str(src).encode()).hexdigest()[:12]
    evil = tmp_path / "evil"
    evil.mkdir()
    os.symlink(evil, os.path.join(root, tag))
    with _pytest.raises(RuntimeError, match="not owned|stage dir"):
        stage_single_file(str(src), root)


def test_cosine_fold_and_batch_agree_on_every_degenerate_input(spark):
    """The fold and batch cosine paths must agree row-for-row on the
    degenerate inputs: clean pair (equal values), NaN ELEMENT (both
    NaN — desc-sorts FIRST), zero-norm / NULL vector / ragged pair
    (both NULL — desc-sorts LAST). A NaN-vs-NULL swap between the
    paths reorders any top-k that switches scorer."""
    import math

    from feray_spark.functions.vectors import (
        cosine_similarity,
        cosine_similarity_batch,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], [1.0, 2.0]),
            (2, [float("nan"), 1.0], [1.0, 1.0]),
            (3, [0.0, 0.0], [1.0, 1.0]),
            (4, None, [1.0, 1.0]),
            (5, [1.0], [1.0, 2.0]),
        ],
        "id long, a array<double>, b array<double>",
    )
    rows = df.select(
        "id",
        cosine_similarity("a", "b").alias("fold"),
        cosine_similarity_batch("a", "b").alias("batch"),
    ).collect()
    for r in rows:
        if r.fold is None:
            assert r.batch is None, r
        elif math.isnan(r.fold):
            assert r.batch is not None and math.isnan(r.batch), r
        else:
            assert r.fold == r.batch, r
