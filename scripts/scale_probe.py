"""Scale-up probe: measure how query wall-clock GROWS with data size.

The bench gate (bench.py / BENCH_FULL.json) compares absolute times
at sf0.1, where most catalog queries sit on Spark's fixed per-job
floor — the standing argument (docs/BENCH_NOTES.md) is that the
floor AMORTIZES as data grows while DuckDB's runtime grows linearly.
This script measures that claim directly instead of asserting it:
it replicates the sf0.1 fixtures K times (join keys shifted by a
replica offset so every join/group cardinality scales honestly;
every document TOKEN suffixed per replica, which preserves each
replica's internal near-dup structure while zeroing cross-replica
shingle overlap — text dedup work scales exactly K×; embeddings
sign-flip-decorrelated and event timestamps stride-shifted per
replica for the same reason; top-k-similarity and edit-distance ops
are refused, since replicated query sets / barely-shifted
levenshtein pairs would fake quadratic match structure, see
``UNSAFE`` in ``main``) and times
the SAME catalog queries — and
their DuckDB oracle twins — at factor 1 and factor K through the
same writer path (identical layout at both factors, so the ratio
isolates data volume).

The replicated data is DERIVED measurement scaffolding only: every
correctness oracle and test in the repo runs on the driver-provided
fixtures, never on this.

Usage:
    python scripts/scale_probe.py [--factor 8] [--runs 3]
        [--sf-dir /root/testdata/sf0.1] [--queries a1_groupby_q1 ...]

Prints one JSON line: per query, spark/duck medians at both factors
and the growth ratios (t_K / t_1; K is the slope a perfectly linear
engine shows, 1.0 is a pure-floor query).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feray_spark.catalog import TABLES, load_table  # noqa: E402
from feray_spark.queries import load_all  # noqa: E402
from feray_spark.session import get_spark  # noqa: E402

#: replica key offset — far above any fixture key, far below bigint
KEYSPACE = 1 << 33

#: bump when build_scaled's TRANSFORM changes (key shift, text
#: decorrelation): cached scaled data carries this in a marker file,
#: and a mismatch forces a rebuild — the per-table mtime guard only
#: sees fixture regeneration, not probe-logic changes
FORMAT_VERSION = 5  # v5: events ts shift + embedding sign-flip

#: key columns shifted per replica (join semantics scale honestly:
#: each replica joins only within itself, so per-key group sizes stay
#: fixture-sized while the number of keys grows K×)
SHIFT_COLS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # events replicates too (its ts normalizes to micros through the
    # one writer path, identically at both factors) — without this,
    # every events-backed query shows FLAT DuckDB growth and the
    # probe ratio is an artifact of unreplicated input
    "events": ["event_id", "user_id"],
}

#: default probe set — the twelve plan families whose growth curves
#: docs/BENCH_NOTES.md publishes (the default invocation reproduces
#: that table): scan/agg (a1), join chains (ep3c, ep7), the two-sided
#: summary (fs10), per-row text folds (l4), the broadcast tf table
#: (l16), the shuffle+window (l28), and the text-dedup family the
#: token-level decorrelation makes measurable (l1, l1b, l2, l2c, l20)
DEFAULT_QUERIES = [
    "a1_groupby_q1",
    "ep3c_tpch_q3",
    "ep7_priority_lines",
    "fs10_drift_report",
    "l4_text_stats",
    "l16_unigram_logprob",
    "l28_epoch_shuffle",
    "l1_exact_dedup",
    "l1b_canonical_dedup",
    "l2_minhash_lsh_neardups",
    "l2c_ngram_jaccard",
    "l20_span_dedup",
    # round-5 additions (VERDICT r4 item 3): the non-floor >2×
    # residents get growth curves — the deduped-gram leakage join
    # (l31; per-replica token suffixing zeroes cross-replica gram
    # overlap so eval-gram hits scale honestly), the correlated-
    # scalar decorrelation pair (ep5 subquery text / ep5b window
    # rewrite), the HAVING semi-join (ep6), and the multi-job
    # profiling sweep (a12)
    "l31_split_leakage",
    "ep5_correlated_scalar_min",
    "ep5b_window_argmin",
    "ep6_having_semijoin",
    "a12_table_profile",
    # remaining ≥0.9 s sweep residents that replicate honestly: the
    # Python-UDTF per-row path (f5b — token-suffixed docs scale its
    # eval work exactly K×), the pure projection+write (f_math), and
    # the agg+unpartitioned-window share-of-total (ep13)
    "f5b_polymorphic_udtf",
    "f_math_family",
    "ep13_value_share",
    # round-6 additions (VERDICT r5 item 2): the last two perf-weak
    # marks, probe-safe since format v5 — j7b's intervals live in
    # disjoint per-replica time ranges (pairs scale K×), l24's
    # vectors are sign-flip-decorrelated per replica (no cross-
    # replica cosine matches). NOTE l24 keeps the catalog's FIXED
    # n_bits=8 here, so same-bucket pair work grows ~K² for BOTH
    # engines at 256 buckets — the documented scale knob is raising
    # n_bits with the corpus (operators/dedup.py semantic_dedup
    # docstring); docs/BENCH_NOTES.md records the n_bits-scaled
    # operator measurement alongside this fixed-knob curve.
    "j7b_interval_join",
    "l24_semantic_dedup",
    # round-7 additions (VERDICT r6 item 3): the two >1 s over-2×
    # residents that had neither a growth curve nor a same-shape
    # proxy. Both replicate honestly under the source-keyed model —
    # the source SET is fixed while per-source row counts grow K×,
    # exactly how a fixed-provenance corpus grows: l15's per-source
    # cap window and l29's broadcast rate table each do K× more scan
    # work over an unchanged key space.
    "l15_source_cap",
    "l29_temperature_mixture",
]


def scaled_dirs(sf_dir: str, factor: int) -> tuple[str, str]:
    """The shared per-(sf_dir, factor) cache paths for the scaled
    fixtures — THE one place the path scheme lives (this script,
    l24_nbits_probe, ann_recall_probe all reuse the same expensive
    factor-K build through it; a forked scheme would silently
    rebuild or, worse, half-match stale data)."""
    sf_slug = sf_dir.strip("/").replace("/", "_")
    base = os.path.join(tempfile.gettempdir(), f"feray_scale_probe_{sf_slug}")
    return os.path.join(base, "f1"), os.path.join(base, f"f{factor}")


def build_scaled(spark, src_dir: str, out_dir: str, factor: int) -> None:
    """Write a factor-K replication of the fixtures to ``out_dir``
    through one deterministic writer path (both factors get the same
    layout). Untouched dimension tables are file-copied."""
    marker = os.path.join(out_dir, ".format_version")
    if os.path.isdir(out_dir):
        try:
            with open(marker) as fh:
                cached = fh.read().strip()
        except OSError:
            cached = None
        if cached != str(FORMAT_VERSION):
            shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    with open(marker, "w") as fh:
        fh.write(str(FORMAT_VERSION))
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dst):
            # cache is per-(sf_dir, factor) by path; still guard
            # against regenerated fixtures: stale scaled data would
            # publish growth ratios for the wrong dataset
            if os.path.getmtime(dst) >= os.path.getmtime(src):
                continue
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.exists(dst):
                os.remove(dst)
        if t not in SHIFT_COLS:
            shutil.copy(src, dst)
            continue
        # load_table, not a raw read: it owns the events.ts
        # nanosAsLong normalization (CLAUDE.md rule), so the probe's
        # writer path can never diverge from what the queries read
        df = load_table(spark, src_dir, t)
        reps = spark.range(factor).withColumnRenamed("id", "__r")
        wide = df.crossJoin(F.broadcast(reps))
        for c in SHIFT_COLS[t]:
            wide = wide.withColumn(c, F.col(c) + F.col("__r") * F.lit(KEYSPACE))
        if t == "events":
            # disjoint per-replica TIME ranges (fixture spans ~30
            # days; 64-day stride > 2x margin): interval/overlap
            # joins (j7b's keyless bin join) pair only within a
            # replica, so pair counts scale exactly Kx — identically
            # replicated timestamps would overlap every replica with
            # every other and manufacture K^2 pair growth the engine
            # never sees on real data
            wide = wide.withColumn(
                "ts", F.expr("ts + make_dt_interval(__r * 64, 0, 0, 0)")
            )
        if t == "embeddings":
            # decorrelate vectors per replica with a deterministic
            # DIAGONAL SIGN FLIP (multiply component i by ±1 drawn
            # from xxhash64(replica, i)): an orthogonal transform, so
            # every within-replica inner product / cosine / sign
            # bucket population is preserved EXACTLY (each replica
            # keeps the fixture's full similarity structure), while
            # cross-replica cosines collapse to ~N(0, 1/sqrt(64)) —
            # identically replicated vectors would form exact-match
            # K-cliques (the old UNSAFE rule). Semantic-dedup /
            # cosine-threshold ops now scale honestly.
            wide = wide.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, i: F.when(
                        F.xxhash64(F.col("__r"), i) % 2 == 0, x
                    ).otherwise(-x),
                ),
            )
        if t == "documents":
            # decorrelate content per replica at the TOKEN level:
            # suffixing every token keeps each replica's internal
            # near-dup structure identical to the fixture's (all docs
            # in a replica transform alike, so Jaccard within a
            # replica is unchanged) while making cross-replica
            # shingle overlap zero — near-dup work scales exactly K×
            # instead of manufacturing K-cliques of candidates
            # fixed-width suffix: equal-length suffixes make collisions
            # impossible across replicas (t1+s1 == t2+s2 with |s1|=|s2|
            # forces t1=t2, s1=s2), where bare ids would alias e.g.
            # fixture token 'foo1'+replica 0 with 'foo'+replica 10
            wide = wide.withColumn(
                "text",
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(
                        F.lit("$1"),
                        F.lpad(F.col("__r").cast("string"), 2, "0"),
                    ),
                ),
            )
        (
            wide.drop("__r")
            .coalesce(max(1, factor // 2))
            .write.mode("overwrite")
            .parquet(dst + ".dir")
        )
        # single-file layout like the fixtures is unnecessary; the
        # catalog reads a directory path the same as a file path
        os.rename(dst + ".dir", dst)


def time_spark(spark, names, sf_dir, runs):
    registry = load_all()
    samples = {n: [] for n in names}
    for _ in range(runs):
        for n in names:
            t0 = time.perf_counter()
            registry[n].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[n].append(time.perf_counter() - t0)
    return {n: round(sorted(s)[(len(s) - 1) // 2], 4) for n, s in samples.items()}


def time_duck(names, sf_dir, runs):
    import duckdb

    registry = load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet') "
            if os.path.isdir(os.path.join(sf_dir, f"{t}.parquet"))
            else f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    samples = {n: [] for n in names}
    for _ in range(runs):
        for n in names:
            t0 = time.perf_counter()
            con.sql(registry[n].oracle).fetchall()
            samples[n].append(time.perf_counter() - t0)
    return {n: round(sorted(s)[(len(s) - 1) // 2], 4) for n, s in samples.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=8,
                    choices=range(1, 100), metavar="1-99")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES
    registry = load_all()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    # TEXT shingle-based near-dup ops are safe: the per-token replica
    # suffix keeps within-replica dup structure and zeroes
    # cross-replica shingle overlap, so their work scales K× honestly.
    # Since format v5 the same holds for threshold-cosine ops over
    # embeddings: the per-replica sign flip preserves within-replica
    # structure exactly and kills cross-replica matches — l24 is
    # therefore probe-safe. Still NOT safe: (a) TOP-K similarity ops
    # (l3/l3b/l3c/l21/l2d) — k-nearest work scales with queries ×
    # corpus, so replicating BOTH sides measures K² of honest work
    # that a fixed-query-set deployment never runs; publish those
    # curves only with a fixed query side; (b) EDIT-DISTANCE matching
    # (l19) — the suffix shifts levenshtein by only ~1 char per
    # token, far below match thresholds, so replicas still pair up
    # (quadratic growth manufactured by the probe data): refuse
    # rather than publish that artifact.
    UNSAFE = {
        n
        for n, q in registry.items()
        if "similarity" in q.tags and n != "l24_semantic_dedup"
    }
    UNSAFE.add("l19_fuzzy_blocked_pairs")
    bad = [n for n in names if n in UNSAFE]
    if bad:
        raise SystemExit(
            f"similarity/edit-distance queries are not meaningful on "
            f"replicated data (replicas form match K-cliques): {bad}"
        )

    spark = get_spark(app_name="feray-scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    d1, dk = scaled_dirs(args.sf_dir, args.factor)
    build_scaled(spark, args.sf_dir, d1, 1)
    build_scaled(spark, args.sf_dir, dk, args.factor)

    # warm page cache for both factors off the clock
    for d in (d1, dk):
        for t in TABLES:
            spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()

    s1 = time_spark(spark, names, d1, args.runs)
    sk = time_spark(spark, names, dk, args.runs)
    k1 = time_duck(names, d1, args.runs)
    kk = time_duck(names, dk, args.runs)

    out = {"factor": args.factor, "runs": args.runs, "queries": {}}
    for n in names:
        out["queries"][n] = {
            "spark_t1": s1[n],
            "spark_tk": sk[n],
            "spark_growth": round(sk[n] / s1[n], 2) if s1[n] else None,
            "duck_t1": k1[n],
            "duck_tk": kk[n],
            "duck_growth": round(kk[n] / k1[n], 2) if k1[n] else None,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
