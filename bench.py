"""Bench harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line with per-query wall-clock seconds.

Each query is executed once as a warm-up-free timed run (the session
itself is warmed by a trivial action first so JVM startup isn't
attributed to the first query). ``--runs N`` takes the median of N.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from feray_spark.queries import load_all
from feray_spark.session import get_spark

#: queries excluded from the bench: side-effecting (their wall-clock
#: is dominated by table-store WRITES while the DuckDB oracle only
#: reads — structurally incomparable) or trivially tiny round-trips
BENCH_SKIP = {
    "s6_csv_roundtrip",
    "s6b_ndjson_roundtrip",
    "s7_inmemory_rows",
    "s2_table_store_time_travel",
    "s9_metadata_sink",
    "fs3_memoization",
    "fs6_feature_flags",
    "fs7_backfill",
}


def run_bench(sf_dir: str, runs: int = 1, names: list[str] | None = None) -> dict:
    registry = load_all()
    selected = {
        n: q
        for n, q in registry.items()
        if n not in BENCH_SKIP and (names is None or n in names)
    }
    spark = get_spark(app_name="feray-spark-bench")
    # warm the JVM, parquet footers and OS page cache off the clock
    # (the DuckDB baseline is measured page-cache-warm too)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # warm the Arrow python-UDF workers: the first pandas-UDF job of a
    # session forks 32 python workers (~3-4 s) — a one-time session
    # cost that would otherwise be attributed to whichever UDF query
    # happens to run first (the DuckDB baseline is process-warm too)
    spark.range(32).repartition(32).mapInPandas(
        lambda it: (b for b in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    from feray_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    import gc

    # interleaved sweeps: run the WHOLE query set once per sweep and
    # take each query's median across sweeps. The box shows transient
    # slow phases lasting minutes; back-to-back repeats would put all
    # of a query's samples inside one bad phase, while interleaving
    # taints at most one sample of each query — the median survives.
    samples: dict[str, list[float]] = {n: [] for n in selected}
    for _ in range(runs):
        for name, q in selected.items():
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            # off-clock hygiene between queries: drop py4j refs from
            # finished plans so the JVM can collect them; keeps late
            # queries from paying for the session's history
            gc.collect()
    timings: dict[str, float] = {}
    for name, ss in samples.items():
        ss.sort()
        timings[name] = round(ss[(len(ss) - 1) // 2], 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "total_wall_clock_all_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "runs_per_query": runs,
    }
    spark.stop()
    return result


#: printed-line budget. The round-1 driver stored only the last 2000
#: chars of stdout and failed to parse the full ~2800-char JSON line
#: (BENCH_r01.json: "parsed": null, tail cut mid-dict). The full
#: result always lands in BENCH_FULL.json; the printed line keeps the
#: slowest queries (the informative ones — sub-0.4s entries sit at
#: Spark's fixed per-query scheduling floor) and rolls the rest up.
LINE_BUDGET = 1850
FULL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")


def compact_line(result: dict, budget: int = LINE_BUDGET) -> str:
    """One parseable JSON line under ``budget`` chars: headline
    metric + as many per-query timings as fit, slowest first."""
    timings = result["queries"]
    base = {k: v for k, v in result.items() if k != "queries"}
    base["full"] = os.path.basename(FULL_PATH)
    keep: dict[str, float] = {}
    out = base | {"queries": keep, "omitted": 0, "omitted_sum": 0.0}

    def render() -> str:
        return json.dumps(out, separators=(",", ":"))

    for name in sorted(timings, key=timings.get, reverse=True):
        keep[name] = round(timings[name], 2)
        out["omitted"] = len(timings) - len(keep)
        out["omitted_sum"] = round(
            sum(v for n, v in timings.items() if n not in keep), 2
        )
        if len(render()) > budget:
            del keep[name]
            out["omitted"] = len(timings) - len(keep)
            out["omitted_sum"] = round(
                sum(v for n, v in timings.items() if n not in keep), 2
            )
            break
    return render()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    # median of 3 is the BASELINE.md protocol (the DuckDB baseline is
    # measured the same way): run 1 absorbs per-plan codegen JIT that
    # amortizes to nothing at real scale, runs 2-3 measure the engine
    # median of 5: this box shows stochastic multi-second spikes (VM
    # noise / GC); 5 samples keep the median robust to two bad runs
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()
    result = run_bench(args.sf_dir, args.runs, args.queries)
    with open(FULL_PATH, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(compact_line(result))


if __name__ == "__main__":
    main()
