"""Measure the DuckDB baseline: wall-clock per oracle query at a given
scale factor, on this machine. Output: one JSON line compatible with
bench.py's shape, for BASELINE.md's per-query table.

DuckDB runs each oracle SQL with default config (all cores), results
materialized to an Arrow table (analog of bench.py's noop write —
forces full execution without driver-side formatting cost).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import __spark_entry__ as E

    osql = E.oracle_sql()
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")  # Spark session TZ is pinned UTC; match it
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    # warm the page cache like bench.py does
    for t in TABLES:
        con.sql(f"SELECT count(*) FROM {t}").fetchall()

    timings: dict[str, float] = {}
    for name, sql in sorted(osql.items()):
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            con.sql(sql).arrow()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[(len(samples) - 1) // 2], 4)

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_total_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
