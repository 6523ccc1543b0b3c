"""Empty-input robustness: every catalog entry must be WELL-DEFINED on
zero-row tables.

At 100 TB the empty case is not hypothetical — partition pruning, a
`replaceWhere` backfill window with no data, a fresh incremental-ingest
run, or a filter that matches nothing all hand operators empty inputs.
An operator that throws (driver-side ``collect()[0]`` on an empty
verdict, division by a zero corpus total, k-means over zero vectors)
would kill a 1000-executor job at the last stage; the contract here is
"empty in → defined (usually empty) out, never an exception".

The fixture clones every table's exact parquet schema (including the
nanosecond ``events.ts``) with zero rows via pyarrow, so the sweep
exercises the same load/normalize paths as the real data.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from feray_spark.queries import load_all

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory, sf_dir) -> str:
    root = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(os.path.join(sf_dir, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), str(root / f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", sorted(load_all()))
def test_catalog_entry_defined_on_empty_tables(spark, empty_sf_dir, name):
    q = load_all()[name]
    rows = q.fn(spark, empty_sf_dir).collect()
    assert rows is not None  # no exception = the contract; rows may be []
