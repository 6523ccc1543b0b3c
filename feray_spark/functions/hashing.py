"""Record-level version hashing — SURVEY §2.11 FS1.

The reference tracks "data and code version on the record level"
(reference ``README.md:23``) and reports a ``data_version`` per
materialization (``examples/.../ray_external.py:15``); its hashing
primitive is the polars-hash dependency
(``projects/feray/pyproject.toml:26``). Here the record version is a
SHA-256 over a canonicalized rendering of the row, computed JVM-side
(`sha2(concat_ws(...))`) so version injection adds one codegen'd
projection — no Python in the hot path.

Canonicalization rules (must be reproducible by any engine — the
DuckDB oracle recomputes identical hashes):
- column order is the caller's explicit list (never "all columns" —
  schema evolution would silently change every version);
- NULL renders as the sentinel byte 0x00 (Spark's concat_ws would
  otherwise silently skip NULLs — SURVEY §7.6 item 2);
- floats/doubles must be passed through a decimal cast by the caller
  when they are money-like, otherwise repr instability leaks in;
- fields join on the unit-separator byte 0x1f.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_SENTINEL = "\x00"
FIELD_SEP = "\x1f"


def canonical_str(col: str | Column) -> Column:
    """Render one column as its canonical string (NULL -> 0x00)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(NULL_SENTINEL))


def row_version(cols: Sequence[str | Column]) -> Column:
    """The ``_data_version`` column: sha256 hex digest of the
    canonical row rendering."""
    return F.sha2(F.concat_ws(FIELD_SEP, *[canonical_str(c) for c in cols]), 256)
