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
- every field renders PREFIX-FREE: NULL is the one-byte frame ``n``;
  a value renders ``v<charlen>:<value>``. Length framing makes the
  rendering injective — no separator byte can collide with value
  content (('a\\x1fb','c') vs ('a','b\\x1fc')), and a real one-byte
  string can never alias NULL — so distinct rows get distinct
  pre-images by construction;
- floats/doubles must be passed through a decimal cast by the caller
  when they are money-like, otherwise repr instability leaks in;
- frames concatenate directly (self-delimiting, no separator).

The DuckDB twin of one frame:
``CASE WHEN x IS NULL THEN 'n'
  ELSE 'v' || length(CAST(x AS VARCHAR)) || ':' || CAST(x AS VARCHAR)
  END``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_str(col: str | Column) -> Column:
    """Render one column as its canonical prefix-free frame
    (``n`` for NULL, ``v<len>:<value>`` otherwise)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.when(s.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), F.length(s).cast("string"), F.lit(":"), s)
    )


def row_version(cols: Sequence[str | Column]) -> Column:
    """The ``_data_version`` column: sha256 hex digest of the
    canonical row rendering (concatenated self-delimiting frames)."""
    return F.sha2(F.concat(*[canonical_str(c) for c in cols]), 256)
