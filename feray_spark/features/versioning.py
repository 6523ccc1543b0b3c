"""Record- and code-level versioning — SURVEY §2.11 FS1/FS2.

The reference: "data and code version are tracked on the record
level" (``README.md:23``), with ``data_version`` reported per
materialization (``examples/.../ray_external.py:15``). Here:

- ``_data_version`` (FS1): sha256 of the canonical row rendering
  (:func:`feray_spark.functions.hashing.row_version`) — one codegen'd
  projection appended before every sink write.
- ``_code_version`` (FS2): sha256 fingerprint of the feature
  function's source text — the Dagster code-version caching model
  (reference ``README.md:31``), used by the FS3 memoization gate.
"""

from __future__ import annotations

import hashlib
import inspect
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feray_spark.functions.hashing import row_version

DATA_VERSION_COL = "_data_version"
CODE_VERSION_COL = "_code_version"


def with_data_version(
    df: DataFrame, cols: Sequence[str | Column] | None = None
) -> DataFrame:
    """FS1: inject the record-level content hash.

    ``cols`` defaults to every current column in declaration order.
    That default deliberately trades churn for safety, against
    functions/hashing.py's explicit-list rule: when the view's schema
    evolves, every row's version CHANGES and the FS3 memo recomputes —
    wasteful, but never stale (the dangerous direction is an unchanged
    version over changed data, which the all-columns default cannot
    produce). Views whose schema is expected to evolve should declare
    an explicit stable ``version_cols`` list so additive columns don't
    bust their memo."""
    cols = list(cols) if cols is not None else [c for c in df.columns]
    return df.withColumn(DATA_VERSION_COL, row_version(cols))


def code_version(fn: Callable) -> str:
    """FS2: fingerprint of a feature function. Source text (not
    bytecode) so it is stable across interpreter versions.

    Fallback ladder for callables without retrievable source, chosen
    so the fingerprint is (a) deterministic across processes — a
    repr() with a memory address would bust the memo every run — and
    (b) sensitive to code changes where possible:

    - ``functools.partial``: recurse on the wrapped function and fold
      in the bound args (two partials of one fn with different args
      are different code).
    - callable instance: the CLASS's source (its ``__call__`` is the
      code), falling back to the class qualname.
    - source-less function (REPL lambda, exec): qualname + the
      compiled bytecode + constants, which distinguishes two distinct
      same-name lambdas deterministically within a Python version.
    """
    import functools

    if isinstance(fn, functools.partial):
        inner = code_version(fn.func)
        bound = repr((fn.args, sorted(fn.keywords.items() if fn.keywords else [])))
        return hashlib.sha256(f"partial:{inner}:{bound}".encode()).hexdigest()
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        code = getattr(fn, "__code__", None)
        if code is not None:
            src = (
                f"{getattr(fn, '__qualname__', '?')}:"
                f"{code.co_code.hex()}:{code.co_consts!r}:{code.co_names!r}"
            )
        elif not inspect.isfunction(fn) and not inspect.ismethod(fn):
            # callable instance: the class body is the code
            try:
                src = inspect.getsource(type(fn))
            except (OSError, TypeError):
                src = f"{type(fn).__module__}.{type(fn).__qualname__}"
        else:  # pragma: no cover - function without __code__
            src = getattr(fn, "__qualname__", type(fn).__qualname__)
    return hashlib.sha256(src.encode()).hexdigest()


def with_versions(
    df: DataFrame,
    fn: Callable,
    version_cols: Sequence[str | Column] | None = None,
) -> DataFrame:
    """Inject both FS1 and FS2 columns."""
    return with_data_version(df, version_cols).withColumn(
        CODE_VERSION_COL, F.lit(code_version(fn))
    )
