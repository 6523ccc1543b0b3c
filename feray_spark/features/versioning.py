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
      are different code) via :func:`_stable_repr` — a bound object
      whose repr would embed a memory address degrades to its type
      name rather than busting the memo every interpreter run.
    - callable instance: the CLASS's source (its ``__call__`` is the
      code) PLUS the instance's ``__dict__`` under the same stable
      repr — ``Scaler(2)`` and ``Scaler(3)`` are different code; an
      attribute holding a default-repr object contributes only its
      type (the deterministic-over-sensitive trade, documented here).
    - source-less function (REPL lambda, exec): qualname + the
      compiled bytecode + constants, which distinguishes two distinct
      same-name lambdas deterministically within a Python version.
    """
    import functools

    if isinstance(fn, functools.partial):
        inner = code_version(fn.func)
        kw = sorted(fn.keywords.items()) if fn.keywords else []
        bound = _stable_repr((fn.args, kw))
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
            # callable instance: the class body is the code, and the
            # instance STATE is configuration — two instances of one
            # class with different attributes are different features
            try:
                src = inspect.getsource(type(fn))
            except (OSError, TypeError):
                src = f"{type(fn).__module__}.{type(fn).__qualname__}"
            state = getattr(fn, "__dict__", None)
            if state:
                src += ":" + _stable_repr(sorted(state.items()))
        else:  # pragma: no cover - function without __code__
            src = getattr(fn, "__qualname__", type(fn).__qualname__)
    return hashlib.sha256(src.encode()).hexdigest()


def _stable_repr(v) -> str:
    """repr() that is deterministic across processes: containers
    recurse; a default ``object.__repr__`` (which embeds a memory
    address and would bust the memo every run) degrades to the
    type's qualified name."""
    if isinstance(v, (list, tuple)):
        inner = ", ".join(_stable_repr(x) for x in v)
        return f"({inner})" if isinstance(v, tuple) else f"[{inner}]"
    if isinstance(v, (set, frozenset)):
        # set repr order follows hash randomization — the exact
        # cross-process instability this helper exists to remove.
        # Sort on the elements' stable reprs (not the elements: a
        # mixed-type set would TypeError on direct comparison)
        inner = ", ".join(sorted(_stable_repr(x) for x in v))
        return "{" + inner + "}"
    if isinstance(v, dict):
        # keys order by their STABLE REPR (not native comparison —
        # mixed-type keys would TypeError). NOTE this is the
        # serialization contract from the version that introduced
        # set-handling onward: an int-keyed dict spanning digit
        # counts ({2: .., 10: ..}) serializes in repr order ('10'
        # before '2'), so fingerprints computed by earlier builds
        # differ once — a one-time, safe-direction (recompute) miss.
        items = ", ".join(
            f"{k_r}: {_stable_repr(x)}"
            for k_r, x in sorted(
                ((_stable_repr(k), x) for k, x in v.items()),
                key=lambda t: t[0],
            )
        )
        return "{" + items + "}"
    r = repr(v)
    if " at 0x" in r:
        return f"<{type(v).__module__}.{type(v).__qualname__}>"
    return r


def with_versions(
    df: DataFrame,
    fn: Callable,
    version_cols: Sequence[str | Column] | None = None,
) -> DataFrame:
    """Inject both FS1 and FS2 columns."""
    return with_data_version(df, version_cols).withColumn(
        CODE_VERSION_COL, F.lit(code_version(fn))
    )
