"""Grouped custom aggregation at scale — SURVEY §2.10 F3/F4 scale path.

``applyInPandas`` pays a Python + pandas-object cost PER GROUP. For
coarse groups (hundreds) that's free; for high-cardinality keys
(millions of entities at 100 TB) the per-group overhead dominates —
at sf0.1 already, 15k one-row-ish groups cost ~10x the query's real
work.

:func:`grouped_partial_agg` is the scale shape for that regime:
repartition on the key (every key fully inside one partition — the
only shuffle), then ONE ``mapInPandas`` per partition that
- computes vectorized per-batch partial aggregates (C-speed pandas
  groupby, no per-group Python), and
- combines partials across batches at partition end (count→sum,
  min→min, max→max are algebraic), holding O(#keys-in-partition)
  state, never O(rows).

Same result as applyInPandas, per-batch Python cost instead of
per-group.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: algebraic reducers: (per-batch pandas agg, cross-batch combine).
#: NOTE on 'sum' over doubles: partials accumulate in float across
#: arbitrary Arrow-batch boundaries, so the low bits are
#: order-dependent — fine for analytics, NOT oracle-hash-stable.
#: Money sums that must match a SQL twin bit-for-bit belong on the
#: queries/util.py dsum (scaled-long/decimal) path, not here.
_COMBINE = {"count": "sum", "min": "min", "max": "max", "sum": "sum"}


def grouped_partial_agg(
    df: DataFrame,
    key: str,
    val: str,
    ops: tuple[str, ...] = ("count", "min", "max"),
    *,
    out_names: tuple[str, ...] | None = None,
    out_types: tuple[str, ...] | None = None,
) -> DataFrame:
    """Per-key aggregates of ``val`` with algebraic ops, computed as
    batch-partial + partition-combine. Output columns: key, then one
    per op (default names ``<op>_<val>``)."""
    for op in ops:
        if op not in _COMBINE:
            raise ValueError(f"non-algebraic op {op!r}; use applyInPandas")
    names = list(out_names or [f"{op}_{val}" for op in ops])
    types = list(out_types or ["double"] * len(ops))
    if len(names) != len(ops) or len(types) != len(ops):
        # zip below would silently truncate the schema and surface as
        # an opaque executor-side length mismatch
        raise ValueError(
            f"out_names/out_types must match ops: {len(ops)} ops, "
            f"{len(names)} names, {len(types)} types"
        )
    key_type = dict(df.dtypes)[key]
    schema = ", ".join(
        [f"{key} {key_type}"] + [f"{n} {t}" for n, t in zip(names, types)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        partials: list[pd.DataFrame] = []
        for pdf in batches:
            if len(pdf):
                # dropna=False: Spark groupBy (and applyInPandas) emit
                # a NULL-key group; pandas' default would silently
                # drop those rows and diverge from the contract
                partials.append(
                    pdf.groupby(key, dropna=False)[val].agg(list(ops))
                )
        if not partials:
            return
        merged = pd.concat(partials)
        out = merged.groupby(level=0, dropna=False).agg(
            {op: _COMBINE[op] for op in ops}
        ).reset_index()
        out.columns = [key] + names
        yield out

    return df.select(key, val).repartition(key).mapInPandas(run, schema)
