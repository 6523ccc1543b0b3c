"""Pure interval (range) join — SURVEY §2.3 J7's keyless form.

Reference surface: polars ``join_where`` with interval conjunctions
(declared engine dep, reference ``projects/feray/pyproject.toml:25``)
— polars evaluates these single-node; this module is the
distributed re-expression.

J7's equi-key variant (time-window residual on top of a key join,
`queries/joins.py::j7_range_join`) needs nothing special: the key
carries the join. This module covers the genuinely hard case — the
join condition is ONLY ``point.ts ∈ [interval.lo, interval.hi)`` —
where Catalyst's fallback is a broadcast-nested-loop (every point ×
every interval: O(n·m) compares and a broadcast bound), which does
not survive two large sides.

The scale shape is the classic **bin join**: quantize time into
fixed-width bins, explode each interval into the bins it covers,
tag each point with its single bin, equi-join on the bin id, and
re-check the exact residual predicate. Each (interval, point) match
shares exactly one bin — the point's — so no dedup pass is needed.

Cost model (100 TB posture):
- shuffle is keyed on the bin id — time-uniform data gives uniform
  keys; bursts concentrate in few bins and AQE skew-splitting
  applies (the residual check is per-row cheap either way);
- interval-side blowup = ceil(interval_len / bin_width) + 1 rows per
  interval. Pick ``bin_width`` near the TYPICAL interval length:
  width >> intervals wastes compares inside huge bins, width <<
  intervals explodes the interval side. For mixed interval lengths,
  the standard refinement is per-length-tier bin widths (not needed
  for the fixture workloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__rj_bin"
_BIN_IV = "__rj_bin_iv"


def point_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    interval_lo: str,
    interval_hi: str,
    bin_width_sec: int = 3600,
    how: str = "inner",
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row with
    ``lo <= ts < hi`` — no equi key required. Output carries all
    columns of both inputs (names must be disjoint; alias before
    calling). ``how`` ∈ {inner, left} (left keeps unmatched points).

    ``max_bins_per_interval`` is the dirty-data valve: ONE corrupt
    wide interval (hi in year 9999) would otherwise ask ``sequence``
    for tens of millions of elements and kill the whole join with an
    array-size error. Such a row now fails loudly, by itself, with a
    message naming the knob (raise ``bin_width_sec`` or the cap for
    legitimately huge intervals)."""
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, both have {sorted(overlap)}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if bin_width_sec <= 0:
        raise ValueError(f"bin_width_sec must be positive, got {bin_width_sec}")
    reserved = {_BIN, _BIN_IV} & (set(points.columns) | set(intervals.columns))
    if reserved:
        # withColumn would silently overwrite (points side) or the
        # join condition bind ambiguously (intervals side)
        raise ValueError(
            f"point_interval_join reserves column names {sorted(reserved)};"
            " rename them"
        )
    w_us = F.lit(int(bin_width_sec) * 1_000_000)
    p = points.withColumn(
        _BIN, F.floor(F.unix_micros(F.col(point_ts)) / w_us)
    )
    lo_bin = F.floor(F.unix_micros(F.col(interval_lo)) / w_us)
    hi_bin = F.floor((F.unix_micros(F.col(interval_hi)) - 1) / w_us)  # hi exclusive
    # empty intervals (hi <= lo) cover no bins and must drop out —
    # an unguarded sequence(start > stop) would count DOWN
    bins = (
        F.when(
            hi_bin - lo_bin >= F.lit(int(max_bins_per_interval)),
            F.raise_error(
                F.format_string(
                    "point_interval_join: interval [%s, %s) spans %s bins "
                    f"(cap {int(max_bins_per_interval)}); raise "
                    "bin_width_sec or max_bins_per_interval, or filter "
                    "corrupt intervals",
                    F.col(interval_lo).cast("string"),
                    F.col(interval_hi).cast("string"),
                    (hi_bin - lo_bin + 1).cast("string"),
                )
            ).cast("array<bigint>"),
        )
        .when(hi_bin >= lo_bin, F.sequence(lo_bin, hi_bin))
        .otherwise(F.array().cast("array<bigint>"))
    )
    iv = intervals.withColumn(_BIN_IV, F.explode(bins))
    residual = (F.col(point_ts) >= F.col(interval_lo)) & (
        F.col(point_ts) < F.col(interval_hi)
    )
    # The residual rides IN the join condition: Catalyst still
    # extracts the bin equality as the shuffle key (plan-asserted —
    # never a nested loop) and checks the residual on the joined row.
    # For ``left`` this is what makes ONE pass correct: the point side
    # carries exactly one bin per row (never exploded), so unmatched
    # points null-pad exactly once — no second execution of the join
    # for an exceptAll re-derivation of the unmatched set, and no
    # full-row comparability requirement on the point columns.
    cond = (F.col(_BIN) == F.col(_BIN_IV)) & residual
    return p.join(iv, cond, how).drop(_BIN, _BIN_IV)
