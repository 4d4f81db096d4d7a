"""The six vector-similarity measures D1-D6 as reusable aggregate
expressions (reference Step4.java:327-363 accumulators, :250-295
finalization).

Given aligned value pairs (x, y) — one row per aligned dimension — the
measures are plain SQL aggregates; no UDAF is needed (SURVEY.md §2.6):

  D1 Manhattan  sum(|x-y|)                        NaN -> +inf
  D2 Euclidean  sqrt(sum((x+y)^2)) in parity mode (the reference
                accumulates (val1 + val2)^2 — note the '+', not '-',
                Step4.java:332; standard mode uses (x-y)^2);
                acc < 0 or NaN -> +inf
  D3 Cosine     sum(xy) / (sqrt(sum(x^2)) * sqrt(sum(y^2)))
                either denominator <= 0 or NaN -> 0
  D4 Jaccard    sum(min) / sum(max)              denom 0 or NaN -> 0
  D5 Dice       2*sum(min) / sum(x+y)            denom 0 or NaN -> 0
  D6 JS-ish     sum(x ln(x/m)) + sum(y ln(y/m)), m=(x+y)/2, terms
                guarded to 0 unless operand > 0; unnormalized (no 1/2
                factor — quirk, Step4.java:353-363); NaN -> +inf

Known parity gap (documented, unreachable on well-formed pipelines):
the reference *assigns* 0 to the JS accumulators when it sees an
exactly-(0,0) aligned pair (Step4.java:355-359), discarding prior
contributions in feature-sort order.  Zero-filled alignment rows always
have one side nonzero for freq/prob/PMI, so this can only trigger for a
t-test value that is exactly 0.0; we treat such a pair as contributing
0 instead of resetting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def _nan_to(value: Column, replacement: Column) -> Column:
    return F.when(F.isnan(value), replacement).otherwise(value)


def similarity_measures(
    x: Column, y: Column, mode: str = "standard"
) -> dict[str, Column]:
    """Return the 6 similarity measures as aggregate Column expressions
    over aligned (x, y) rows.  Keys match schemas.SIM_MEASURES."""
    if mode not in ("standard", "parity"):
        raise ValueError(f"mode must be 'standard' or 'parity', got {mode!r}")
    INF = F.lit(float("inf"))

    manhattan = F.sum(F.abs(x - y))
    sq = (x + y) * (x + y) if mode == "parity" else (x - y) * (x - y)
    euclid_acc = F.sum(sq)
    cos_xy, cos_xx, cos_yy = F.sum(x * y), F.sum(x * x), F.sum(y * y)
    min_sum, max_sum = F.sum(F.least(x, y)), F.sum(F.greatest(x, y))
    plus_sum = F.sum(x + y)
    m = (x + y) / F.lit(2.0)
    js = F.sum(
        F.when((x > 0) & (m > 0), x * F.log(x / m)).otherwise(F.lit(0.0))
    ) + F.sum(F.when((y > 0) & (m > 0), y * F.log(y / m)).otherwise(F.lit(0.0)))

    cosine = cos_xy / (F.sqrt(cos_xx) * F.sqrt(cos_yy))
    return {
        "dist_manhattan": _nan_to(manhattan, INF),
        "dist_euclidean": F.when(
            (euclid_acc < 0) | F.isnan(euclid_acc), INF
        ).otherwise(F.sqrt(euclid_acc)),
        "sim_cosine": F.when(
            (cos_xx <= 0) | (cos_yy <= 0) | F.isnan(cosine), F.lit(0.0)
        ).otherwise(cosine),
        "sim_jaccard": F.when(
            (max_sum == 0) | F.isnan(min_sum / max_sum), F.lit(0.0)
        ).otherwise(min_sum / max_sum),
        "sim_dice": F.when(
            (plus_sum == 0) | F.isnan(2 * min_sum / plus_sum), F.lit(0.0)
        ).otherwise(2 * min_sum / plus_sum),
        "sim_js": _nan_to(js, INF),
    }
