"""Generic event-time AS-OF join — the time-series operator Spark lacks
natively, exposed as a reusable plan function (the registry query
``events_asof_join`` is the fixed click→purchase instance of the same
construction; reference semantics: pair each left row with the most
recent prior right row).

Construction (no range join, no broadcast of a big side, one key shuffle):

1. Union the two streams, tagging right rows, carrying the right ordering
   value and the right unique id.
2. A running ``MAX(right order)`` window over the per-key event-time
   order finds, for every left row, the order value of the latest
   matching right row.  Strictness is encoded purely in the SORT: at
   equal ``order`` values, right rows sort AFTER left rows when
   ``strict=True`` (so an exactly-simultaneous right row never matches)
   and BEFORE them when ``strict=False`` (so it does).
3. One equi-join back on ``(key, order)`` fetches the matched right row;
   right rows tied on ``(key, order)`` are pre-deduped to the greatest
   ``right_id`` so the join is 1:1 and deterministic.

Scale shape: the window and both joins co-locate on the ``on`` key — one
shuffle total; per-key skew is bounded by the busiest single key exactly
as any sessionful analysis is.  At 10^12 events this is the plan you
want: no per-row Python, no cartesian anything, frames are running
(constant state per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    order: str,
    right_id: str,
    strict: bool = True,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """AS-OF join: each ``left`` row pairs with the latest ``right`` row
    whose ``order`` value is strictly before (``strict=True``) or at-or-
    before (``strict=False``) the left row's, within the same ``on`` key.

    ``left`` and ``right`` must share the ``on`` key column(s) and the
    ``order`` column name; ``right_id`` is a unique-per-right-row column
    used as the deterministic tie-break (greatest id wins among right
    rows sharing an ``order`` value).  Returns all left columns plus
    every non-key right column renamed with ``suffix``.  ``how`` is
    ``inner`` (drop unmatched left rows) or ``left``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)

    # --- 1. tagged union (right rows null-pad the left payload columns)
    payload = [c for c in left.columns if c not in keys + [order]]
    l2 = left.select(
        *keys, order, *payload,
        F.lit(0).alias("__isr"),
        F.lit(None).cast(rtypes[order]).alias("__ro"),
        F.lit(None).cast(rtypes[right_id]).alias("__rid"))
    r2 = right.select(
        *keys, order,
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in payload],
        F.lit(1).alias("__isr"),
        F.col(order).alias("__ro"),
        F.col(right_id).alias("__rid"))
    tagged = l2.unionByName(r2)

    # --- 2. running MAX(right order); strictness lives in the tie sort.
    # __rid last keeps the full ordering deterministic under equal
    # (order, side) so the plan is reproducible across partitionings.
    side = F.asc("__isr") if strict else F.desc("__isr")
    w = (W.partitionBy(*keys).orderBy(F.asc(order), side, F.asc("__rid"))
         .rowsBetween(W.unboundedPreceding, -1))
    matched = (tagged
               .withColumn("__mo", F.max(F.when(F.col("__isr") == 1,
                                                F.col("__ro"))).over(w))
               .filter(F.col("__isr") == 0)
               .drop("__isr", "__ro", "__rid"))

    # --- 3. fetch the matched right row (pre-deduped to max right_id per
    # (key, order) so the equi-join is 1:1)
    wd = W.partitionBy(*keys, order).orderBy(F.desc(right_id))
    rdedup = (right.withColumn("__rn", F.row_number().over(wd))
              .filter("__rn = 1").drop("__rn"))
    rren = rdedup.select(
        *keys, F.col(order).alias("__mo"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns
          if c not in keys + [order]],
        F.col(order).alias(f"{order}{suffix}"))
    return matched.join(rren, keys + ["__mo"], how).drop("__mo")
