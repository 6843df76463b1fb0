"""Temporal operators: gap sessionization and distributed as-of join.

Spark has no native session or as-of join operator (reference has
neither — these extend §2.H for event-stream analytics on the engine's
tables).  Both are built from windows so they scale as one shuffle on
the entity key:

* sessionize — lag + running-sum-of-boundaries, the standard
  gap-window construction; one shuffle (partitionBy key), no joins.
* asof_join — union-merge: tag both sides, sort each key's combined
  timeline once, carry the most recent right-side row forward with
  last(ignorenulls) over an unbounded-preceding window.  This is the
  scale shape (one shuffle of |L|+|R|, no per-key quadratic candidate
  join); the DuckDB oracle states the same semantics naively
  (join + QUALIFY row_number), so the two engines cross-check
  algorithm-independently.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def sessionize(events: DataFrame, key: str = "user_id", ts: str = "ts",
               gap_minutes: int = SESSION_GAP_MIN,
               order_tiebreak: str = "event_id") -> DataFrame:
    """(key, session_id, n_events, session_start, session_end).

    A new session starts when the gap to the previous event of the
    same key exceeds ``gap_minutes``.  Total order (ts, tiebreak)
    makes session numbering partition-invariant.
    """
    w = Window.partitionBy(key).orderBy(F.asc(ts), F.asc(order_tiebreak))
    # integer microseconds so the gap boundary is exact in any engine
    # (cast: NTZ inputs -> session-TZ micros; session TZ is pinned UTC)
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))
    gap_us = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap_us.isNull()
                    | (gap_us > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sess = (events
                 .withColumn("__new", is_new)
                 .withColumn("session_no", F.sum("__new").over(wrun)))
    return (with_sess
            .groupBy(key, "session_no")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts).alias("session_start"),
                 F.max(ts).alias("session_end"))
            .select(F.col(key),
                    F.concat_ws("#", F.col(key).cast("string"),
                                F.col("session_no").cast("string"))
                    .alias("session_id"),
                    "n_events", "session_start", "session_end"))


def range_join(left: DataFrame, right: DataFrame, key: str,
               left_ts: str, right_ts: str,
               window_minutes: int,
               left_cols: Sequence[str],
               right_cols: Sequence[str]) -> DataFrame:
    """All (left, right) pairs with equal key and
    |right_ts - left_ts| <= window_minutes.

    Scale shape (vs the naive per-key cross product): both sides are
    keyed by a time bucket of width = window; the LEFT side explodes to
    its bucket ±1 (3 rows), the right side keeps one bucket, and the
    equi-join on (key, bucket) bounds each row's candidates to ~3
    windows' worth of events instead of the key's whole history.  Every
    qualifying pair joins exactly once (the right row has ONE bucket).
    The exact |dt| <= window predicate filters after the equi-join.
    """
    w_us = window_minutes * 60 * 1_000_000
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    l = (left.select(F.col(key).alias("__k"), l_us.alias("__lt"),
                     *[F.col(c) for c in left_cols])
         .withColumn("__b", F.explode(F.array(
             F.floor(F.col("__lt") / w_us) - 1,
             F.floor(F.col("__lt") / w_us),
             F.floor(F.col("__lt") / w_us) + 1))))
    r = right.select(F.col(key).alias("__k"), r_us.alias("__rt"),
                     F.floor(r_us / w_us).alias("__b"),
                     *[F.col(c) for c in right_cols])
    return (l.join(r, ["__k", "__b"])
            .filter(F.abs(F.col("__rt") - F.col("__lt")) <= w_us)
            .select(*left_cols, *right_cols))


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_cols: Sequence[str],
              right_order: Sequence[str] = ()) -> DataFrame:
    """For each left row: the right row with the greatest
    (right_ts [, right_order...]) among those with right_ts <= left_ts
    and equal key.  Left rows with no prior right row are dropped
    (inner as-of).  Output: all left columns + right_cols.

    Right-side ties on right_ts are broken by ``right_order`` columns
    (descending preference on the LAST one wins) so the result is
    total-order deterministic under any partitioning.
    """
    right_order = list(right_order) or [right_cols[0]]
    r_dtypes = dict(right.dtypes)
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{r_dtypes[c]}" for c in right_cols) + ">")
    l_tagged = (left.withColumn(
                    "__t", F.unix_micros(F.col(left_ts).cast("timestamp")))
                .withColumn("__side", F.lit(1))
                .withColumn("__r", null_struct))
    r_tagged = (right.withColumn(
                    "__t", F.unix_micros(F.col(right_ts).cast("timestamp")))
                # a null/uncastable right_ts can never satisfy
                # right_ts <= left_ts — but null __t sorts FIRST under
                # asc, so without this filter such a row would become
                # the carried "match" for every left row that has no
                # genuine prior right row (SQL comparison with null is
                # false; the engines must agree)
                .filter(F.col("__t").isNotNull())
                .withColumn("__side", F.lit(0))
                .withColumn("__r", F.struct(*[F.col(c) for c in right_cols])))
    l_cols = [c for c in left.columns]
    sel_l = l_tagged.select(F.col(key).alias("__k"), "__t", "__side", "__r",
                            *[F.col(c) for c in l_cols])
    sel_r = r_tagged.select(F.col(key).alias("__k"), "__t", "__side", "__r",
                            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                              for c in l_cols])
    u = sel_l.unionByName(sel_r)
    order = [F.asc("__t"), F.asc("__side")] + \
            [F.asc(F.col("__r")[c]) for c in right_order]
    w = (Window.partitionBy("__k").orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = F.last(F.when(F.col("__side") == 0, F.col("__r")),
                     ignorenulls=True).over(w)
    out = (u.withColumn("__match", carried)
           .filter((F.col("__side") == 1) & F.col("__match").isNotNull()))
    return out.select(*[F.col(c) for c in l_cols],
                      *[F.col("__match")[c].alias(c) for c in right_cols])
