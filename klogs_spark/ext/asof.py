"""As-of and range joins — time-series join operators Spark lacks natively.

No reference equivalent (kobsio/klogs has no joins at all, SURVEY §2.4);
these are the standard time-series primitives a log/metrics platform layers
on top, re-expressed Spark-first:

- ``asof_join``: for every left row, the latest right row with
  ``right.ts <= left.ts`` per key. NOT a sort-merge inequality join (Spark
  would plan a broadcast-nested-loop): the union + carry-forward-window
  formulation costs ONE shuffle on the key and scales linearly — each key's
  timeline sorts within its reducer, exactly how a 100 TB backfill wants it.
- ``range_join_within``: pairs within a bounded time window per key, via
  time-BUCKET equi-join (each left row probes its own and the next bucket)
  — candidate pairs are bounded by bucket co-occupancy, never |L|x|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: attach the most recent right payload at-or-before
    each left row's timestamp (inclusive), per key. Left rows with no
    preceding right row keep null payloads (LEFT-join semantics).

    Mechanics: tag and union both inputs on a common schema, then one
    window per key ordered by (ts, tag) — right rows sort before left rows
    at equal timestamps, so same-instant matches are included — carrying
    the last non-null payload struct forward. Ties among right rows at the
    same (key, ts) must be resolved by the CALLER (pre-aggregate to one row
    per (key, ts)); this operator asserts nothing about them.
    """
    lk, rk = F.col(left_key), F.col(right_key)
    payload = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        rk.alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),  # right sorts first at equal ts (inclusive)
        payload.alias("_payload"),
        *[F.lit(None).cast(t).alias(f"_l_{c}")
          for c, t in left.dtypes],
    )
    l = left.select(
        lk.alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(
            r.schema["_payload"].dataType.simpleString()
        ).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        "_m", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(c) for c in payload_cols],
    )
    return out


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_delta_s: int,
) -> DataFrame:
    """Pairs (l, r) with the same key and ``0 < r.ts - l.ts <= max_delta_s``.

    Each right row lands in one time bucket of width ``max_delta_s``; each
    left row probes its own bucket and the next (any in-window partner must
    be in one of the two — the window can't span more than two buckets).
    The join is a pure (key, bucket) EQUI-join + exact epoch filter: shuffle
    cost follows bucket occupancy, and Catalyst plans a hash join, never a
    nested loop. Returns the left columns plus right's key/ts columns
    prefixed ``r_``.
    """
    width = int(max_delta_s)
    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))
    l = left.withColumn("_le", l_epoch).withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.floor(F.col("_le") / width),
                F.floor(F.col("_le") / width) + 1,
            )
        ),
    )
    r = right.select(
        F.col(right_key).alias("_rk"),
        r_epoch.alias("_re"),
        F.col(right_ts).alias(f"r_{right_ts}"),
    ).withColumn("_bucket", F.floor(F.col("_re") / width))
    joined = l.join(
        r,
        (F.col(left_key) == F.col("_rk")) & (l["_bucket"] == r["_bucket"]),
    ).filter(
        (F.col("_re") > F.col("_le"))
        & (F.col("_re") <= F.col("_le") + width)
    )
    # no distinct needed: a right row occupies exactly one bucket, so each
    # qualifying (l, r) pair joins through exactly one of l's two probes
    return joined.select(*[F.col(c) for c in left.columns], f"r_{right_ts}")
