"""As-of join (point-in-time lookup) — absent in both Spark and the
reference; composed from built-ins (SURVEY §2.3 'needed for
north-star queries').

Two strategies:

- ``asof_join_union``: union-tag both sides, one window pass ordered
  by (key, ts) carrying the last-seen right-side value forward. One
  shuffle on the key, no range explosion — the default at scale when
  the right side fits the same partitioning.
- ``asof_join_pandas``: per-key ``pd.merge_asof`` via applyInPandas —
  for wide right sides or tolerance semantics Spark expressions
  can't carry cheaply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    left_tiebreak: str | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row at or
    before its timestamp (per key).

    Implementation: tag and union both sides, sort within key by
    (ts, side, tiebreak) — right rows first at equal ts so 'at or
    before' includes ties — then last_value(ignorenulls) over the
    running frame carries right values forward; finally keep left
    rows. Tiebreak columns make equal-timestamp right rows resolve
    deterministically (the max-tiebreak row wins).
    """
    ltb = F.col(left_tiebreak) if left_tiebreak else F.lit(0)
    rtb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        ltb.cast("long").alias("_tb"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        rtb.cast("long").alias("_tb"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = lt.unionByName(rt)
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    out_cols = [f.name for f in left.schema.fields] + [f"asof_{c}" for c in value_cols]
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """pd.merge_asof per key group (Arrow-batched)."""
    import pandas as pd

    out_fields = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`asof_{c}` {right.schema[c].dataType.simpleString()}" for c in value_cols]
    )
    rsel = right.select(key, right_ts, *value_cols)

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values(left_ts, kind="stable")
        if rdf.empty:
            # a key with no right-side rows cogroups an EMPTY (even
            # column-less) frame: every asof value is null
            out = ldf.copy()
            for c in value_cols:
                out[f"asof_{c}"] = None
            return out
        # secondary sort on the value cols: merge_asof picks the LAST
        # right row at an equal timestamp, so this resolves ties to
        # the max value — same rule as asof_join_union's tiebreak
        rdf = rdf.sort_values([right_ts, *value_cols], kind="stable")[
            [right_ts, *value_cols]
        ].rename(columns={c: f"asof_{c}" for c in value_cols})
        merged = pd.merge_asof(
            ldf, rdf, left_on=left_ts, right_on=right_ts, direction="backward"
        )
        return merged[[*ldf.columns, *[f"asof_{c}" for c in value_cols]]]

    def apply_fn(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        # cogrouped applyInPandas dispatches the 2-arg form as
        # f(left_pdf, right_pdf); the key would need the 3-arg form
        return merge(ldf, rdf)

    return left.groupBy(key).cogroup(rsel.groupBy(key)).applyInPandas(apply_fn, out_fields)
