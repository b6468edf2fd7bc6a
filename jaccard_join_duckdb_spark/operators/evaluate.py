"""Quality evaluation against a ground-truth pair table.

Port of the reference's ``evaluate()``
(``py_duckdb/similarity_join/__init__.py:6-62``): order-insensitive
full-outer pair matching → tp / fp / fn → precision / recall / F1
(all-zero metrics when tp == 0, never NaN — SURVEY.md §4.3.9).

Faithful quirk: the reference counts ``tp`` as *every* row of the
full-outer join whose sj side is present (``where sjk1 is not null
and sjk2 is not null``) — which includes the fp rows (verified
against DuckDB on the reference SQL). We reproduce that exactly.

Scale note: the reference joins with an OR of the two pair
orientations, which in Spark plans as a BroadcastNestedLoopJoin. We
canonicalize each pair to (least, greatest) and use a single
full-outer *equi*-join — multiset-equivalent to the OR-join (each gt
row matches exactly the sj rows equal to it under either
orientation) but hash-partitionable, so it scales. The three counts
collapse into one aggregation action instead of three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["evaluate", "confusion_matrix_df"]


def _canonical(df: DataFrame, l_key: str, r_key: str, k1: str, k2: str) -> DataFrame:
    return df.select(
        F.least(F.col(l_key), F.col(r_key)).alias(k1),
        F.greatest(F.col(l_key), F.col(r_key)).alias(k2),
    )


def confusion_matrix_df(
    ground_truth: DataFrame,
    similarity_join: DataFrame,
    gt_l_key: str = "l_id",
    gt_r_key: str = "r_id",
    sj_l_key: str = "l_id",
    sj_r_key: str = "r_id",
) -> DataFrame:
    """Full-outer canonicalized pair join — the reference's
    ``confusion_mtx`` view (__init__.py:15-23)."""
    gt = _canonical(ground_truth, gt_l_key, gt_r_key, "gtk1", "gtk2")
    sj = _canonical(similarity_join, sj_l_key, sj_r_key, "sjk1", "sjk2")
    return gt.join(
        sj,
        (gt["gtk1"] == sj["sjk1"]) & (gt["gtk2"] == sj["sjk2"]),
        "full_outer",
    )


def evaluate(
    ground_truth: DataFrame,
    similarity_join: DataFrame,
    gt_l_key: str = "l_id",
    gt_r_key: str = "r_id",
    sj_l_key: str = "l_id",
    sj_r_key: str = "r_id",
) -> dict:
    """Returns ``{'tp','fp','fn','pr','rc','fm'}`` with the exact
    count predicates and formulas of the reference
    (__init__.py:25-53)."""
    cm = confusion_matrix_df(
        ground_truth, similarity_join, gt_l_key, gt_r_key, sj_l_key, sj_r_key
    )
    row = cm.agg(
        F.count(
            F.when(F.col("sjk1").isNotNull() & F.col("sjk2").isNotNull(), 1)
        ).alias("tp"),
        F.count(F.when(F.col("gtk1").isNull(), 1)).alias("fp"),
        F.count(F.when(F.col("sjk1").isNull(), 1)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = row["tp"], row["fp"], row["fn"]
    pr = rc = fm = 0
    if tp > 0:
        pr = tp / (tp + fp)
        rc = tp / (tp + fn)
        fm = 2 * pr * rc / (pr + rc)
    return {"tp": tp, "fp": fp, "fn": fn, "pr": pr, "rc": rc, "fm": fm}
