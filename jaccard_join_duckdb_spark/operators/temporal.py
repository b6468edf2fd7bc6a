"""Temporal joins Spark lacks as built-ins: the as-of join.

Beyond-reference operator (the reference engine has no temporal
surface; SURVEY.md §2.9): ``asof_join`` attaches to each left row
the single nearest right row at-or-before (``direction="backward"``)
or at-or-after (``"forward"``) its timestamp, per key — the
point-in-time lookup used for feature attribution ("most recent
click before this purchase"), slowly-changing-dimension resolution,
and market-data alignment. Cross-checked against DuckDB's native
``ASOF LEFT JOIN`` in the driver gate.

Implementation: the classic union-and-carry rewrite, NOT a range
join — right and left rows are unioned into one (key, ts)-ordered
stream and the right payload is carried forward with
``last(..., ignorenulls=True)`` over a running window; left rows
ride the same union so the whole operator is ONE shuffle (the
window's hash partition on ``key``) with zero join fan-out. A
range-join formulation (``l.ts BETWEEN r.ts AND r.ts + tol`` then
argmax) multiplies rows by the per-key event rate before pruning;
this never does — cost is O((|L|+|R|) log) per key regardless of
how many right rows precede each left row.

Scale notes (100 TB): the single shuffle is the same cost as the
equi-join any asof implementation needs. Hot keys are bounded by
per-key event rates (time-series data is naturally spread); for a
pathological single key, pre-split by coarse time bucket and stitch
the last row of bucket N into bucket N+1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "resample_events"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: Column | None = None,
    direction: str = "backward",
    tie_col: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of the
    nearest right row with the same ``key`` and ``r.ts <= l.ts``
    (``backward``; ``>=`` for ``forward``), or NULLs when none
    exists. Matches DuckDB ``ASOF LEFT JOIN`` semantics (timestamp
    equality counts as a match).

    ``right_cols``: right payload columns to attach (default: all
    non-key, non-ts columns), emitted as ``{prefix}{col}`` plus
    ``{prefix}{ts_col}`` for the matched timestamp.

    ``tolerance``: optional interval Column (e.g.
    ``F.expr("INTERVAL 1 HOUR")``); matches farther than the
    tolerance are nulled out. Nearest-first makes the post-filter
    exact: if the nearest right row is out of tolerance, every other
    right row is too.

    ``tie_col``: when several right rows share the nearest
    timestamp, the one with the greatest ``tie_col`` wins
    (deterministic; DuckDB's ASOF picks an arbitrary duplicate, so
    the oracle twin deduplicates the right side the same way).
    Omitted => ties order by the ENTIRE right payload struct, so the
    carried match is value-deterministic even under speculative
    retries (any ties left are payload-identical rows — whichever is
    carried, the output values are the same). Payloads containing
    unorderable types (maps) fall back to arbitrary tie order with a
    warning — pass an explicit ``tie_col`` there.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, ts_col)]
    # NULL semantics, matching DuckDB ASOF's comparisons (NULL <= ts
    # is never true; NULL = key never equi-matches): right rows with
    # a NULL ts OR a NULL key can match nothing — drop them BEFORE
    # the union so the window (which groups NULL keys together like
    # any partitionBy) cannot carry them; left rows with NULL ts/key
    # stay (every left row survives a left join), sort before all
    # right rows (nulls-first in BOTH directions) or land in a
    # right-free NULL-key partition, and so emit NULL matches.
    right = right.filter(
        F.col(ts_col).isNotNull() & F.col(key).isNotNull()
    )

    r_payload = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    l_payload = F.struct(*[F.col(c).alias(c) for c in left.columns])
    # side marker orders right rows BEFORE left rows at equal ts so
    # ts-equality is a match (<=); __tie (right rows only) makes the
    # carried duplicate deterministic (last in ascending order =
    # greatest tie_col).
    if tie_col:
        tie_expr = F.col(tie_col)
    elif all(
        "map<" not in right.schema[c].dataType.simpleString()
        for c in right_cols
    ):
        # deterministic default: order ties by the full right payload
        # (struct ordering) — remaining ties are payload-identical,
        # so the carried match is value-deterministic under retries
        tie_expr = r_payload
    else:  # pragma: no cover - unorderable payload types
        import warnings

        warnings.warn(
            "asof_join: right payload contains map columns (not "
            "orderable) and no tie_col was given — equal-timestamp "
            "duplicates resolve arbitrarily; pass tie_col for "
            "deterministic output",
            RuntimeWarning,
            stacklevel=2,
        )
        tie_expr = F.lit(0)
    r_rows = right.select(
        F.col(key).alias(key),
        F.col(ts_col).alias("__ets"),
        F.lit(0).alias("__side"),
        tie_expr.alias("__tie"),
        r_payload.alias("__r"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{f.name}`:{f.dataType.simpleString()}"
                for f in left.schema.fields
            ) + ">"
        ).alias("__l"),
    )
    l_rows = left.select(
        F.col(key).alias(key),
        F.col(ts_col).alias("__ets"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_rows.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r_rows.schema["__r"].dataType).alias("__r"),
        l_payload.alias("__l"),
    )
    asc = direction == "backward"
    order = [
        F.col("__ets").asc_nulls_first()
        if asc
        else F.col("__ets").desc_nulls_first(),
        F.col("__side").asc(),
        F.col("__tie").asc_nulls_first(),
    ]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r_rows.unionByName(l_rows)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        gap_ok = (
            (F.col("__l")[ts_col] - F.col("__m.__ts") <= tolerance)
            if asc
            else (F.col("__m.__ts") - F.col("__l")[ts_col] <= tolerance)
        )
        out = out.withColumn("__m", F.when(gap_ok, F.col("__m")))
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        F.col("__m.__ts").alias(f"{prefix}{ts_col}"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def resample_events(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str | None = None,
    step_hours: int = 6,
) -> DataFrame:
    """Gap-filled time-grid resampling — the dashboard/monitoring view
    Spark has no built-in for: bucket events into fixed ``step_hours``
    windows, then LEFT-join those counts onto the DENSE grid
    (every bucket from the corpus-min to the corpus-max bucket ×
    every key), so silent gaps become explicit zero rows
    (``is_gap = true``) instead of missing rows — the difference
    between "no data" and "no row" that downstream anomaly detection
    needs.

    Buckets are DAY-ANCHORED (``hour(ts) - hour(ts) % step``), so the
    dense grid is derived from the same anchoring: per-day offsets
    ``0, step, 2*step, … < 24``, NOT a uniform sequence from the
    corpus minimum — a uniform sequence diverges from the fact
    buckets after the first midnight whenever ``24 % step != 0`` and
    silently drops matching fact rows from the left join.

    Scale: the actual aggregation is one map-side-partial groupBy on
    (bucket, key); both the grid and the post-aggregation counts are
    metadata-scale ((time-range / step) × |keys| rows at most), so
    the counts are BROADCAST onto the streamed grid (left-outer
    builds the right side — the only direction Spark's
    BroadcastHashJoin honors for a preserved left). Output:
    ``(bucket_start, <key_col>, n_events, sum_value, is_gap)``.
    """
    step = int(step_hours)
    if step < 1:
        raise ValueError("step_hours must be >= 1")
    ts = F.col(ts_col)
    bucket = F.date_trunc("hour", ts) - F.expr(
        f"make_interval(0, 0, 0, 0, hour({ts_col}) % {step}, 0, 0)"
    )
    facts = (
        df.select(
            bucket.alias("bucket_start"),
            F.col(key_col),
            *( [F.col(value_col)] if value_col else [] ),
        )
        .groupBy("bucket_start", key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col(value_col).cast("decimal(18,2)"))
                .cast("double")
                if value_col
                else F.max(F.lit(None).cast("double"))
            ).alias("sum_value"),
        )
    )
    bounds = df.select(bucket.alias("b")).agg(
        F.min("b").alias("lo"), F.max("b").alias("hi")
    )
    # day-anchored grid: every day in range × the in-day offsets the
    # fact bucketing can produce (hour - hour % step), clipped to the
    # observed bucket range — exact for ANY step, divisor of 24 or not
    offsets = list(range(0, 24, step)) if step < 24 else [0]
    grid_times = (
        bounds.select(
            "lo",
            "hi",
            F.explode(
                F.sequence(
                    F.date_trunc("day", F.col("lo")),
                    F.date_trunc("day", F.col("hi")),
                    F.expr("interval 1 day"),
                )
            ).alias("day"),
        )
        .select(
            "lo",
            "hi",
            F.explode(F.array(*[F.lit(o) for o in offsets])).alias("off"),
            "day",
        )
        .select(
            "lo",
            "hi",
            (
                F.col("day")
                + F.expr("make_interval(0, 0, 0, 0, off, 0, 0)")
            ).alias("bucket_start"),
        )
        .filter(
            (F.col("bucket_start") >= F.col("lo"))
            & (F.col("bucket_start") <= F.col("hi"))
        )
        .select("bucket_start")
    )
    keys = df.select(F.col(key_col)).filter(
        F.col(key_col).isNotNull()
    ).distinct()
    grid = grid_times.crossJoin(keys)
    out = grid.join(
        F.broadcast(facts), ["bucket_start", key_col], "left"
    )
    return out.select(
        "bucket_start",
        key_col,
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias(
            "n_events"
        ),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )
