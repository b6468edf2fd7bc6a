"""Bucketed-table co-location benchmark: the 100 TB shuffle-elimination
primitive, demonstrated end-to-end on the TPC-H-ish testdata.

Two tables bucketed (and bucket-sorted) the same way on their join
keys are joined and then aggregated on that key with ZERO Exchange
operators — each task reads matching buckets from both sides
directly, and the groupBy reuses the join's partitioning. For a fact
table that is joined every query (lineitem ⋈ orders here; documents ⋈
token stats in a corpus pipeline), bucketing converts the per-query
shuffle of the big table into a one-time write cost.

What this script proves, exit-code-gated:

1. The plain parquet join+agg plan contains Exchange operators (both
   sides shuffle); the bucketed plan contains NONE.
2. The bucketed scans really engage the bucket spec — the physical
   plan shows ``SelectedBucketsCount`` on both sides.
3. Both paths return identical results (full row-set comparison).

Broadcast is disabled for the demo join so the shuffle delta is the
sort-merge path a 100 TB fact-fact join would take (at that scale
neither side broadcasts).

Usage: python tools/bucket_bench.py [sf_dir] [num_buckets]
Prints one JSON line with timings + plan evidence; exit 0 iff all
three checks hold. Results are recorded in BENCHMARKS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DB = "bucket_bench"


def revenue_per_order(li, od):
    """Join on the (bucketed) order key, then aggregate ON THE SAME
    KEY — with co-bucketed inputs neither step needs an exchange."""
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.any_value("o_orderdate").alias("o_orderdate"),
        )
    )


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def time_best_of(fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> int:
    from jaccard_join_duckdb_spark import get_spark
    from jaccard_join_duckdb_spark.sources import (
        load_table,
        read_table,
        write_bucketed,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    spark = get_spark(
        app_name="bucket-bench",
        extra_conf={
            "spark.ui.enabled": "false",
            # force the sort-merge path a fact-fact join takes at scale
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    spark.catalog.setCurrentDatabase(DB)

    # A fresh session's metastore does not know tables written by a
    # previous run, but their warehouse directories persist —
    # saveAsTable would fail with LOCATION_ALREADY_EXISTS. Drop both
    # catalog entry and leftover location before writing.
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir")
    wh = wh[len("file:"):] if wh.startswith("file:") else wh
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, f"{DB}.db", t), ignore_errors=True)

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")

    t_write0 = time.perf_counter()
    # one file per bucket: repartition on the bucket key first, so the
    # bucket-sorted property holds file-wide and SMJ needs no Sort
    write_bucketed(
        li.repartition(n_buckets, "l_orderkey"), "b_lineitem",
        "l_orderkey", n_buckets,
    )
    write_bucketed(
        od.repartition(n_buckets, "o_orderkey"), "b_orders",
        "o_orderkey", n_buckets,
    )
    t_write = round(time.perf_counter() - t_write0, 3)

    plain = revenue_per_order(li, od)
    bucketed = revenue_per_order(
        read_table(spark, "b_lineitem"), read_table(spark, "b_orders")
    )

    # warm both plan shapes before timing (codegen JIT)
    n_plain = plain.count()
    n_bucketed = bucketed.count()
    t_plain = time_best_of(lambda: plain.count())
    t_bucketed = time_best_of(lambda: bucketed.count())

    plan_plain = physical_plan(plain)
    plan_bucketed = physical_plan(bucketed)
    exch_plain = plan_plain.count("Exchange")
    exch_bucketed = plan_bucketed.count("Exchange")
    sel_buckets = plan_bucketed.count("SelectedBucketsCount")

    same = (
        n_plain == n_bucketed
        and plain.exceptAll(bucketed).isEmpty()
        and bucketed.exceptAll(plain).isEmpty()
    )

    ok = same and exch_plain >= 2 and exch_bucketed == 0 and sel_buckets >= 2
    print(json.dumps({
        "rows": n_plain,
        "num_buckets": n_buckets,
        "one_time_write_sec": t_write,
        "plain_join_agg_sec": t_plain,
        "bucketed_join_agg_sec": t_bucketed,
        "exchanges_plain": exch_plain,
        "exchanges_bucketed": exch_bucketed,
        "selected_buckets_scans": sel_buckets,
        "results_identical": same,
        "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
