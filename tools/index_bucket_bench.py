"""Bucketed embedding-LSH index: the shuffle-free micro-batch match,
demonstrated end-to-end on the testdata embeddings.

``write_embedding_lsh_index`` persists the index as catalog tables
co-bucketed on the match join's keys — ``sigs`` by ``(band, blk)``,
``vecs`` by ``id``. Every subsequent ``embedding_lsh_match`` (the
exact function ``streaming.embed_near_dedup_stream`` runs per
micro-batch via foreachBatch) then reads the corpus WITHOUT hashing
or shuffling it: only the small incoming batch shuffles into the
bucket layout. At 100 TB this converts the per-batch corpus shuffle
— the dominant cost of a continuous-ingest dedup — into a one-time
write.

What this script proves, exit-code-gated:

1. The in-memory-index match plan shuffles the corpus (Exchange above
   both the sigs scan and the vecs scan); the bucketed-index plan has
   NO Exchange on either corpus side — at least two fewer Exchanges
   overall, and the only remaining ones are on batch-derived sides.
2. The bucketed scans really engage the bucket spec: the physical
   plan shows ``SelectedBucketsCount`` on both corpus scans.
3. Both paths return identical match rows (full exceptAll both ways).

Broadcast is disabled so the match join takes the sort-merge shape a
100 TB corpus forces (the batch side would broadcast at toy scale,
which also avoids the corpus shuffle — but only below the broadcast
threshold; bucketing is the answer that scales).

Usage: python tools/index_bucket_bench.py [sf_dir] [num_buckets]
Prints one JSON line with timings + plan evidence; exit 0 iff all
checks hold. Results are recorded in BENCHMARKS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DB = "index_bucket_bench"
N_BANDS, N_PLANES, DIM, SEED = 4, 4, 64, 42
THRESHOLD = 0.4


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
    from jaccard_join_duckdb_spark.operators.similarity import (
        embedding_lsh_index,
        embedding_lsh_match,
        read_embedding_lsh_index,
        write_embedding_lsh_index,
    )
    from jaccard_join_duckdb_spark.sources import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    spark = get_spark(
        app_name="index-bucket-bench",
        extra_conf={
            "spark.ui.enabled": "false",
            # the corpus side of a 100 TB match can never broadcast —
            # force the shuffle-join shape bucketing eliminates
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    spark.catalog.setCurrentDatabase(DB)
    wh = spark.conf.get("spark.sql.warehouse.dir")
    wh = wh[len("file:"):] if wh.startswith("file:") else wh
    for t in ("emb_idx_sigs", "emb_idx_vecs", "emb_idx_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, f"{DB}.db", t), ignore_errors=True)

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)  # one "micro-batch"

    # ---- plain path: index held as persisted DataFrames ----
    idx_mem = embedding_lsh_index(
        corpus, "vec_id", "embedding",
        n_bands=N_BANDS, n_planes=N_PLANES, dim=DIM, seed=SEED,
    )
    plain = embedding_lsh_match(batch, idx_mem, "vec_id", "embedding", THRESHOLD)

    # ---- bucketed path: one-time write, then table-backed index ----
    t_write0 = time.perf_counter()
    write_embedding_lsh_index(idx_mem, "emb_idx", n_buckets)
    t_write = round(time.perf_counter() - t_write0, 3)
    idx_tbl = read_embedding_lsh_index(
        spark, "emb_idx", dim=DIM, n_bands=N_BANDS, n_planes=N_PLANES, seed=SEED
    )
    bucketed = embedding_lsh_match(
        batch, idx_tbl, "vec_id", "embedding", THRESHOLD
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

    ok = (
        same
        and sel_buckets >= 2            # both corpus scans engage buckets
        and exch_bucketed <= exch_plain - 2  # corpus-side Exchanges gone
    )
    print(json.dumps({
        "matches": n_plain,
        "num_buckets": n_buckets,
        "one_time_index_write_sec": t_write,
        "memory_index_match_sec": t_plain,
        "bucketed_index_match_sec": t_bucketed,
        "exchanges_memory_index": exch_plain,
        "exchanges_bucketed_index": exch_bucketed,
        "selected_buckets_scans": sel_buckets,
        "results_identical": same,
        "ok": ok,
    }))
    idx_mem.unpersist()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
