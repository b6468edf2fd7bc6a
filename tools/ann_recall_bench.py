"""ANN recall instrumentation — reproduces the BENCHMARKS.md recall
tables on TWO corpora:

1. the driver testdata ``embeddings`` table (near-orthogonal — max
   pairwise cosine ~0.5, i.e. NO cluster structure), and
2. a seeded synthetic TOPIC-DRIFT corpus: a random walk on the unit
   sphere, the shape a crawl-ordered embedding stream takes (adjacent
   documents share a topic; the topic drifts) — neighbors are
   sequence-local, structure is a smooth manifold rather than
   isolated blobs.

The near-orthogonal table inverts the kmeans-vs-min_ids story
(BENCHMARKS.md's own caveat): ``min_ids`` scores perfectly there by
accident of geometry. The drift corpus is the honest test —
``min_ids``'s 16 centroids are the first 16 crawl items, clumped at
the start of the walk, so the rest of the corpus is split by
arbitrary far-away boundaries that cut real neighborhoods; seeded
spherical k-means spreads its centers along the manifold, so probed
lists align with true neighborhoods at the SAME candidate volume.
(A plain Gaussian-mixture corpus does NOT separate the two rules:
any fixed centroids partition well-separated blobs consistently —
measured and rejected as a differentiator while building this.)

What this script proves, exit-code-gated:

1. Banded sign-LSH recall is monotone in bands on BOTH corpora
   (single <= 8x4 <= 16x4) and 8x4 clears 0.8 on the testdata.
2. On the drift corpus, ``centroids="kmeans"`` beats
   ``centroids="min_ids"`` at equal n_lists/n_probe — the production
   win the trained path exists for.

Usage: python tools/ann_recall_bench.py [sf_dir]
Prints one JSON line; exit 0 iff both checks hold. Results are
recorded in BENCHMARKS.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VECS, DIM, SEED = 2000, 64, 7
K = 5


def drift_corpus(spark):
    """Seeded random walk on the unit sphere: ``v_{i+1} =
    normalize(v_i + 0.08 * N(0, I))`` — crawl-ordered topic drift.
    Adjacent ids are each other's nearest neighbors; the first 16
    vectors (``min_ids``'s centroids) are clumped at the start of the
    walk. Queries are 10 ids spread along the whole walk. Returns
    ``(df, query_pred)``."""
    import numpy as np

    rng = np.random.RandomState(SEED)
    v = rng.normal(size=DIM)
    v /= np.linalg.norm(v)
    pts = []
    for _ in range(N_VECS):
        pts.append(v.copy())
        v = v + 0.08 * rng.normal(size=DIM)
        v /= np.linalg.norm(v)
    rows = [
        (int(i), [float(x) for x in pts[i].astype(np.float32)])
        for i in range(N_VECS)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, "vec_id % 200 = 100"


def recalls(emb, query_pred="vec_id < 10"):
    from jaccard_join_duckdb_spark.operators.similarity import (
        ann_recall,
        cosine_topk_bruteforce,
        ivf_topk,
        lsh_banded_topk,
        lsh_bucket_topk,
    )

    q = emb.filter(query_pred)
    exact = cosine_topk_bruteforce(emb, q, k=K)
    r = {}
    r["lsh_single_4p"] = ann_recall(lsh_bucket_topk(emb, q, k=K, n_planes=4), exact)
    r["lsh_banded_8x4"] = ann_recall(
        lsh_banded_topk(emb, q, k=K, n_bands=8, n_planes=4), exact
    )
    r["lsh_banded_16x4"] = ann_recall(
        lsh_banded_topk(emb, q, k=K, n_bands=16, n_planes=4), exact
    )
    r["ivf_min_ids_16_4"] = ann_recall(
        ivf_topk(emb, q, k=K, n_lists=16, n_probe=4, centroids="min_ids"), exact
    )
    r["ivf_kmeans_16_4"] = ann_recall(
        ivf_topk(emb, q, k=K, n_lists=16, n_probe=4, centroids="kmeans"), exact
    )
    r["ivf_kmeans_16_8"] = ann_recall(
        ivf_topk(emb, q, k=K, n_lists=16, n_probe=8, centroids="kmeans"), exact
    )
    return {k2: round(v, 3) for k2, v in r.items()}


def main() -> int:
    from jaccard_join_duckdb_spark import get_spark
    from jaccard_join_duckdb_spark.sources import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ann-recall-bench", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    testdata = recalls(load_table(spark, sf_dir, "embeddings").cache())
    cdf, cpred = drift_corpus(spark)
    drift = recalls(cdf.cache(), cpred)

    def monotone(r):
        return (
            r["lsh_single_4p"]
            <= r["lsh_banded_8x4"]
            <= r["lsh_banded_16x4"]
            <= 1.0
        )

    ok = (
        monotone(testdata)
        and monotone(drift)
        and testdata["lsh_banded_8x4"] >= 0.8
        and drift["ivf_kmeans_16_4"] > drift["ivf_min_ids_16_4"]
    )
    print(json.dumps({
        "k": K,
        "testdata_near_orthogonal": testdata,
        "synthetic_drift": drift,
        "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
