"""MinHash-LSH dedup recall evidence — exit-gated.

``minhash_near_duplicates`` verifies every candidate with exact
Jaccard, so its PRECISION is 1.0 by construction; the quantity that
can silently regress is RECALL — pairs at or above the threshold
whose band signatures all differ are never candidates (the standard
LSH miss). This tool measures that recall directly against the exact
brute-force pair set (the reference's own oracle path) at two
threshold points, and exit-gates the floors:

- t=0.9 with the gate's 32x8 banding: the production operating point
  the dedup_minhash gate row runs — floor 0.95 (at s >= 0.9 the
  32-perm/8-band hit probability is ~1 - (1 - 0.9^4)^8 ≈ 0.9996;
  the floor leaves slack for small-sample variance).
- t=0.8 with the SAME banding: off-design recall — documents NEAR
  the cut that a pipeline still mostly wants; floor 0.80.

Prints ONE JSON line; exit 0 iff both floors hold and precision is
exactly 1.0 (every reported pair >= threshold).

Usage: python tools/dedup_recall_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pair_set(df, l="l_id", r="r_id"):
    return {
        (min(a, b), max(a, b))
        for a, b in ((row[l], row[r]) for row in df.collect())
    }


def main() -> int:
    from pyspark.sql import functions as F

    from jaccard_join_duckdb_spark import (
        WhitespaceTokzr,
        get_spark,
        jaccard_join_brute_force,
    )
    from jaccard_join_duckdb_spark.operators.dedup import (
        minhash_near_duplicates,
    )
    from jaccard_join_duckdb_spark.sources import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        app_name="dedup-recall", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    results = {}
    ok = True
    for t, floor in ((0.9, 0.95), (0.8, 0.80)):
        exact = pair_set(
            jaccard_join_brute_force(
                docs, None, "doc_id", None, "text", None,
                WhitespaceTokzr(), t,
            ),
            l="l_doc_id",
            r="r_doc_id",
        )
        got_df = minhash_near_duplicates(docs, "doc_id", "text", t)
        got = pair_set(got_df)
        # precision check: every reported jaccard >= t (exact verify)
        n_below = got_df.filter(
            F.col("jaccard") < F.lit(float(t))
        ).count()
        recall = len(got & exact) / max(len(exact), 1)
        results[f"t{t}"] = {
            "exact_pairs": len(exact),
            "lsh_pairs": len(got),
            "recall": round(recall, 4),
            "floor": floor,
            "precision_violations": n_below,
        }
        ok = ok and recall >= floor and n_below == 0

    print(json.dumps({
        "metric": "minhash_dedup_recall",
        "sf_dir": sf_dir,
        "num_hashes": 32,
        "bands": 8,
        **results,
        "ok": ok,
    }))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
