"""Cross-scale-factor scaling study: the measured answer to "would
this survive a 100x scale-up?".

Runs the expensive (non-floor-dominated) headline queries at
sf0.001 / sf0.01 / sf0.1 — a 100x data range — and reports each
query's wall-time growth. Exit-gated check: for every measured
query, the sf0.01 -> sf0.1 growth factor (10x data) stays below
``MAX_GROWTH`` (default 15x) — i.e. the candidate-generation and
verification pipelines scale at most modestly superlinearly on this
corpus, rather than quadratically. Deliberately excluded:
``*_brute`` oracle paths (documented quadratic baselines) and
sub-second queries (fixed per-job floor swamps data cost).

Usage: python tools/scaling_bench.py [max_growth]
Prints one JSON line; exit 0 iff every growth factor is under the
bound. Results are recorded in BENCHMARKS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
QUERIES = [
    "jaccard_self_ws",
    "jaccard_self_qgram",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram",
    "decontaminate",
    "decontaminate_ngram",
    "edit_distance_join",
    "winnow_pairs",
    "text_bm25_topk",
]


def main() -> int:
    max_growth = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0

    import __spark_entry__ as e
    from jaccard_join_duckdb_spark import get_spark

    spark = get_spark(
        app_name="scaling-bench", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**e.queries(), **e.extra_queries()}

    results: dict[str, dict] = {}
    ok = True
    for name in QUERIES:
        walls, rows = [], []
        for sf in SFS:
            qs[name](spark, sf).count()  # warm-up (codegen)
            best, n = None, None
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = qs[name](spark, sf).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            walls.append(round(best, 3))
            rows.append(n)
        growth = round(walls[2] / max(walls[1], 1e-9), 2)
        results[name] = {
            "wall_s": walls,
            "rows": rows,
            "growth_01_to_1": growth,
        }
        ok &= growth <= max_growth
        print(f"# {name}: {walls} growth={growth}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scaling_100x",
                "sfs": [0.001, 0.01, 0.1],
                "max_growth_bound": max_growth,
                "queries": results,
                "ok": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
