"""Stage-wall breakdown for one refscale self-join cell (VERDICT r10 #7).

The refscale grid reports one wall per cell (tokenize → full
materialization). For cells that sit above the 2× line WITHOUT a plan
defect — db10 5g t=0.5 being the canonical one (broadcast correctly
declined at bound/token-rows ≈ 1.2, rows hash-green) — the open
question is WHERE the seconds go: the tokenize explode, the
doc-frequency shuffle + rank window, the driver-side gate scalars, the
candidate equi-join, or the verify attaches. This tool answers it by
materializing the pipeline at each internal boundary, reusing the
previous boundary's persisted frame so each delta is one stage's wall:

  1. tokenize     — tokenizer chain, persisted, count()
  2. dfreq+stats  — groupBy(token).count + the fused decision aggregate
  3. tkdf         — tokens_with_doc_freq(dfreq=...) persisted, count()
  4. gate stats   — _self_gate_stats (the exact candidate-bound job),
                    or 0 when the sparse fast-decline skips it
  5. candidates   — prefix-filtered token equi-join + pair groupBy
  6. verify       — attaches + suffix overlap to the final pair count

plus `one_shot`: the unsegmented public-API wall (same session, same
warm cache discipline as tools/ref_scale_bench.py), and `job_floor`:
the measured wall of an empty 32-partition shuffle job, the per-action
scheduling floor that every scalar/stat job pays regardless of data.

Segmented stages share the session but NOT intermediate caches with
`one_shot` (clearCache between), so sum(stages) ≈ one_shot up to
re-listing noise; divergence > ~20% would itself be a finding.

Usage::

    python tools/cell_profile.py [dataset] [tokname] [threshold] [n]

Defaults: db10 5g 0.5, n=3 (min over n for every wall). Prints one
JSON line; exit 0 always (diagnostic, not a gate).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "refscale")


def _best(fn, n):
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return min(walls)


def main() -> int:
    dataset = sys.argv[1] if len(sys.argv) > 1 else "db10"
    tok_name = sys.argv[2] if len(sys.argv) > 2 else "5g"
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    # Pre-touch the pinned heap so timed iterations never fault
    # fresh pages (see session.py round-11 note on VM memory storms).
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from jaccard_join_duckdb_spark import (
        QGramsTokzr,
        WhitespaceTokzr,
        get_spark,
    )
    from jaccard_join_duckdb_spark.operators import jaccard as J

    spark = get_spark(app_name="cell-profile")
    spark.sparkContext.setLogLevel("ERROR")
    tok = WhitespaceTokzr() if tok_name == "ws" else QGramsTokzr(5)

    df = spark.read.parquet(os.path.join(DATA, f"{dataset}.parquet"))

    # Warm-up: one end-to-end run, excluded (mirrors ref_scale_bench).
    J.jaccard_self_join(df, "id", "val", tok, t).count()
    spark.catalog.clearCache()

    # Per-action scheduling floor: an empty 32-partition shuffle job.
    floor = _best(
        lambda: spark.range(0, 32, 1, 32).groupBy(
            (F.col("id") % 32).alias("k")
        ).count().count(),
        n,
    )

    # --- one-shot public-API wall (the grid's quantity) ---
    def one_shot():
        J.jaccard_self_join(df, "id", "val", tok, t).count()
        spark.catalog.clearCache()

    w_one_shot = _best(one_shot, n)

    # --- segmented walls (min over n full segmented runs) ---
    stages: dict[str, list[float]] = {}
    out_rows = 0
    for _ in range(n):
        t0 = time.monotonic()
        tokens = tok.tokenize(df, "id", "val").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        tokens.count()
        t1 = time.monotonic()
        dfreq = tokens.groupBy("token").agg(
            F.count(F.lit(1)).alias("df")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        row = dfreq.agg(
            F.count(F.lit(1)).alias("v"),
            F.sum("df").alias("ntok"),
            F.max("df").alias("m"),
            F.sum((F.col("df") * F.col("df")).cast("double")).alias("sq"),
        ).first()
        t2 = time.monotonic()
        vocab_n = int(row["v"] or 0)
        sumsq = float(row["sq"] or 0.0)
        n_tok_total = int(row["ntok"] or 0)
        bitset = tok.rows_distinct and 0 < vocab_n <= J._MAX_BITSET_VOCAB
        if bitset:
            tkdf = J._tokens_with_tid(tokens, dfreq=dfreq)
        else:
            tkdf = J.tokens_with_doc_freq(
                tokens, with_pair_key=True, hot_df_threshold=None,
                dfreq=dfreq,
            )
        if bitset:
            print(json.dumps({
                "metric": "cell_profile", "error":
                "profiler segments the array and generic verify "
                "paths; this cell takes the bitset path",
            }))
            spark.stop()
            return 0
        tkdf = tkdf.persist(StorageLevel.MEMORY_AND_DISK)
        tkdf.count()
        t3 = time.monotonic()
        cheap_decline = sumsq < J._BROADCAST_VERIFY_MIN_RATIO * max(
            n_tok_total, 1
        )
        n_docs = n_tok = bound = 0
        dup_rows = -1
        if not cheap_decline:
            n_docs, n_tok, bound, dup_rows = J._self_gate_stats(tkdf, t)
        t4 = time.monotonic()
        Lp = tkdf.filter(
            J._indexing_prefix_cond(F.col("len"), F.col("pos"), t)
        ).alias("L")
        Rp = tkdf.filter(
            J._probing_prefix_cond(F.col("len"), F.col("pos"), t)
        ).alias("R")
        cond = (
            (F.col("L.token") == F.col("R.token"))
            & (F.col("L.l_id") < F.col("R.l_id"))
            & J._length_cond(F.col("L.len"), F.col("R.len"), t)
            & J._positional_cond(
                F.col("L.len"), F.col("L.pos"),
                F.col("R.len"), F.col("R.pos"), t,
            )
        )
        cand = (
            Lp.join(Rp, cond)
            .groupBy(
                F.col("L.id").alias("lid"), F.col("R.id").alias("rid")
            )
            .agg(
                F.max("L.pos").alias("lmaxpos"),
                F.max("R.pos").alias("rmaxpos"),
                F.count(F.lit(1)).alias("pfxoverlap"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_cand = cand.count()
        t5 = time.monotonic()
        if not tok.rows_distinct and dup_rows != 0:
            # Generic verify: the reference's pairs×tokens three-way
            # join (jaccard_self_join's last branch, same attach gate
            # arguments; no lens attach — the remaining-suffix
            # pre-filter is provably vacuous, see _positional_cond).
            Lv = tkdf.alias("VL")
            Rv = tkdf.alias("VR")
            out = (
                cand.join(
                    J._verify_attach(Lv, n_tok, token_level=True,
                                     bound=bound),
                    F.col("lid") == F.col("VL.id"),
                )
                .join(
                    J._verify_attach(Rv, n_tok, token_level=True,
                                     bound=bound),
                    (F.col("rid") == F.col("VR.id"))
                    & (F.col("VL.token") == F.col("VR.token"))
                    & (F.col("VL.pos") >= F.col("lmaxpos"))
                    & (F.col("VR.pos") >= F.col("rmaxpos")),
                )
                .groupBy(
                    "lid", "rid", F.col("VL.len").alias("llen"),
                    F.col("VR.len").alias("rlen"), "pfxoverlap",
                )
                .agg(F.count(F.lit(1)).alias("sfx"))
                .filter(
                    J._overlap_cond(
                        F.col("sfx") + F.col("pfxoverlap") - 1,
                        F.col("llen"), F.col("rlen"), t,
                    )
                )
            )
            out_rows = out.count()
            t6 = time.monotonic()
            for name, w in [
                ("tokenize", t1 - t0), ("dfreq_stats", t2 - t1),
                ("tkdf", t3 - t2), ("gate_stats", t4 - t3),
                ("candidates", t5 - t4), ("verify", t6 - t5),
            ]:
                stages.setdefault(name, []).append(w)
            meta = {
                "vocab_n": vocab_n, "bitset": bitset, "path": "generic",
                "n_tok": n_tok_total, "sumsq": sumsq,
                "cheap_decline": cheap_decline, "bound": bound,
                "ratio": round(bound / max(n_tok, 1), 2) if bound else None,
                "n_cand": n_cand,
            }
            spark.catalog.clearCache()
            continue
        arrs = J._pos_token_arrays(tkdf)
        out = (
            cand.join(
                J._verify_attach(arrs.select(
                    F.col("id").alias("lid"),
                    F.col("len").alias("llen"),
                    F.col("arr").alias("la"),
                ), n_docs, bound=bound, decide_rows=n_tok), "lid")
            .join(
                J._verify_attach(arrs.select(
                    F.col("id").alias("rid"),
                    F.col("len").alias("rlen"),
                    F.col("arr").alias("ra"),
                ), n_docs, bound=bound, decide_rows=n_tok), "rid")
            .withColumn("sfx", J._suffix_overlap(
                F.col("la"), F.col("llen"), F.col("lmaxpos"),
                F.col("ra"), F.col("rlen"), F.col("rmaxpos"),
            ))
            .filter(
                (F.col("sfx") >= 1)
                & J._overlap_cond(
                    F.col("sfx") + F.col("pfxoverlap") - 1,
                    F.col("llen"), F.col("rlen"), t,
                )
            )
        )
        out_rows = out.count()
        t6 = time.monotonic()
        for name, w in [
            ("tokenize", t1 - t0), ("dfreq_stats", t2 - t1),
            ("tkdf", t3 - t2), ("gate_stats", t4 - t3),
            ("candidates", t5 - t4), ("verify", t6 - t5),
        ]:
            stages.setdefault(name, []).append(w)
        meta = {
            "vocab_n": vocab_n, "bitset": bitset,
            "path": "array" if tok.rows_distinct else "array-runtime",
            "n_tok": n_tok_total, "sumsq": sumsq,
            "cheap_decline": cheap_decline, "bound": bound,
            "ratio": round(bound / max(n_tok, 1), 2) if bound else None,
            "n_cand": n_cand,
        }
        spark.catalog.clearCache()

    mins = {k: round(min(v), 3) for k, v in stages.items()}
    result = {
        "metric": "cell_profile",
        "cell": f"{dataset} self {tok_name} t={t}",
        "one_shot_s": round(w_one_shot, 3),
        "stages_s": mins,
        "stages_sum_s": round(sum(mins.values()), 3),
        "job_floor_s": round(floor, 3),
        "out_rows": out_rows,
        "n": n,
        **meta,
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
