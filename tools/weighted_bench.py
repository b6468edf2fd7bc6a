"""Weighted-PPJoin prefix-filter evidence — exit-gated.

``weighted_jaccard_near_duplicates`` (round 7) generates candidates
from weight-ordered PREFIX tokens instead of the raw all-shared-token
inverted index. On a realistic stopword-heavy corpus the raw index is
quadratic — every document pair shares "the/and/of", so candidate
fan-out approaches N²/2 regardless of how dissimilar the documents
are. The prefix filter is LOSSLESS (proved in the operator docstring;
fuzzed in tests/test_property_fuzz.py::test_weighted_prefix_filter_
lossless), so this tool gates the two claims that matter at scale:

1. EXACTNESS on a non-degenerate corpus: the prefix-filtered result
   equals the exact all-shared-token baseline (the pre-round-7
   algorithm, inlined below), pair-for-pair and score-for-score.
2. FAN-OUT REDUCTION: the number of candidate pairs the prefix join
   generates is a small fraction of the raw shared-token pair count
   (gate: <= 20%; measured ~1% on the generated corpus).
3. GROWTH (round-8): a 1x/2x/4x corpus-size ladder — the prefix
   candidate fan-out must grow SUB-QUADRATICALLY: per corpus
   doubling, candidates grow <= 3.0x (linear would be ~2x, the raw
   quadratic index ~4x; the raw fan-out is reported alongside for
   contrast). This measures the scale claim instead of arguing it.

   The ladder scales the CONTENT VOCABULARY with the corpus (vocab
   size proportional to doc count — Heaps'-law-style growth, the
   realistic regime for web-scale text), while the stopword set stays
   fixed (stopwords are a property of the language, not the corpus
   size — their df grows linearly with n no matter what, which is
   exactly the quadratic trap the raw index falls into). Measured
   first with a FIXED vocabulary: per-token df then doubles with the
   corpus and EVERY token-bucket blocking scheme — raw or prefix —
   degrades toward n^2 (prefix measured ~5x/doubling, raw ~4x); that
   regime calls for larger blocking keys (shingles), not a different
   prefix. Under vocabulary growth the prefix fan-out tracks the
   content-token collision rate and stays ~linear while the raw
   index, still dominated by the fixed stopwords, stays quadratic —
   the contrast the gate pins.

Corpus: deterministic (seeded) synthetic web-ish text — a 30-word
stopword vocabulary present in nearly every document (the quadratic
trap) + a 8000-word Zipf content vocabulary + ~8% near-duplicate
mutated copies (so the operator has true positives to find).

Prints ONE JSON line; exit 0 iff both gates hold.

Usage: python tools/weighted_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STOPWORDS = (
    "the of and to in a is that it was for on are as with his they at be "
    "this have from or had by word but not what all"
).split()


def gen_corpus(
    n_docs: int, seed: int = 7, vocab_size: int = 8000
) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    vocab = [f"w{i:05d}" for i in range(vocab_size)]
    docs: list[tuple[int, str]] = []
    for i in range(n_docs):
        n_tok = rng.randint(30, 80)
        words = []
        for _ in range(n_tok):
            if rng.random() < 0.45:
                words.append(rng.choice(STOPWORDS))
            else:
                # Zipf-ish: quadratic skew toward low ranks
                r = rng.random()
                words.append(vocab[int(vocab_size * r * r * 0.999)])
        docs.append((i, " ".join(words)))
    # ~8% near-duplicates: copy an earlier doc, mutate a few tokens
    n_dup = n_docs // 12
    for j in range(n_dup):
        src_id, src_text = docs[rng.randrange(len(docs) - n_dup)]
        words = src_text.split()
        for _ in range(max(1, len(words) // 20)):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        docs.append((n_docs + j, " ".join(words)))
    return docs


def _fanouts(spark, docs, n: int, t_scaled: int, max_df_frac: float = 1.0):
    """(raw_fanout, prefix_fanout) for a docs frame — the candidate
    pair counts of the all-shared-token index vs the weighted prefix.
    The prefix selection (weight formula + cumulative-window filter)
    is the OPERATOR'S OWN code (dedup.W_EXPR +
    dedup.weighted_prefix_tokens — round-8 advisor #3: an inline
    re-implementation here could silently measure a stale definition),
    including the ``max_df_frac`` candidate cap the operator applies
    before prefix selection."""
    from pyspark.sql import functions as F

    from jaccard_join_duckdb_spark import WhitespaceTokzr
    from jaccard_join_duckdb_spark.operators.dedup import (
        W_EXPR,
        W_SCALE,
        _token_sets,
        weighted_prefix_tokens,
    )

    toks = _token_sets(docs, "id", "text", WhitespaceTokzr())
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    weighted = dfreq.select(
        "token",
        "df",
        F.expr(W_EXPR.format(n=n, scale=W_SCALE)).alias("w"),
    )
    tw = toks.join(weighted, "token").select(
        "id", "token", "w", "df"
    ).persist()
    tw.count()
    raw = (
        dfreq.select((F.col("df") * (F.col("df") - 1) / 2).alias("p"))
        .agg(F.sum("p").cast("long").alias("s"))
        .first()["s"]
    )
    # totals over ALL tokens; the df cap (operator: cand_toks) only
    # limits candidate generation
    totals = tw.groupBy("id").agg(F.sum("w").alias("wtotal"))
    cand_toks = tw.filter(
        F.col("df").cast("double")
        <= F.lit(float(max_df_frac)) * F.lit(float(n))
    ).select("id", "token", "w")
    prefix_fanout = (
        weighted_prefix_tokens(cand_toks, totals, t_scaled)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .select((F.col("df") * (F.col("df") - 1) / 2).alias("p"))
        .agg(F.sum("p").cast("long").alias("s"))
        .first()["s"]
    ) or 0
    tw.unpersist()
    return raw, prefix_fanout


def main() -> int:
    from pyspark.sql import functions as F

    from jaccard_join_duckdb_spark import WhitespaceTokzr, get_spark
    from jaccard_join_duckdb_spark.operators.dedup import (
        W_SCALE,
        _token_sets,
        weighted_jaccard_near_duplicates,
    )

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    t = 0.7
    spark = get_spark(
        app_name="weighted-bench", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.createDataFrame(
        gen_corpus(n_docs), "id long, text string"
    ).persist()
    n = docs.count()

    # --- exact baseline: the pre-round-7 all-shared-token index ----
    t_scaled = int(round(t * W_SCALE))
    toks = _token_sets(docs, "id", "text", WhitespaceTokzr()).persist()
    toks.count()
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    weighted = dfreq.select(
        "token",
        "df",
        F.expr(f"((2 * {n} - 2 * df + 1) * {W_SCALE}) div (2 * df + 1)")
        .alias("w"),
    )
    tw = toks.join(weighted, "token").select("id", "token", "w").persist()
    tw.count()
    totals = tw.groupBy("id").agg(F.sum("w").alias("wtotal")).persist()
    totals.count()
    # raw fan-out: the candidate count the OLD path shuffles/aggregates
    raw_fanout = (
        dfreq.select((F.col("df") * (F.col("df") - 1) / 2).alias("p"))
        .agg(F.sum("p").cast("long").alias("s"))
        .first()["s"]
    )
    t0 = time.perf_counter()
    l = tw.select(F.col("id").alias("l_id"), "token", F.col("w").alias("lw"))
    r = tw.select(F.col("id").alias("r_id"), "token", F.col("w"))
    shared = (
        l.join(r, "token")
        .filter(F.col("l_id") < F.col("r_id"))
        .groupBy("l_id", "r_id")
        .agg(F.sum("lw").alias("shared_w"))
    )
    lt = totals.select(F.col("id").alias("l_id"), F.col("wtotal").alias("lt"))
    rt = totals.select(F.col("id").alias("r_id"), F.col("wtotal").alias("rt"))
    exact = (
        shared.join(lt, "l_id")
        .join(rt, "r_id")
        .withColumn("u", F.col("lt") + F.col("rt") - F.col("shared_w"))
        .filter(F.col("shared_w") * F.lit(W_SCALE) >= F.lit(t_scaled) * F.col("u"))
        .select(
            "l_id",
            "r_id",
            F.round(
                F.col("shared_w").cast("double") / F.col("u").cast("double"), 6
            ).alias("wjaccard"),
        )
    )
    exact_set = {(x.l_id, x.r_id, x.wjaccard) for x in exact.collect()}
    exact_s = round(time.perf_counter() - t0, 3)

    # --- prefix-filtered operator -----------------------------------
    t0 = time.perf_counter()
    got_df = weighted_jaccard_near_duplicates(docs, "id", "text", t)
    got_set = {(x.l_id, x.r_id, x.wjaccard) for x in got_df.collect()}
    prefix_s = round(time.perf_counter() - t0, 3)

    # prefix candidate fan-out, recomputed the way the operator does
    from pyspark.sql.window import Window

    w_ord = Window.partitionBy("id").orderBy(
        F.col("w").desc(), F.col("token").asc()
    )
    w_all = Window.partitionBy("id")
    dec = "decimal(38,0)"
    with_tot = tw.join(totals, "id").select(
        "id",
        "token",
        "w",
        "wtotal",
        F.sum("w")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("w").over(w_all).alias("cand_total"),
    )
    prefix = with_tot.filter(
        (
            (F.col("cand_total") - F.col("cum") + F.col("w")).cast(dec)
            * F.lit(W_SCALE).cast(dec)
        )
        >= F.lit(t_scaled).cast(dec) * F.col("wtotal").cast(dec)
    ).select("id", "token").persist()
    prefix.count()
    prefix_fanout = (
        prefix.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .select((F.col("df") * (F.col("df") - 1) / 2).alias("p"))
        .agg(F.sum("p").cast("long").alias("s"))
        .first()["s"]
    ) or 0

    equal = got_set == exact_set
    frac = prefix_fanout / max(raw_fanout, 1)

    # --- growth ladder: 1x / 2x / 4x corpus sizes --------------------
    # (the exact quadratic baseline is NOT rerun at the bigger sizes —
    # the ladder measures how the operator's candidate generation
    # scales, which is the 100 TB claim)
    ladder = [{
        "n_docs": n,
        "raw_fanout": raw_fanout,
        "prefix_fanout": prefix_fanout,
        "operator_sec": prefix_s,
    }]
    for mult in (2, 4):
        nd = n_docs * mult
        # vocabulary scales with the corpus (Heaps-style, see module
        # docstring); the stopword trap stays fixed by construction
        big = spark.createDataFrame(
            gen_corpus(nd, seed=7 + mult, vocab_size=4 * nd),
            "id long, text string",
        ).persist()
        nb = big.count()
        raw_b, pref_b = _fanouts(spark, big, nb, t_scaled)
        t0 = time.perf_counter()
        weighted_jaccard_near_duplicates(big, "id", "text", t).count()
        op_s = round(time.perf_counter() - t0, 3)
        ladder.append({
            "n_docs": nb,
            "raw_fanout": raw_b,
            "prefix_fanout": pref_b,
            "operator_sec": op_s,
        })
        big.unpersist()
    growth = [
        round(b["prefix_fanout"] / max(a["prefix_fanout"], 1), 3)
        for a, b in zip(ladder, ladder[1:])
    ]
    raw_growth = [
        round(b["raw_fanout"] / max(a["raw_fanout"], 1), 3)
        for a, b in zip(ladder, ladder[1:])
    ]
    growth_ok = all(g <= 3.0 for g in growth)

    ok = equal and frac <= 0.20 and len(exact_set) > 0 and growth_ok
    print(json.dumps({
        "metric": "weighted_prefix_filter",
        "n_docs": n,
        "threshold": t,
        "pairs": len(exact_set),
        "results_equal": equal,
        "raw_candidate_fanout": raw_fanout,
        "prefix_candidate_fanout": prefix_fanout,
        "fanout_fraction": round(frac, 5),
        "exact_baseline_sec": exact_s,
        "prefix_operator_sec": prefix_s,
        "ladder": ladder,
        "prefix_fanout_growth_per_doubling": growth,
        "raw_fanout_growth_per_doubling": raw_growth,
        "growth_ok": growth_ok,
        "ok": ok,
    }))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
