"""End-to-end corpus curation — the composed training-data pipeline.

Beyond-reference extension: chains the engine's pipeline operators the
way a pre-training data run does —

1. quality gate   (:func:`..functions.text.text_stats` composite score
                   + minimum token count),
2. exact dedup    (:func:`.dedup.drop_exact_duplicates`, min-id
                   survivor per identical text),
3. near-dup dedup (:func:`.dedup.minhash_near_duplicates` pairs →
                   :func:`.dedup.connected_components` clusters →
                   keep the minimum id of every cluster).

Everything stays a lazy DataFrame graph except the near-dup stage's
bounded driver-side iteration (hash-min rounds) — no row data ever
reaches the driver, so the same code runs at cluster scale: the
quality gate is a scan-side filter, exact dedup one hash-groupBy, and
the MinHash stage shuffles signatures/bands exactly as documented in
:mod:`.dedup`.

The DuckDB oracle twin (plans/oracle_ext.curate_corpus_sql) replicates
every stage — same quality arithmetic, same md5 grouping, same minhash
parameters, same recursive-CTE component labels — so the composed
pipeline is hash-checked end-to-end, not just stage by stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.text import text_stats
from ..tokenizers import Tokenizer
from .dedup import (
    connected_components,
    drop_exact_duplicates,
    minhash_near_duplicates,
)

__all__ = ["curate_corpus"]


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.3,
    min_tokens: int = 20,
    neardup_threshold: float = 0.9,
    tokenizer: Tokenizer | None = None,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    cc_algorithm: str = "hash_min",
    cc_max_iterations: int = 50,
) -> DataFrame:
    """Surviving documents as ``(id_col, n_tokens, quality)``.

    A document survives iff it passes the quality gate AND is the
    minimum-id representative of both its exact-text group and its
    near-duplicate cluster (computed on the quality-passing set, as
    real pipelines do — junk is cut before the expensive stage).
    """
    stats = text_stats(df, id_col, text_col).select(
        id_col, "n_tokens", "quality"
    )
    kept_stats = stats.filter(
        (F.col("quality") >= F.lit(float(min_quality)))
        & (F.col("n_tokens") >= F.lit(int(min_tokens)))
    )
    kept = df.join(kept_stats.select(id_col), id_col, "left_semi")
    # Read twice (near-dup pair generation AND the final survivor
    # anti-join) — persist so the scan → quality gate → exact-dedup
    # chain executes once.
    kept = drop_exact_duplicates(kept, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pairs = minhash_near_duplicates(
        kept, id_col, text_col, neardup_threshold,
        tokenizer=tokenizer, num_hashes=num_hashes, bands=bands, seed=seed,
    )
    labels = connected_components(
        pairs, "l_id", "r_id",
        max_iterations=cc_max_iterations, algorithm=cc_algorithm,
    )
    losers = labels.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return (
        kept.join(losers, id_col, "left_anti")
        .join(kept_stats, id_col)
        .select(id_col, "n_tokens", "quality")
    )
