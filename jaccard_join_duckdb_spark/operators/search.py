"""Corpus text search: positional inverted index + exact phrase
queries.

Beyond-reference operators (the reference has no search surface;
SURVEY.md §2) for the training-data INSPECTION loop: once a corpus
is curated, pipeline owners ask "which documents contain this exact
phrase, and where" — contamination spot-checks, takedown lookups,
eval-leak forensics. Classic IR answer re-expressed Spark-first:

- :func:`token_postings` — the positional postings relation
  ``(token, id, pos)`` straight off the tokenizer (1-based
  positions).
- :func:`write_postings_index` — postings persisted as a table
  BUCKETED BY ``token`` (``sources.write_bucketed``): every phrase
  probe reads only the query tokens' buckets (exit-gated evidence
  in ``tools/search_bench.py``: SelectedBucketsCount 1-of-N per
  scan). The probe's own joins key on ``(id, pos)``, so Spark's
  auto-bucketed-scan demotion would silently drop the bucketed
  read — and the pruning with it; probe sessions should set
  ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false``.
- :func:`phrase_search` — exact consecutive-token match via k-1
  equi-joins on ``(id, anchor_pos)``: occurrences of phrase token i
  at position ``start + i - 1`` for every i. The ANCHOR term (the
  join's driving side) is the RAREST query token — its posting list
  bounds every intermediate, the same heuristic as a hand-written
  IR engine's smallest-postings-first intersection. Token equality
  filters push down to the scan (`PushedFilters` on the postings
  parquet; bucket pruning on the bucketed table).

Scale notes (100 TB): postings are one explode of the corpus
(narrow 3-column rows, written once); a phrase probe touches k
posting lists, each pre-hashed into buckets, intersected by narrow
``(id, pos)`` hash joins whose build side is the rarest list. No
scan of the corpus text at query time, no driver materialization
beyond the k per-token counts used to pick the anchor.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "token_postings",
    "write_postings_index",
    "load_term_counts",
    "phrase_search",
    "phrase_search_many",
    "phrase_search_scan",
]

_AUTO_BUCKETED_SCAN = "spark.sql.sources.bucketing.autoBucketedScan.enabled"


def token_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(token, id, pos)`` positional postings; ``pos`` is the
    1-based whitespace-token position (same lowercased bag as
    ``functions.text.ws_token_array``, duplicates kept — positions
    distinguish them)."""
    from ..functions.text import ws_token_array
    from ..tokenizers import _ensure_parallelism

    # tokenization parallelism equals the scan's split count; a
    # compacted (single-row-group) corpus would serialize the whole
    # explode — rebalance first, a no-op on real multi-split layouts.
    narrow = _ensure_parallelism(df.select(id_col, text_col))
    return narrow.select(
        F.col(id_col).alias("id"),
        F.posexplode(ws_token_array(F.col(text_col))).alias("p0", "token"),
    ).select("token", "id", (F.col("p0") + 1).alias("pos"))


def write_postings_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    name: str,
    num_buckets: int = 64,
) -> str:
    """Build and persist the postings index bucketed by ``token``
    (probe-time bucket pruning + co-located intersections), PLUS the
    per-token posting-list sizes as ``<name>_counts`` — the
    anchor-choice side table that lets :func:`phrase_search` skip its
    per-probe aggregation job (pass it as ``term_counts``). Returns
    the postings table name; read back with ``spark.table(name)``."""
    from ..sources import write_bucketed

    postings = token_postings(df, id_col, text_col)
    tbl = write_bucketed(
        postings.repartition(num_buckets, "token"),
        name,
        ["token"],
        num_buckets,
    )
    # counts come off the just-written bucketed table (one bucketed
    # scan, groupBy reuses the bucket hash — no extra Exchange of the
    # raw postings) and land as a plain table: vocabulary-sized, read
    # with a pushed token filter at probe time.
    spark = df.sparkSession
    (
        spark.table(tbl)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .write.mode("overwrite")
        .saveAsTable(f"{name}_counts")
    )
    return tbl


def load_term_counts(spark: SparkSession, name: str) -> DataFrame:
    """The ``(token, cnt)`` side table written by
    :func:`write_postings_index` for postings table ``name``."""
    return spark.table(f"{name}_counts")


def _warn_if_bucket_scan_demoted(
    probe: DataFrame, strict: bool = False
) -> None:
    """A bucketed postings table silently loses BOTH the bucketed
    read and the bucket pruning when Spark's auto-bucketed-scan
    planner rule decides bucketing doesn't help the query shape (the
    probe's joins key on (id, start), not token). That demotion turns
    a read-k-buckets probe into a full index scan — invisible at test
    scale, a 100x regression on a real index. Inspect the planned
    scans and surface it (warn, or raise with ``strict``)."""
    try:
        plan = probe._jdf.queryExecution().executedPlan().toString()
    except Exception:  # pragma: no cover - non-JVM backends
        return
    if "Bucketed: false" not in plan:
        return
    reasons = [
        ln.strip()
        for ln in plan.splitlines()
        if "Bucketed: false" in ln
    ]
    msg = (
        "phrase probe reads a bucketed postings table WITHOUT the "
        f"bucketed scan ({'; '.join(sorted(set(reasons)))}) — bucket "
        "pruning is lost and the whole index is scanned. Set "
        f"{_AUTO_BUCKETED_SCAN}=false for probe sessions "
        "(tools/search_bench.py exit-gates the pruned plan)."
    )
    if strict:
        raise RuntimeError(msg)
    warnings.warn(msg, RuntimeWarning, stacklevel=3)


def _phrase_terms(phrase: str) -> list[str]:
    terms = [t for t in phrase.lower().split() if t.strip()]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    return terms


def phrase_search(
    postings: DataFrame,
    phrase: str,
    term_counts: DataFrame | dict[str, int] | None = None,
    strict_buckets: bool = False,
) -> DataFrame:
    """Documents containing the exact consecutive-token ``phrase``:
    ``(id, start_pos)`` per occurrence (1-based position of the
    phrase's first token; overlapping occurrences all reported).

    The k-way positional intersection anchors on the rarest query
    term, so every intermediate is bounded by the smallest posting
    list, not the stopword-est one; remaining terms join
    rarest-first on ``(id, start)``.

    ``term_counts`` supplies the anchor-choice sizes without
    re-aggregating the postings per probe: the ``<name>_counts``
    table written by :func:`write_postings_index` (one pushed-filter
    read of k tiny rows), or a plain ``{token: count}`` dict (ZERO
    extra jobs — collect the counts table once for a probe loop).
    When absent, one aggregation job over the query terms' postings
    computes them (the original path). Absent terms count 0 and
    anchor an empty list.

    ``strict_buckets`` raises instead of warning when a bucketed
    postings table is being probed without its bucketed scan (see
    :func:`_warn_if_bucket_scan_demoted`).
    """
    terms = _phrase_terms(phrase)
    lists = [
        postings.filter(F.col("token") == t).select("id", "pos")
        for t in terms
    ]
    if len(terms) == 1:
        out = lists[0].select("id", F.col("pos").alias("start_pos"))
        _warn_if_bucket_scan_demoted(out, strict_buckets)
        return out
    if isinstance(term_counts, dict):
        cnt = {t: int(term_counts.get(t, 0)) for t in terms}
    else:
        src = (
            term_counts.filter(F.col("token").isin(sorted(set(terms))))
            .select("token", F.col("cnt").alias("c"))
            if term_counts is not None
            else postings.filter(F.col("token").isin(sorted(set(terms))))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        cnt = {r["token"]: r["c"] for r in src.collect()}
    order = sorted(range(len(terms)), key=lambda i: (cnt.get(terms[i], 0), i))
    base_i = order[0]
    out = lists[base_i].select(
        "id", (F.col("pos") - base_i).alias("start")
    )
    for i in order[1:]:
        out = out.join(
            lists[i].select("id", (F.col("pos") - i).alias("start")),
            ["id", "start"],
        )
    out = out.select("id", F.col("start").alias("start_pos"))
    _warn_if_bucket_scan_demoted(out, strict_buckets)
    return out


def phrase_search_scan(
    df: DataFrame, id_col: str, text_col: str, phrase: str
) -> DataFrame:
    """Index-less convenience: :func:`phrase_search` over postings
    computed on the fly (one corpus scan). Use the bucketed index for
    repeated probes."""
    return phrase_search(token_postings(df, id_col, text_col), phrase)


def phrase_search_many(
    postings: DataFrame, phrases: DataFrame
) -> DataFrame:
    """Batch phrase probe: every occurrence of every phrase in ONE
    set-oriented pass — the decontamination-forensics shape (probe
    thousands of benchmark phrases against the corpus) where a
    per-phrase :func:`phrase_search` loop would schedule thousands
    of driver-side jobs.

    ``phrases``: ``(phrase_id, phrase)``. Each phrase explodes into
    ``(phrase_id, off, term)`` rows; one equi-join on
    ``token = term`` aligns candidate starts (``pos - off``), and a
    ``(phrase_id, id, start)`` count-equals-k aggregation keeps
    exact full matches — per (start, off) at most one posting can
    match (positions are unique per occurrence), so ``count(*) = k``
    iff every offset matched, duplicate phrase terms included.

    Output: ``(phrase_id, id, start_pos)``. Scale: one shuffle join
    on ``token`` (phrase side tiny → broadcast) + one aggregation;
    corpus-frequency skew on stopword terms is bounded by the
    phrases' term selectivity, and the aggregation is map-side
    partial.
    """
    from ..functions.text import ws_token_array

    bag = ws_token_array(F.col("phrase"))  # same fold as the postings
    # a NULL/empty/whitespace phrase explodes to zero term rows and
    # would silently vanish from the output — in forensics that reads
    # as "zero hits", a false negative. Same contract as
    # phrase_search: reject up front (one tiny job on the phrase set).
    bad = phrases.filter(
        F.col("phrase").isNull() | (F.size(bag) == 0)
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"phrase {bad[0]['phrase_id']!r} has no tokens — every "
            "phrase must contain at least one token"
        )
    terms = phrases.select(
        F.col("phrase_id"),
        F.size(bag).alias("k"),
        F.posexplode(bag).alias("off", "term"),
    )
    return (
        postings.join(
            F.broadcast(terms), postings["token"] == terms["term"]
        )
        .select(
            "phrase_id",
            "k",
            "id",
            (F.col("pos") - F.col("off")).alias("start"),
        )
        .groupBy("phrase_id", "id", "start", "k")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == F.col("k"))
        .select("phrase_id", "id", F.col("start").alias("start_pos"))
    )
