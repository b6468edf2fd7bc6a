"""Text-analysis functions for large-scale corpus pipelines.

Beyond-reference operators (BASELINE.json north star): token
counting, quality scoring, language ID, and document fingerprinting
— all pure ``pyspark.sql.functions`` column expressions (JVM-side,
whole-stage codegen; no UDFs), each designed to be replicated
verbatim in DuckDB SQL for the correctness oracle.

Determinism contract: every float output is ``round(x, 6)`` on
double arithmetic with identical expression shape in the SQL oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "bm25_top_terms",
    "corpus_profile",
    "packing_stats",
    "pack_sequences",
    "remove_boilerplate_lines",
    "url_domain_stats",
    "filter_blocked_domains",
    "URL_DOMAIN_PATTERN",
    "ws_token_array",
    "poly_hash",
    "redact_pii",
    "repetition_stats",
    "text_stats",
    "token_counts",
    "lm_score",
    "lm_score_apply",
    "train_ngram_lm",
    "NgramLM",
    "perplexity_buckets",
    "dsir_weights",
    "gopher_rules",
    "c4_rules",
    "build_vocab",
    "lang_id",
    "doc_fingerprint",
    "PII_PATTERNS",
    "STOPWORDS",
]

# Whitespace char class — same class as WhitespaceTokzr.
_WS = "[ \t\r\n]"
# BPE-ish pretokenizer: word pieces or single non-space symbols.
BPE_REGEX = r"\w+|[^\w\s]"

# Tiny per-language stopword lists for the heuristic language ID.
# Alphabetical language order is the documented tie-break priority.
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "los", "y", "es", "en", "un"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
}


def ws_token_array(col: Column) -> Column:
    """Bag of whitespace tokens (lowercased), empty pieces dropped —
    the Delimiter tokenizer's list stage without dedup."""
    return F.filter(
        F.split(F.lower(col), _WS, -1), lambda x: F.trim(x) != F.lit("")
    )


def poly_hash(col: Column, mult: int = 31, mod: int = 2147483647) -> Column:
    """Deterministic 31-bit polynomial string hash
    ``acc = (acc*31 + codepoint) % (2^31-1)`` — chosen because the
    identical fold is expressible in DuckDB via ``list_reduce``
    (engine-portable, unlike xxhash64/murmur3)."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.ascii(col.substr(i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(mult) + c) % F.lit(mod),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish symbol count per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(ws_token_array(t)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_REGEX), 0)).alias("bpe_tokens"),
        F.length(t).alias("n_chars"),
    )


def _class_ratio(t: Column, strip_class: str) -> Column:
    """Fraction of chars in the class: strip the complement, count
    what remains — double division, rounded at 6."""
    in_class = F.length(F.regexp_replace(t, strip_class, ""))
    return F.round(in_class.cast("double") / F.length(t).cast("double"), 6)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality-scoring features: char/token counts, digit / punct /
    uppercase / whitespace ratios, mean token length, stopword ratio,
    and a composite quality score in [0, 1]."""
    t = F.col(text_col)
    toks = ws_token_array(t)
    n_tok = F.size(toks)
    stop_all = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*stop_all))
    )
    stats = df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        _class_ratio(t, "[^0-9]").alias("digit_ratio"),
        _class_ratio(t, r"[^.,;:!?'\"()\[\]{}-]").alias("punct_ratio"),
        _class_ratio(t, "[^A-Z]").alias("upper_ratio"),
        F.round(
            F.length(t).cast("double") / n_tok.cast("double"), 6
        ).alias("chars_per_token"),
        F.round(
            stop_hits.cast("double") / n_tok.cast("double"), 6
        ).alias("stopword_ratio"),
    )
    # Composite score: well-formed prose has moderate token length,
    # few digits, some stopwords. Deterministic double arithmetic.
    return stats.withColumn(
        "quality",
        F.round(
            (1.0 - F.least(F.lit(1.0), F.col("digit_ratio") * 4))
            * (1.0 - F.least(F.lit(1.0), F.col("punct_ratio") * 4))
            * F.least(F.lit(1.0), F.col("stopword_ratio") * 5 + 0.2),
            6,
        ),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: stopword hits per language over the
    token bag; winner = max hits, ties broken by alphabetical
    language order (de < en < es < fr) via an explicit CASE chain so
    the SQL oracle reproduces it exactly."""
    toks = ws_token_array(F.col(text_col))
    def _hits(words: list[str]) -> Column:
        return F.size(F.filter(toks, lambda x: x.isin(*words)))

    hits = {lang: _hits(words) for lang, words in STOPWORDS.items()}
    de, en, es, fr = hits["de"], hits["en"], hits["es"], hits["fr"]
    pred = (
        F.when((de >= en) & (de >= es) & (de >= fr), "de")
        .when((en >= es) & (en >= fr), "en")
        .when(es >= fr, "es")
        .otherwise("fr")
    )
    return df.select(
        F.col(id_col),
        de.alias("hits_de"),
        en.alias("hits_en"),
        es.alias("hits_es"),
        fr.alias("hits_fr"),
        pred.alias("pred_lang"),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalization fingerprint: md5 of lowercased,
    whitespace-collapsed, trimmed text — the exact-dedup key that is
    robust to spacing/case noise."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
    )


def bm25_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by BM25 weight —
    keyword extraction / relevance weighting for a text pipeline.

    Deliberately uses the Robertson idf WITHOUT the logarithm:
    ``idf = (N - df + 0.5) / (df + 0.5)``. Every operation is IEEE
    +,*,/ on exactly representable inputs — bit-deterministic across
    engines, unlike ``ln`` whose last ulp is libm-dependent; that is
    what lets the DuckDB oracle hash-match
    (plans/oracle_ext.bm25_top_terms_sql). NOTE this is a
    *rational-idf variant*, not classical log-idf BM25: because idf is
    multiplied by the tf-saturation factor before ranking, dropping
    the log can reorder terms whose saturation factors differ (the
    ranking agrees with log-idf BM25 only when comparing terms with
    equal tf-saturation). Engine and oracle use the identical formula,
    so they always agree with each other.

    N counts ALL documents (empty ones too); avgdl = total tokens / N.
    Scale: one shuffle for tf (id, token); document frequency is a
    map-side-partial ``groupBy("token").count()`` joined back on
    ``token`` — an AQE-splittable shuffle join, NOT a window
    partitioned by ``token`` (a hot token like "the" would force one
    straggler task that AQE cannot split; see BENCHMARKS.md skew
    study). The ``dl`` window over ``id`` is bounded by document
    length and stays. Two one-row aggregates broadcast — no driver
    round trip.
    Output: ``(id, token, tf, score, rank)``, rank by (score desc,
    token asc).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(ws_token_array(F.col(text_col))).alias("token"),
    )
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    tf = tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("id"))
    ).join(dfreq, "token")
    n = df.agg(F.count(F.lit(1)).alias("n"))
    tot = toks.agg(F.count(F.lit(1)).alias("tot"))
    scored = (
        tf.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tot))
        .select(
            "id",
            "token",
            "tf",
            F.round(
                (
                    (F.col("n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(float(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(float(k1))
                    * (
                        F.lit(1.0 - float(b))
                        + F.lit(float(b))
                        * F.col("dl")
                        / (
                            F.col("tot").cast("double")
                            / F.col("n").cast("double")
                        )
                    )
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
    )


def corpus_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    exact: bool = True,
) -> DataFrame:
    """One-row corpus profile: document counts, token totals, and
    doc-length percentiles — the numbers that drive pipeline tuning
    (partition sizing, length-outlier filters, curation thresholds).

    ``exact=True`` uses ``percentile`` — its aggregation state is the
    per-document length list (one long per doc, NOT corpus bytes), so
    it holds to ~1e9 documents; beyond that pass ``exact=False`` for
    the t-digest sketch (``approx_percentile``, bounded state, not
    oracle-comparable). Spark's exact interpolation is bit-identical
    to DuckDB ``quantile_cont`` (verified including the float
    interpolation artifacts).
    Output: ``(n_docs, n_empty_docs, total_tokens, avg_tokens,
    p50_tokens, p90_tokens, p99_tokens, max_tokens)``.
    """
    lens = df.select(F.size(ws_token_array(F.col(text_col))).alias("nt"))
    pct = "approx_percentile" if not exact else "percentile"
    qs = F.expr(f"{pct}(nt, array(0.5D, 0.9D, 0.99D))")
    return lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("nt") == 0).alias("n_empty_docs"),
        F.sum("nt").cast("long").alias("total_tokens"),
        F.round(
            F.sum("nt").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_tokens"),
        F.element_at(qs, 1).alias("p50_tokens"),
        F.element_at(qs, 2).alias("p90_tokens"),
        F.element_at(qs, 3).alias("p99_tokens"),
        F.max("nt").cast("long").alias("max_tokens"),
    )


# Authority (host[:port]) of a URL — group 1; stops at path/query/
# fragment/whitespace. Shared by the stats and the filter so the two
# can never disagree on what "the domain" is.
URL_DOMAIN_PATTERN = r"https?://([^/?# \t\r\n]+)"


def url_domain_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-domain URL statistics over a text corpus — the view that
    drives blocklist/allowlist curation decisions: extract every URL
    (the shared ``PII_PATTERNS`` url regex), parse its authority,
    aggregate occurrences and distinct documents per domain
    (lowercased; ports kept — ``example.com:8080`` is a distinct
    origin on purpose).

    Scale: explode ≈ URL count (scan-shaped), then one groupBy on
    domains with map-side partial aggregation; ``n_docs`` is a
    distinct count implemented as the standard two-phase
    (domain, id)-distinct aggregate. Hot domains (every crawl has a
    youtube.com) are bounded by the partial aggs, not by fanout.
    Output: ``(domain, n_urls, n_docs)``.
    """
    url_pat = next(p for n, p, _ in PII_PATTERNS if n == "url")
    urls = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(url_pat), F.lit(0))
        ).alias("url"),
    )
    dom = F.lower(F.regexp_extract("url", URL_DOMAIN_PATTERN, 1))
    per = urls.select("id", dom.alias("domain")).filter(F.col("domain") != "")
    return per.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct("id").alias("n_docs"),
    )


def filter_blocked_domains(
    df: DataFrame, id_col: str, text_col: str, blocked: list[str]
) -> DataFrame:
    """Drop documents containing a URL whose domain (or a parent
    domain — ``ads.example.com`` matches a blocked ``example.com``)
    is on the blocklist; URL-free documents pass. The curation
    companion to :func:`url_domain_stats`.

    Implemented as a PURE per-row expression (``exists`` over the
    extracted URL array — no join, no shuffle, no corpus-wide
    state), which makes it a zero-cost filter at 100 TB AND directly
    applicable to a streaming ingest unchanged (stream == batch is
    pinned in ``tests/test_streaming.py``). For blocklists too large
    to inline as expressions (millions of domains), pre-broadcast a
    lookup instead; this literal form is for the
    hand-curated-blocklist case."""
    if not blocked:
        return df
    url_pat = next(p for n, p, _ in PII_PATTERNS if n == "url")

    def hit(url: Column) -> Column:
        dom = F.lower(F.regexp_extract(url, URL_DOMAIN_PATTERN, 1))
        cond = None
        for b in [x.lower().lstrip(".") for x in blocked]:
            h = (dom == b) | dom.endswith("." + b)
            cond = h if cond is None else (cond | h)
        return cond

    # NULL text has no URLs → passes (coalesce keeps the predicate
    # non-NULL so the filter can't silently drop the row).
    urls = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(url_pat), F.lit(0)
    )
    return df.filter(~F.exists(urls, hit))


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_doc_frac: float = 0.05,
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """LINE-level boilerplate removal (the CCNet/Dolma-style pass
    document-level dedup can't do): a line whose normalized form
    (trim, lowercase, whitespace-collapse) appears in at least
    ``max(min_docs, ceil(max_doc_frac * n_docs))`` DISTINCT documents
    is dropped from every document — navigation chrome, cookie
    banners, license footers. Blank lines are never counted or
    dropped (they carry formatting, not content). Documents keep
    their row even if every line drops (``clean_text = ''``).
    ``sep`` sets the unit: the default newline gives line-level
    removal; pass ``"\\n\\n"`` for PARAGRAPH-level removal (the
    other granularity real pipelines run; oracle twin takes the
    matching ``sep_sql``).

    Scale shape: explode lines → distinct (fingerprint, doc) count
    (two-phase agg; state bounded by distinct line-doc pairs) →
    fingerprint equi-join back → per-doc ordered reassembly
    (``array_sort`` on collected (pos, line) structs — one groupBy).
    The corpus-size scalar rides a 1-row broadcast crossJoin (the
    bm25 pattern — declarative, no driver collect).
    Output: ``(id, clean_text, n_lines, n_dropped)``.
    """
    if not (0.0 < float(max_doc_frac) <= 1.0):
        raise ValueError("max_doc_frac must be in (0, 1]")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("line")), r"[ \t\r]+", " ")
    )
    lines = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.split(
                    F.coalesce(F.col(text_col), F.lit("")),
                    re.escape(sep),  # literal separator, not a regex
                    -1,
                )
            ).alias("pos", "line"),
        )
        .withColumn("nrm", norm)
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    # doc frequency per normalized non-blank line
    line_df = (
        lines.filter(F.col("nrm") != "")
        .select("nrm", "id")
        .distinct()
        .groupBy("nrm")
        .agg(F.count(F.lit(1)).alias("line_docs"))
    )
    thresh = F.greatest(
        F.lit(int(min_docs)).cast("long"),
        F.ceil(F.col("n_docs").cast("double") * F.lit(float(max_doc_frac)))
        .cast("long"),
    )
    flagged = (
        line_df.crossJoin(F.broadcast(n_docs))
        .filter(F.col("line_docs") >= thresh)
        .select("nrm", F.lit(True).alias("is_boiler"))
    )
    kept = (
        lines.join(flagged, "nrm", "left")
        .withColumn("drop", F.coalesce(F.col("is_boiler"), F.lit(False)))
    )
    agg = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("drop"), 1).otherwise(0))
        .cast("long").alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("drop"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
    )
    return agg.select("id", "clean_text", "n_lines", "n_dropped")


def packing_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    context_len: int = 2048,
    bucket_width: int = 64,
    token_count_col: str | None = None,
) -> DataFrame:
    """Sequence-packing yield estimate — the number a pipeline
    planner actually asks for ("how many ``context_len``-token
    sequences does this corpus pack into, at what fill rate?").

    Exact greedy packing is inherently sequential (bin packing over a
    total order) — driver-hostile at corpus scale. This is the
    scalable bucketed approximation: round each document's token
    count UP to a ``bucket_width`` boundary (docs longer than
    ``context_len`` are truncated to exactly one full sequence —
    standard pretraining behavior), then pack each bucket
    independently: a bucket of length-``b`` slots fits
    ``floor(context_len / b)`` documents per sequence. Rounding up
    and never packing across buckets makes the estimate CONSERVATIVE
    (real greedy packing can only do better by mixing lengths).

    All integer arithmetic except the fill ratios (rounded to 6) —
    bit-reproducible in the DuckDB oracle
    (``plans.oracle_ext.packing_stats_sql``). Empty documents (0
    tokens) are excluded (nothing to pack). One shuffle: a
    ``groupBy`` on O(context_len / bucket_width) bucket keys with
    map-side partial aggregation — hot keys impossible at any corpus
    size because the key space is tiny and the agg is commutative.

    Output, one row per occupied bucket:
    ``(bucket_len, n_docs, sum_tokens, docs_per_seq, n_sequences,
    fill_ratio)`` where ``fill_ratio = sum_tokens /
    (n_sequences * context_len)``.
    """
    context_len, bucket_width = int(context_len), int(bucket_width)
    if context_len <= 0 or bucket_width <= 0:
        raise ValueError("context_len and bucket_width must be positive")
    if bucket_width > context_len:
        raise ValueError("bucket_width must be <= context_len")
    # token_count_col swaps the budget unit (e.g. BPE subword counts
    # from functions.bpe.with_bpe_token_counts) without touching the
    # packing model itself.
    nt = (
        F.col(token_count_col)
        if token_count_col is not None
        else F.size(ws_token_array(F.col(text_col)))
    )
    nt_eff = F.least(nt, F.lit(context_len))
    bucket = F.least(
        F.ceil(nt_eff.cast("double") / F.lit(float(bucket_width))).cast("long")
        * F.lit(bucket_width),
        F.lit(context_len).cast("long"),
    )
    per_doc = df.select(
        nt_eff.cast("long").alias("nt"), bucket.alias("bucket_len")
    ).filter(F.col("nt") > 0)
    agg = per_doc.groupBy("bucket_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("long").alias("sum_tokens"),
    )
    docs_per_seq = F.floor(
        F.lit(float(context_len)) / F.col("bucket_len").cast("double")
    ).cast("long")
    n_seqs = F.ceil(
        F.col("n_docs").cast("double") / docs_per_seq.cast("double")
    ).cast("long")
    return agg.select(
        "bucket_len",
        "n_docs",
        "sum_tokens",
        docs_per_seq.alias("docs_per_seq"),
        n_seqs.alias("n_sequences"),
        F.round(
            F.col("sum_tokens").cast("double")
            / (n_seqs.cast("double") * F.lit(float(context_len))),
            6,
        ).alias("fill_ratio"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    context_len: int = 2048,
    bucket_width: int = 64,
    seed: int = 42,
) -> DataFrame:
    """The ASSIGNMENT companion to :func:`packing_stats`: give every
    document a concrete ``(seq_id, slot)`` under the same bucketed
    packing model — what a training-data writer actually materializes.
    Documents are bucketed by rounded-up length (long docs truncate to
    one full sequence), deterministically ordered within their bucket
    by the stable md5 uniform (id tie-break — reshuffle-the-corpus
    determinism, the :func:`..sources.deterministic_shuffle` salt
    machinery), and dealt ``docs_per_seq`` at a time into sequences.
    Sequence ids are globally dense: buckets are laid out in
    ascending ``bucket_len`` order, each bucket's base id = cumulative
    sequence count of all smaller buckets (a window over the tiny
    per-bucket aggregate — O(context/width) rows — broadcast back).

    Output: ``(id, bucket_len, seq_id, slot)`` where ``slot`` is the
    document's position within its sequence. Empty documents are
    excluded (nothing to pack). Invariants (test-pinned): every seq
    holds <= docs_per_seq docs of its bucket; seq_ids are dense
    0..n_sequences-1; the assignment is a pure function of
    (corpus ids, seed).

    Scale: one shuffle to rank within buckets (partitionBy bucket —
    at most context_len/bucket_width partitions, each holding that
    bucket's doc ids only), one broadcast join of the per-bucket
    bases. The window state per bucket is row-number only.
    """
    from ..sources import _stable_u

    context_len, bucket_width = int(context_len), int(bucket_width)
    if context_len <= 0 or bucket_width <= 0:
        raise ValueError("context_len and bucket_width must be positive")
    if bucket_width > context_len:
        raise ValueError("bucket_width must be <= context_len")
    nt = F.size(ws_token_array(F.col(text_col)))
    nt_eff = F.least(nt, F.lit(context_len))
    bucket = F.least(
        F.ceil(nt_eff.cast("double") / F.lit(float(bucket_width))).cast("long")
        * F.lit(bucket_width),
        F.lit(context_len).cast("long"),
    )
    per_doc = df.select(
        F.col(id_col).alias("id"),
        nt_eff.cast("long").alias("nt"),
        bucket.alias("bucket_len"),
    ).filter(F.col("nt") > 0)
    dps = F.floor(
        F.lit(float(context_len)) / F.col("bucket_len").cast("double")
    ).cast("long")
    w = Window.partitionBy("bucket_len").orderBy(
        _stable_u(F.col("id"), str(int(seed))), F.col("id")
    )
    ranked = per_doc.withColumn("rk", F.row_number().over(w) - 1).select(
        "id", "bucket_len",
        (F.col("rk") % dps).alias("slot"),
        F.floor(F.col("rk") / dps).cast("long").alias("seq_in_bucket"),
    )
    counts = ranked.groupBy("bucket_len").agg(
        (F.max("seq_in_bucket") + 1).alias("n_seqs")
    )
    base_w = Window.orderBy("bucket_len").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = counts.select(
        "bucket_len",
        F.coalesce(F.sum("n_seqs").over(base_w), F.lit(0)).alias("base"),
    )
    return (
        ranked.join(F.broadcast(bases), "bucket_len")
        .select(
            "id",
            "bucket_len",
            (F.col("base") + F.col("seq_in_bucket")).cast("long").alias(
                "seq_id"
            ),
            F.col("slot").cast("long").alias("slot"),
        )
    )


# PII patterns — Java-regex AND RE2 compatible (no lookaround, no \b;
# non-capturing groups and bounded repeats are fine in both), so the
# SAME strings drive Spark regexp_replace/extract_all and the DuckDB
# oracle. Redaction order is URL → email → IP → phone: an email can
# sit inside a URL (credited to the URL), an IP inside a URL or an
# email's domain (credited upstream), and the placeholder tokens
# contain no digits so later patterns on the already-redacted text
# cannot double-count.
#
# The phone pattern requires FORMAT, not just digit mass (the round-4
# pattern redacted any 8+ digit run — timestamps, order ids, ISBNs):
#   +15551234567            international, bare: + and 7-15 digits
#   +1 555-123-4567         international, separated: +cc then 3
#                           groups of 2-4 digits
#   (555) 123-4567          parenthesized US
#   555-123-4567            US 3-3-4 with separators
#   0800 111 222            4-3-3 with separators
# Deliberately NOT matched: bare digit runs without '+' ("123456789",
# ids/timestamps), date-shaped 4-2-2 runs ("2026-08-14"), ISBNs
# (group shapes differ). IPv4 is the standard scrubbing target;
# dotted version strings ("1.2.3.4") are accepted false positives.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^ \t\r\n]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    (
        "phone",
        r"\+[0-9]{7,15}"
        r"|\+[0-9]{1,3}[ -][0-9]{2,4}(?:[ -]?[0-9]{2,4}){2}"
        r"|\([0-9]{3}\)[ -]?[0-9]{3}[ -]?[0-9]{4}"
        r"|[0-9]{3}[ -][0-9]{3}[ -][0-9]{4}"
        r"|[0-9]{4}[ -][0-9]{3}[ -][0-9]{3}",
        "<PHONE>",
    ),
]


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrubbing for a pre-training corpus: URLs, emails, IPv4
    addresses, and format-shaped phone numbers replaced by
    placeholder tokens, with per-document match counts — pure column
    expressions (JVM regex, whole-stage codegen; a 100 TB scan-shaped
    stage, no shuffle). See ``PII_PATTERNS`` for exactly what the
    phone pattern does and does not match (format required — bare
    digit runs/ids/timestamps survive).

    Counts are taken progressively on the text as redacted so far
    (URL matches first claim their span), so ``n_*`` partition the
    redacted spans rather than double-counting an email inside a URL.
    Output: ``(id, clean_text, n_urls, n_emails, n_ips, n_phones)``.
    """
    stage = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(stage, F.lit(pat), F.lit(0)))
            .alias(f"n_{name}s")
        )
        stage = F.regexp_replace(stage, pat, repl)
    return df.select(
        F.col(id_col).alias("id"),
        stage.alias("clean_text"),
        *counts,
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher/Dolma-style repetition signals per document — the
    quality filters that catch boilerplate and degenerate generations
    which length/punctuation stats miss:

    - ``dup_token_ratio``: 1 − |set(tokens)| / |tokens| — fraction of
      token occurrences that repeat an earlier token;
    - ``top_token_frac``: occurrences of the most frequent token /
      total tokens (Gopher's "fraction in most common word"; ties are
      count-only, no tie-break needed);
    - ``dup_bigram_ratio``: fraction of adjacent-bigram occurrences
      whose bigram appears more than once (degenerate loops repeat
      n-grams even when individual words vary).

    Scale: explode → ``groupBy(id, token)`` count → ``groupBy(id)``
    roll-up (map-side partial aggs; partitions bounded by doc length,
    never by corpus-wide token frequency — the per-DOC grouping cannot
    have a hot key the way per-TOKEN grouping can). Deliberately NOT
    the per-row ``transform × filter`` array form, which is O(len²)
    per document and melts on long documents. Empty docs emit 0
    ratios; one-token docs have no bigrams (0). Rounded to 6 on
    double arithmetic — oracle-reproducible
    (``plans.oracle_ext.repetition_stats_sql``).
    Output: ``(id, n_tokens, dup_token_ratio, top_token_frac,
    dup_bigram_ratio)``.
    """
    toks = ws_token_array(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    tok_rows = base.select("id", F.explode("toks").alias("t"))
    tok_agg = (
        tok_rows.groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("uniq"),
            F.max("c").alias("top"),
        )
    )
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big_agg = (
        base.select("id", F.explode(bigrams).alias("b"))
        .groupBy("id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(
            F.sum("c").alias("nb"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "dupb"
            ),
        )
    )
    z = F.lit(0.0)
    return (
        base.select("id")
        .join(tok_agg, "id", "left")
        .join(big_agg, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n"), F.lit(0)).cast("int").alias("n_tokens"),
            F.when(
                F.col("n") > 0,
                F.round(
                    F.lit(1.0)
                    - F.col("uniq").cast("double") / F.col("n").cast("double"),
                    6,
                ),
            ).otherwise(z).alias("dup_token_ratio"),
            F.when(
                F.col("n") > 0,
                F.round(
                    F.col("top").cast("double") / F.col("n").cast("double"), 6
                ),
            ).otherwise(z).alias("top_token_frac"),
            F.when(
                F.col("nb") > 0,
                F.round(
                    F.col("dupb").cast("double") / F.col("nb").cast("double"),
                    6,
                ),
            ).otherwise(z).alias("dup_bigram_ratio"),
        )
    )


def token_rarity_stats(
    df: DataFrame, id_col: str, text_col: str, rare_max: int = 2
) -> DataFrame:
    """Corpus-relative token-frequency signals per document — the
    perplexity-proxy quality axis the doc-local stats can't see:
    a document whose tokens are corpus-rare is likely OCR noise /
    gibberish / code in a prose corpus, while one of only
    corpus-saturated tokens is boilerplate.

    - ``n_tokens``: whitespace-bag token occurrences (0 for empty
      docs; the frequency fields are then NULL);
    - ``min_cf``: collection frequency (corpus-wide occurrence
      count) of the document's rarest token;
    - ``mean_cf``: average collection frequency over the document's
      token OCCURRENCES — sum of exact integer counts in one double
      division, so it is order-independent and hash-stable, unlike
      an ``ln``-based log-prob whose last ulp is libm-dependent (the
      same determinism trade as bm25_top_terms' rational idf;
      geometric-mean perplexity over this signal is a monotone
      reader-side transform);
    - ``rare_ratio``: fraction of token occurrences whose collection
      frequency is <= ``rare_max``.

    Scale: one (id, token)-narrow explode; collection frequencies
    via map-side-partial ``groupBy(token)`` joined back on ``token``
    (AQE-splittable shuffle join — hot tokens don't straggle, see
    bm25_top_terms); per-doc rollup is a partial-agg groupBy(id).
    Empty docs rejoin via a broadcast-friendly left join on id.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(ws_token_array(F.col(text_col))).alias("token"),
    )
    cf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
    per = (
        toks.join(cf, "token")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("cf").alias("sum_cf"),
            F.min("cf").alias("min_cf"),
            F.sum(
                F.when(F.col("cf") <= F.lit(int(rare_max)), 1).otherwise(0)
            ).alias("n_rare"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_tok"), F.lit(0)).cast("int").alias("n_tokens"),
            F.col("min_cf").cast("int").alias("min_cf"),
            F.round(
                F.col("sum_cf").cast("double")
                / F.col("n_tok").cast("double"),
                6,
            ).alias("mean_cf"),
            F.round(
                F.col("n_rare").cast("double")
                / F.col("n_tok").cast("double"),
                6,
            ).alias("rare_ratio"),
        )
    )


def ngram_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide word ``n``-gram counts — the n-gram-LM / KenLM
    preparation primitive (and the corpus-inspection "what does this
    corpus repeat" view; ``min_count`` is the standard count-pruning
    knob). Documents shorter than ``n`` tokens contribute nothing;
    n-grams never cross document boundaries.

    Output: ``(ngram, n_count)`` — the n-gram as a space-joined
    string.

    Scale: one explode of (docs x positions) narrow rows into a
    map-side-partial groupBy; hot n-grams partial-aggregate before
    the shuffle, so skew is bounded by distinct-gram cardinality per
    partition, not occurrence counts.
    """
    out = (
        ngram_explode(df, id_col, text_col, n)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_count"))
    )
    if min_count > 1:
        out = out.filter(F.col("n_count") >= int(min_count))
    return out


def ngram_explode(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """One ``(ngram)`` row per word-``n``-gram OCCURRENCE (space-
    joined string; n-grams never cross document boundaries) — the
    shared pre-aggregation frame of :func:`ngram_counts` and the
    sketch-based heavy-hitter path (operators/sketch.py)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from ..tokenizers import _ensure_parallelism

    # shingling parallelism equals the scan's split count; rebalance
    # compacted single-split corpora first (no-op on real layouts)
    df = _ensure_parallelism(df.select(id_col, text_col))
    toks = ws_token_array(F.col(text_col))
    shingles = F.when(
        F.size(toks) - F.lit(n - 1) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.explode(shingles).alias("ngram"))


def lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    k: float = 1.0,
    smoothing: str = "add_k",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document mean n-gram log-probability under an add-``k``
    smoothed LM trained on the corpus itself — the classic
    perplexity-style quality signal (CCNet / Gopher-style filtering
    ranks documents by LM score and drops the tail). Builds directly
    on :func:`ngram_counts`: the corpus supplies both the n-gram and
    the (n-1)-gram context tables, plus the unigram vocabulary size
    for the smoothing denominator.

    For each in-document n-gram at position i (default ``add_k``;
    see :func:`train_ngram_lm` for ``smoothing="stupid_backoff"``)::

        logp_i = ln((c_n(gram_i) + k) / (c_{n-1}(ctx_i) + k * V))

    Output: ``(doc_id, n_ngrams, lm_logp)`` — one row per input
    document; ``lm_logp`` is the mean logp rounded to 6 dp (repeated
    gibberish scores high under its own counts, rare-junk scores low),
    NULL for documents shorter than ``n`` tokens.

    Scale: the count tables are corpus-sized, so scoring is two
    string-keyed shuffle equi-joins (never a broadcast of the LM) and
    one map-side-partial groupBy; skew on stopword contexts is an
    AQE-splittable join, not a hot aggregation. The vocabulary size is
    attached as a broadcast 1-row scalar — no driver collect.
    """
    return lm_score_apply(
        train_ngram_lm(df, id_col, text_col, n=n, k=k,
                       smoothing=smoothing, alpha=alpha),
        df, id_col, text_col,
    )


class NgramLM:
    """A trained add-k n-gram LM: the corpus count tables plus the
    vocabulary-size scalar, reusable across many scoring calls (the
    streaming wrapper trains once, scores every micro-batch).

    ``persist=True`` caches all three tables (MEMORY_AND_DISK) —
    call :meth:`unpersist` when done."""

    def __init__(self, grams: DataFrame, ctxs: DataFrame,
                 vocab: DataFrame, n: int, k: float,
                 persist: bool = False, smoothing: str = "add_k",
                 alpha: float = 0.4) -> None:
        self.grams, self.ctxs, self.vocab = grams, ctxs, vocab
        self.n, self.k = int(n), float(k)
        self.smoothing, self.alpha = smoothing, float(alpha)
        self._persisted = bool(persist)
        if persist:
            from pyspark import StorageLevel

            for t in (grams, ctxs, vocab):
                t.persist(StorageLevel.MEMORY_AND_DISK)

    def unpersist(self) -> None:
        if self._persisted:
            for t in (self.grams, self.ctxs, self.vocab):
                t.unpersist()
            self._persisted = False


def train_ngram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    k: float = 1.0,
    persist: bool = False,
    smoothing: str = "add_k",
    alpha: float = 0.4,
) -> NgramLM:
    """Build the :class:`NgramLM` tables from a reference corpus:
    n-gram counts, (n-1)-gram context counts (:func:`ngram_counts`
    twice) and the distinct-unigram vocabulary size + total token
    count.

    ``smoothing``: ``"add_k"`` (default) or ``"stupid_backoff"``
    (Brants et al. 2007, the smoothing built FOR massive distributed
    LMs — no discounting to renormalize, so counts compose across
    partitions): score ``c(gram)/c(ctx)`` when the n-gram was seen,
    else back off to ``alpha * (c(w)+1)/(N+V)`` — the final unigram
    level is add-1-floored so out-of-corpus words stay finite.
    Stupid backoff is implemented for bigrams (``n=2``), where the
    context table doubles as the unigram backoff table."""
    if n < 2:
        raise ValueError(f"ngram LM needs n >= 2, got {n}")
    if smoothing not in ("add_k", "stupid_backoff"):
        raise ValueError(f"unknown smoothing {smoothing!r}")
    if smoothing == "stupid_backoff" and n != 2:
        raise ValueError("stupid_backoff is implemented for n=2 only")
    from ..tokenizers import _ensure_parallelism

    grams = ngram_counts(df, id_col, text_col, n=n)
    ctxs = ngram_counts(df, id_col, text_col, n=n - 1)
    if n == 2:
        # For a bigram LM the context table IS the unigram table:
        # its row count is the distinct-token vocabulary and the sum
        # of its counts the total token count — derive the smoothing
        # scalar from it instead of a THIRD full tokenize+explode
        # corpus pass (round 11; the n=1 ngram_explode emits each
        # token verbatim, so the two folds count the same multiset).
        vocab = ctxs.agg(
            F.count(F.lit(1)).alias("vocab"),
            # coalesce: sum() over an empty corpus is NULL where the
            # old explode-count was 0
            F.coalesce(F.sum("n_count"), F.lit(0)).alias("total"),
        )
    else:
        docs = _ensure_parallelism(df.select(id_col, text_col))
        vocab = (
            docs.select(
                F.explode(ws_token_array(F.col(text_col))).alias("tok")
            )
            .agg(
                F.count_distinct("tok").alias("vocab"),
                F.count(F.lit(1)).alias("total"),
            )
        )
    return NgramLM(grams, ctxs, vocab, n, k, persist=persist,
                   smoothing=smoothing, alpha=alpha)


def lm_score_apply(
    lm: NgramLM,
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Score ``df``'s documents under an already-trained
    :class:`NgramLM` (same output contract as :func:`lm_score`; the
    scored documents need not be the training corpus — held-out
    scoring and the per-micro-batch streaming path both land here)."""
    from ..tokenizers import _ensure_parallelism

    n, kk = lm.n, lm.k
    grams, ctxs, vocab = lm.grams, lm.ctxs, lm.vocab
    docs = _ensure_parallelism(df.select(id_col, text_col))
    toks = ws_token_array(F.col(text_col))

    positions = F.when(
        F.size(toks) - F.lit(n - 1) >= 1,
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.explode(positions).alias("i"),
    ).select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), F.lit(n))).alias(
            "gram"
        ),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("i"), F.lit(n - 1))
        ).alias("ctx"),
        F.element_at(F.col("toks"), F.col("i") + F.lit(n - 1)).alias("w"),
    )

    counted = (
        exploded.join(grams, exploded["gram"] == grams["ngram"], "left")
        .drop("ngram")
        .withColumnRenamed("n_count", "gram_count")
        .join(ctxs, exploded["ctx"] == ctxs["ngram"], "left")
        .drop("ngram")
        .withColumnRenamed("n_count", "ctx_count")
    )
    if lm.smoothing == "stupid_backoff":
        # unigram backoff lookup for the word itself; for n=2 the
        # context table IS the unigram table (fresh exprIds via the
        # aliasing select, so the second join is unambiguous)
        unis = ctxs.select(
            F.col("ngram").alias("w_gram"), F.col("n_count").alias("w_count")
        )
        counted = counted.join(
            unis, counted["w"] == unis["w_gram"], "left"
        ).drop("w_gram")
        logp = F.when(
            F.col("gram_count").isNotNull(),
            F.log(
                F.col("gram_count").cast("double")
                / F.col("ctx_count").cast("double")
            ),
        ).otherwise(
            F.log(
                F.lit(lm.alpha)
                * (F.coalesce(F.col("w_count"), F.lit(0)).cast("double")
                   + F.lit(1.0))
                / (F.col("total").cast("double")
                   + F.col("vocab").cast("double"))
            )
        )
    else:
        logp = F.log(
            (F.coalesce(F.col("gram_count"), F.lit(0)).cast("double")
             + F.lit(kk))
            / (F.coalesce(F.col("ctx_count"), F.lit(0)).cast("double")
               + F.lit(kk) * F.col("vocab").cast("double"))
        )

    scored = (
        counted.crossJoin(F.broadcast(vocab))
        .select("doc_id", logp.alias("logp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.round(F.avg("logp"), 6).alias("lm_logp"),
        )
    )

    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_ngrams"), F.lit(0)).alias("n_ngrams"),
            F.col("lm_logp"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    k: float = 1.0,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document under the corpus LM (:func:`lm_score`) and label
    the best-scoring third ``head``, the next ``middle``, the rest
    ``tail`` — the standard quality-tiering step before sampling
    training data by tier. Documents too short to produce an n-gram
    are labeled ``unscored``.

    Output: ``(doc_id, n_ngrams, lm_logp, bucket)``.

    Scale: the two tertile cutoffs are ONE exact-percentile aggregate
    attached back as a broadcast 1-row scalar — no global sort, no
    ntile window over a single partition; bucketing itself is a
    column expression. The scored frame (one narrow row per doc) is
    ``localCheckpoint``-ed before the cutoff aggregate so the whole
    LM train+score subtree — with its own vocab scalar attach — runs
    ONCE instead of once per consumer (round 7; previously the plan
    carried 6 scalar BNLJ attaches, now 1).

    .. note:: the ``localCheckpoint`` makes THIS CALL EAGER: the full
       LM train+score job fires when the frame is built, not when it
       is first consumed, and the checkpointed blocks stay persisted
       until the returned frame's RDD is garbage-collected. Call it
       when you intend to execute the result — don't build the frame
       speculatively. This is the deliberate trade for collapsing the
       6 scalar-attach broadcasts to 1 (round-7 advisor, adjudicated
       acceptable).
    """
    scored = lm_score(df, id_col, text_col, n=n, k=k).localCheckpoint()
    cuts = scored.filter(F.col("lm_logp").isNotNull()).agg(
        F.percentile("lm_logp", 2.0 / 3.0).alias("c_head"),
        F.percentile("lm_logp", 1.0 / 3.0).alias("c_mid"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_ngrams",
        "lm_logp",
        F.when(F.col("lm_logp").isNull(), F.lit("unscored"))
        .when(F.col("lm_logp") >= F.col("c_head"), F.lit("head"))
        .when(F.col("lm_logp") >= F.col("c_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def dsir_weights(
    target_df: DataFrame,
    source_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    k: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    SOURCE document under an n-gram LM of the TARGET distribution and
    one of the source distribution; the per-token log-ratio
    ``logw = logp_target - logp_source`` is the importance weight the
    paper Gumbel-top-k samples on (positive = looks more like the
    target than like typical source text). Mean-per-ngram log-probs
    (:func:`lm_score`'s contract) make the ratio length-normalized.

    Output: ``(doc_id, n_ngrams, logp_target, logp_source, logw)``;
    documents too short to score carry NULLs.

    Scale: two :func:`train_ngram_lm` count-table pairs (map-side-
    partial groupBys), but ONE shared explode-and-score pass (round
    7): the per-position (gram, ctx) table is identical for both
    scorings, so the source corpus is tokenized/exploded once, joined
    against both LMs' count tables (four narrow equi-joins), and both
    vocab scalars ride a SINGLE broadcast 1-row attach — previously
    two independent scoring pipelines exploded the corpus twice,
    attached two scalars, and re-joined on doc id (4 BNLJ rounds, now
    1 against the wide side).
    """
    from ..tokenizers import _ensure_parallelism

    lm_t = train_ngram_lm(target_df, id_col, text_col, n=n, k=k)
    lm_s = train_ngram_lm(source_df, id_col, text_col, n=n, k=k)
    kk = float(k)

    docs = _ensure_parallelism(source_df.select(id_col, text_col))
    toks = ws_token_array(F.col(text_col))
    positions = F.when(
        F.size(toks) - F.lit(n - 1) >= 1,
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.explode(positions).alias("i"),
    ).select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), F.lit(n))).alias(
            "gram"
        ),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("i"), F.lit(n - 1))
        ).alias("ctx"),
    )

    def _renamed(tbl: DataFrame, key: str, cnt: str) -> DataFrame:
        return tbl.select(
            F.col("ngram").alias(key), F.col("n_count").alias(cnt)
        )

    counted = (
        exploded.join(
            _renamed(lm_t.grams, "tg", "t_gram_count"),
            exploded["gram"] == F.col("tg"), "left",
        ).drop("tg")
        .join(
            _renamed(lm_t.ctxs, "tc", "t_ctx_count"),
            F.col("ctx") == F.col("tc"), "left",
        ).drop("tc")
        .join(
            _renamed(lm_s.grams, "sg", "s_gram_count"),
            F.col("gram") == F.col("sg"), "left",
        ).drop("sg")
        .join(
            _renamed(lm_s.ctxs, "sc", "s_ctx_count"),
            F.col("ctx") == F.col("sc"), "left",
        ).drop("sc")
    )
    scalars = lm_t.vocab.select(
        F.col("vocab").alias("t_vocab")
    ).crossJoin(lm_s.vocab.select(F.col("vocab").alias("s_vocab")))

    def _logp(gram_c: str, ctx_c: str, vocab_c: str):
        return F.log(
            (F.coalesce(F.col(gram_c), F.lit(0)).cast("double") + F.lit(kk))
            / (
                F.coalesce(F.col(ctx_c), F.lit(0)).cast("double")
                + F.lit(kk) * F.col(vocab_c).cast("double")
            )
        )

    scored = (
        counted.crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            _logp("t_gram_count", "t_ctx_count", "t_vocab").alias("lpt"),
            _logp("s_gram_count", "s_ctx_count", "s_vocab").alias("lps"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.round(F.avg("lpt"), 6).alias("logp_target"),
            F.round(F.avg("lps"), 6).alias("logp_source"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_ngrams"), F.lit(0)).alias("n_ngrams"),
            "logp_target",
            "logp_source",
            F.round(
                F.col("logp_target") - F.col("logp_source"), 6
            ).alias("logw"),
        )
    )


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, Appendix
    A: "MassiveWeb" filters), one boolean column per rule plus the
    conjunction — the industry-standard pre-training heuristic gate,
    kept as named rules (not a composite score) so a pipeline can
    audit WHICH rule drops each document.

    Rules: word count in [min_words, max_words]; mean word length in
    [3, 10]; '#'/'...' symbol-to-word ratio <= 0.1; <= 90% of lines
    start with a bullet ('-', '*', '•'); <= 30% of lines end
    with an ellipsis; >= 80% of words contain a letter; >= 2 distinct
    hits from the required-stopword list (the, be, to, of, and, that,
    have, with).

    Output: ``(doc_id, n_words, mean_word_len, symbol_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stop_hits,
    pass_words, pass_mean_len, pass_symbols, pass_bullets,
    pass_ellipsis, pass_alpha, pass_stops, passes)``.

    Scale: pure column expressions over one scan — whole-stage
    codegen, no shuffle, no UDF.
    """
    t = F.col(text_col)
    toks = ws_token_array(t)
    n_words = F.size(toks)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = F.round(
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).cast("double")
        / nw,
        6,
    )
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_ellipsis = F.floor(
        (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / 3
    )
    symbol_ratio = F.round((n_hash + n_ellipsis).cast("double") / nw, 6)
    lines = F.split(t, "\n", -1)
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda x: F.ltrim(x).startswith("-")
                | F.ltrim(x).startswith("*")
                | F.ltrim(x).startswith("•"),
            )
        ).cast("double")
        / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(
            F.filter(lines, lambda x: F.rtrim(x).endswith("..."))
        ).cast("double")
        / n_lines,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double")
        / nw,
        6,
    )
    required = ["the", "be", "to", "of", "and", "that", "have", "with"]
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in required]),
            lambda w: F.array_contains(toks, w),
        )
    )
    out = df.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    return out.select(
        "*",
        (
            (F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
        ).alias("pass_words"),
        (
            (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len)
        ).alias("pass_mean_len"),
        (F.col("symbol_ratio") <= max_symbol_ratio).alias("pass_symbols"),
        (F.col("bullet_line_frac") <= max_bullet_line_frac).alias(
            "pass_bullets"
        ),
        (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac).alias(
            "pass_ellipsis"
        ),
        (F.col("alpha_word_frac") >= min_alpha_word_frac).alias("pass_alpha"),
        (F.col("stop_hits") >= min_stop_hits).alias("pass_stops"),
    ).withColumn(
        "passes",
        F.col("pass_words")
        & F.col("pass_mean_len")
        & F.col("pass_symbols")
        & F.col("pass_bullets")
        & F.col("pass_ellipsis")
        & F.col("pass_alpha")
        & F.col("pass_stops"),
    )


def c4_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020, §2.2 — the
    filters that produced the Colossal Clean Crawled Corpus), the
    other canonical rule set next to :func:`gopher_rules`. Line
    level: keep only lines that end in a terminal punctuation mark
    (``. ! ? "``), contain at least ``min_line_words`` whitespace
    words, and do not contain the word "javascript" (the enable-JS
    boilerplate tell). Page level: flag any page containing
    "lorem ipsum" (placeholder text) or a curly brace (code), and
    require at least ``min_sentences`` sentences in the CLEANED text
    (terminal-punctuation runs as the sentence proxy — C4 used a
    sentence splitter; the run count is the deterministic,
    oracle-exact stand-in). C4's three-sentence-span corpus dedup is
    the separate :func:`~..operators.dedup.duplicated_spans` /
    ``remove_boilerplate_lines`` family.

    Kept as named audit columns plus the ``passes`` conjunction, the
    same contract as ``gopher_rules``. Scale: pure array/column
    expressions over one scan — whole-stage codegen, no shuffle, no
    UDF, no explode (the line filter is a per-row lambda).

    Output: ``(doc_id, n_lines, n_kept_lines, clean_text,
    n_sentences, has_lorem_ipsum, has_curly_brace, pass_sentences,
    passes)``.
    """
    mlw = int(min_line_words)
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n", -1)

    def line_ok(x):
        words = F.size(
            F.filter(
                F.split(F.trim(x), "[ \t]+", -1),
                lambda w: w != F.lit(""),
            )
        )
        ends_ok = F.rtrim(x).rlike('[.!?"]$')
        no_js = ~F.lower(x).rlike(r"\bjavascript\b")
        return ends_ok & (words >= F.lit(mlw)) & no_js

    kept = F.filter(lines, line_ok)
    clean = F.array_join(kept, "\n")
    n_sentences = F.size(
        F.regexp_extract_all(clean, F.lit("[.!?]+"), F.lit(0))
    )
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    pass_sent = n_sentences >= F.lit(int(min_sentences))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        clean.alias("clean_text"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_curly_brace"),
        pass_sent.alias("pass_sentences"),
        (pass_sent & ~has_lorem & ~has_brace).alias("passes"),
    )


def build_vocab(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 1000
) -> DataFrame:
    """Top-``top_k`` corpus vocabulary by occurrence count with
    cumulative-coverage fractions — the tokenizer-prep / stopword-
    discovery view (rank 1 = most frequent; ``cum_frac`` answers
    "how much of the corpus do the first r words cover"). Rank order
    is the total order (count DESC, token ASC), so the result is
    unique and engine-independent.

    Scale design: the naive ``row_number() over (order by count
    desc)`` is an Exchange SinglePartition over the whole vocabulary
    — the 100 TB killer this repo bans. Instead the global rank is
    two-level, exploiting that the sort's MAJOR key is the count
    itself: partition by ``(count, first-char)`` (an order-aligned
    coarsening of the global order), rank locally by token, and add
    dense offsets from the tiny per-group aggregate (ordered by the
    same keys, cumulative-summed, broadcast back). Within a group the
    count is CONSTANT, so the local cumulative occurrence sum is just
    ``rn * count`` — no second window over rows. The Zipf head (one
    token per group) and tail (count=1 spread over first-char groups)
    both stay parallel. The corpus total rides a 1-row broadcast
    crossJoin (the bm25 pattern). Output:
    ``(vocab_rank, token, n_occ, n_docs, cum_frac)``.
    """
    k = int(top_k)
    if k < 1:
        raise ValueError("top_k must be >= 1")
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(ws_token_array(F.col(text_col))).alias("token"),
    )
    counts = ex.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.count_distinct("id").alias("n_docs"),
    )
    total = counts.agg(F.sum("n_occ").alias("__total"))
    tagged = counts.withColumn("__pfx", F.substring("token", 1, 1))
    local_w = Window.partitionBy("n_occ", "__pfx").orderBy("token")
    ranked = tagged.withColumn("__rn", F.row_number().over(local_w))
    # __g_sum computed INSIDE the aggregate (sum of the constant
    # grouping key == rows * count) so the offset window's
    # SinglePartition exchange is fed directly by the Aggregate —
    # the structurally-benign shape (aggregate rows, never corpus
    # rows; see tools/explain_audit.py)
    groups = tagged.groupBy("n_occ", "__pfx").agg(
        F.count(F.lit(1)).alias("__g_rows"),
        F.sum("n_occ").alias("__g_sum"),
    )
    base_w = Window.orderBy(
        F.col("n_occ").desc(), F.col("__pfx").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    bases = groups.select(
        "n_occ",
        "__pfx",
        F.coalesce(F.sum("__g_rows").over(base_w), F.lit(0)).alias(
            "__base_rank"
        ),
        F.coalesce(F.sum("__g_sum").over(base_w), F.lit(0)).alias(
            "__base_cum"
        ),
    )
    out = (
        ranked.join(F.broadcast(bases), ["n_occ", "__pfx"])
        .withColumn(
            "vocab_rank",
            (F.col("__base_rank") + F.col("__rn")).cast("int"),
        )
        .filter(F.col("vocab_rank") <= k)
        .withColumn(
            "__cum", F.col("__base_cum") + F.col("__rn") * F.col("n_occ")
        )
        .crossJoin(F.broadcast(total))
    )
    return out.select(
        "vocab_rank",
        "token",
        F.col("n_occ").cast("long").alias("n_occ"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(
            F.col("__cum").cast("double") / F.col("__total").cast("double"),
            6,
        ).alias("cum_frac"),
    )
