"""Edit-distance (Levenshtein) similarity self-join.

Beyond-reference operator extending the reference's set-similarity
join family (reference joins are Jaccard-over-token-sets,
reference src/jaccard_join.py; SURVEY.md §2.5) with the
string-similarity predicate classic record linkage uses on
NCVR / Febrl style workloads: all pairs with
``levenshtein(l, r) <= d``.

Ed-Join-style plan (Xiao, Wang, Lin — "Ed-Join: an efficient
algorithm for similarity joins with edit distance constraints",
PVLDB 1(1), 2008; q-gram count filtering from Gravano et al.,
VLDB'01) over POSITIONAL q-grams:

1. q-gram each string into (gram, pos) pairs (character q-grams,
   case-sensitive to match ``levenshtein``'s exactness); m =
   len - q + 1 grams per string.
2. Count filter: one edit operation disturbs at most ``q`` grams
   per side, and surviving grams align monotonically with position
   shift <= d, so any pair within distance ``d`` admits a monotone
   matching of size >= max(m_l, m_r) - d*q with per-pair
   ``|pos_l - pos_r| <= d``.
3. Prefix filter (pigeonhole over the global rare-gram-first
   (df, gram, pos) order): the FIRST pair of that monotone matching
   falls inside both sides' first ``d*q + 1`` grams — the candidate
   join touches only those signature grams, with the positional
   shift bound as a join residual, never the full gram inventory.
4. Short-string fallback: rows with ``m <= d*q`` can meet the
   distance bound while sharing zero grams — only against each
   other (for a mixed pair the longer side forces a matching of
   size >= 1 inside both prefixes), so the short-row set is
   equi-joined on generated length keys (len .. len+d), never
   cross-joined.
5. Verify candidates with the banded built-in
   ``levenshtein(l, r, d)`` (JVM codegen, early-exit) after an
   ``abs(len_l - len_r) <= d`` length filter.

``q`` trades robustness for selectivity: each edit forgives ``q``
grams (count bound loosens as q grows) but gram diversity grows as
alphabet^q, which is what keeps signatures rare on repetitive
identifier-like corpora — q=5 turns near-identical "Customer#0001xx"
names from ~10M candidate pairs (q=2) into ~the true result size.
Strings shorter than ~q(d+1) chars route to the short-row
fallback, so large-q calls on short-string corpora degrade to the
length-bucketed join rather than losing pairs.

Scale notes (100 TB): the corpus-wide shuffles are the gram-df
groupBy (8-byte xxhash64 keys) and the signature equi-join on
``<= d*q+1`` grams per row; candidates are (id, id) pairs — strings
rejoin only for surviving candidates. All-pairs never materializes;
frequent grams are excluded from signatures by the rare-first
prefix order, which is what bounds both fan-out and join skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["edit_distance_self_join"]


def _deletes_self_join(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """FastSS d=1 path: equi-join on xxhash64 of the delete-0/1
    variants. One narrow shuffle of (id, len, variant-hash) rows
    (``len+1`` per string, 8-byte keys); bucket sizes track true
    near-duplicate group sizes, not corpus-wide gram frequencies.
    A 2^-64 hash collision can only ADD a candidate that the
    levenshtein verification then rejects."""
    rows = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.length(text_col).alias("len"),
    )
    variants = rows.select(
        "id",
        "len",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, length(s)), i -> "
                    " xxhash64(if(i = 0, s,"
                    "   concat(substr(s, 1, i - 1),"
                    "          substr(s, i + 1, length(s))))))"
                )
            )
        ).alias("vh"),
    )
    L, R = variants.alias("L"), variants.alias("R")
    # lossless: substitution at i => both sides' delete-i variants
    # collide; insert/delete => the longer side's deletion hits the
    # shorter string's keep-variant; identical => keep == keep. Not
    # tight — e.g. "ab"/"ba" share variant "b" at distance 2 — but
    # verification rejects the overshoot; no deletion-count
    # bookkeeping is needed for correctness.
    cand = (
        L.join(
            R,
            (F.col("L.vh") == F.col("R.vh")) & (F.col("L.id") < F.col("R.id")),
        )
        .filter(
            (F.col("L.len") - F.col("R.len") <= 1)
            & (F.col("R.len") - F.col("L.len") <= 1)
        )
        .select(F.col("L.id").alias("lid"), F.col("R.id").alias("rid"))
        .distinct()
    )
    lrows = rows.select(F.col("id").alias("lid"), F.col("s").alias("ls"))
    rrows = rows.select(F.col("id").alias("rid"), F.col("s").alias("rs"))
    return (
        cand.join(lrows, "lid")
        .join(rrows, "rid")
        .withColumn("dist", F.levenshtein(F.col("ls"), F.col("rs"), 1))
        .filter(F.col("dist") >= 0)
        .select(
            F.col("lid").alias("l_id"),
            F.col("rid").alias("r_id"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


def _positional_grams(rows: DataFrame, text_col: str, q: int) -> DataFrame:
    """(id, len, m, grams:array<struct<gram:long,pos:int>>) —
    positional character q-grams; m = number of grams (0 for
    strings shorter than q). Grams are xxhash64-compressed to
    8-byte keys: they are only ever compared for equality, and a
    2^-64 collision can only ADD a candidate the levenshtein
    verification then scores truthfully."""
    return rows.select(
        "id",
        "len",
        F.greatest(F.col("len") - (q - 1), F.lit(0)).alias("m"),
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {q - 1}, 0)),"
            f" i -> struct(xxhash64(substr({text_col}, i, {q})) as gram,"
            f"             CAST(i AS INT) as pos))"
        ).alias("grams"),
    )


def edit_distance_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
    q: int = 2,
    method: str = "qgram",
) -> DataFrame:
    """All pairs ``(l_id, r_id, dist)`` with ``l_id < r_id`` and
    ``dist = levenshtein <= max_dist`` (case-sensitive; NULL texts
    are dropped — levenshtein against NULL is NULL in both
    engines). Exact under either method: the candidate filter is a
    lossless superset (hypothesis-fuzzed against the brute join in
    tests/test_editdist.py), and every candidate is verified with
    the built-in banded ``levenshtein``.

    ``method="qgram"`` (any ``max_dist``): Ed-Join positional
    prefix filter — right default for natural text, where rare
    grams exist. On identifier-like corpora sharing a long common
    prefix/suffix (serial numbers, "Customer#0001xx") every
    df-ordered signature eventually dips into corpus-wide grams and
    the candidate join degenerates toward all-pairs.

    ``method="deletes"`` (``max_dist == 1`` only): Mor-Fraenkel /
    FastSS deletion-neighborhood join — two strings within edit
    distance 1 always share a delete-at-most-one-char variant
    (substitution at i: both delete i; insertion: the longer side's
    deletion hits the shorter string itself), so candidates are an
    equi-join on the ``len+1`` variant hashes per string. Variant
    keys carry the DISCRIMINATIVE remainder of the string, so
    common prefixes don't collide buckets — the right choice for
    identifier-like corpora. Fan-out is C(len, d)-ish, which is why
    it is gated to d=1; larger d falls back to q-grams.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    if method not in ("qgram", "deletes"):
        raise ValueError(f"method must be qgram|deletes, got {method!r}")
    if method == "deletes":
        if max_dist != 1:
            raise ValueError(
                "method='deletes' supports max_dist=1 only (variant "
                f"fan-out is C(len, d)); got max_dist={max_dist}"
            )
        return _deletes_self_join(df, id_col, text_col)
    d, sig_len = int(max_dist), int(max_dist) * q + 1

    rows = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.length(text_col).alias("len"),
    )
    # grams feeds two shuffle-free branches (signature build +
    # short-row set); recomputing the narrow scan beats parking an
    # InMemoryRelation in the cache for the operator's lifetime.
    grams = _positional_grams(rows, "s", q)
    exploded = grams.select(
        "id",
        "len",
        F.explode("grams").alias("gp"),
    ).select("id", "len", F.col("gp.gram").alias("gram"), F.col("gp.pos").alias("pos"))
    dfreq = exploded.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    sig = (
        exploded.join(dfreq, "gram")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df", "gram", "pos")
            ),
        )
        .filter(F.col("rn") <= sig_len)
        .select("id", "len", "gram", "pos")
    )
    L, R = sig.alias("L"), sig.alias("R")
    cand = (
        L.join(
            R,
            (F.col("L.gram") == F.col("R.gram"))
            & (F.col("L.id") < F.col("R.id")),
        )
        .filter(
            (F.col("L.len") - F.col("R.len") <= d)
            & (F.col("R.len") - F.col("L.len") <= d)
            & (F.col("L.pos") - F.col("R.pos") <= d)
            & (F.col("R.pos") - F.col("L.pos") <= d)
        )
        .select(F.col("L.id").alias("lid"), F.col("R.id").alias("rid"))
    )
    # Short-string fallback: both sides with m <= d*q grams can pair
    # while sharing no gram. Equi-join on generated length keys
    # len..len+d — never a cross join; empty for corpora of strings
    # of at least ~q(d+1) chars.
    short = grams.filter(F.col("m") <= d * q).select("id", "len")
    sL = short.select(
        "id",
        "len",
        F.explode(F.sequence(F.col("len"), F.col("len") + d)).alias("k"),
    ).alias("SL")
    sR = short.alias("SR")
    cand_short = sL.join(
        sR,
        (F.col("SL.k") == F.col("SR.len")) & (F.col("SL.id") != F.col("SR.id")),
    ).select(
        F.least(F.col("SL.id"), F.col("SR.id")).alias("lid"),
        F.greatest(F.col("SL.id"), F.col("SR.id")).alias("rid"),
    )
    pairs = cand.unionByName(cand_short).distinct()
    lrows = rows.select(F.col("id").alias("lid"), F.col("s").alias("ls"))
    rrows = rows.select(F.col("id").alias("rid"), F.col("s").alias("rs"))
    return (
        pairs.join(lrows, "lid")
        .join(rrows, "rid")
        .withColumn("dist", F.levenshtein(F.col("ls"), F.col("rs"), d))
        .filter(F.col("dist") >= 0)
        .select(
            F.col("lid").alias("l_id"),
            F.col("rid").alias("r_id"),
            F.col("dist").cast("int").alias("dist"),
        )
    )
