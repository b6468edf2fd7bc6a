"""Edit-distance (Levenshtein) similarity joins.

Beyond-reference operators extending the reference's set-similarity
join family (reference joins are Jaccard-over-token-sets,
reference src/jaccard_join.py; SURVEY.md §2.5) with the
string-similarity predicate classic record linkage uses on
NCVR / Febrl style workloads: all pairs with
``levenshtein(l, r) <= d`` — as a self-join (dedup within one
roster) and as a two-table join (link two roster snapshots, the
reference's own NCVR A-vs-B shape).

Two candidate filters, both lossless supersets verified by the
built-in banded ``levenshtein``:

``method="qgram"`` — Ed-Join plan (Xiao, Wang, Lin, PVLDB 1(1),
2008; q-gram count filtering from Gravano et al., VLDB'01) over
POSITIONAL q-grams:

1. q-gram each string into (gram, pos) pairs (character q-grams,
   case-sensitive to match ``levenshtein``); m = len - q + 1.
2. Count filter: one edit operation disturbs at most ``q`` grams
   per side, and surviving grams align monotonically with position
   shift <= d, so any pair within distance ``d`` admits a monotone
   matching of size >= max(m_l, m_r) - d*q with per-pair
   ``|pos_l - pos_r| <= d``.
3. Prefix filter (pigeonhole over the global rare-gram-first
   (df, gram, pos) order — df counted over BOTH sides in the
   two-table form so the order is shared): the FIRST pair of that
   monotone matching falls inside both sides' first ``d*q + 1``
   grams — the candidate join touches only those signature grams,
   with the positional shift bound as a join residual.
4. Short-string fallback: rows with ``m <= d*q`` can meet the
   distance bound while sharing zero grams — only against each
   other (for a mixed pair the longer side forces a matching of
   size >= 1 inside both prefixes), so the short-row sets are
   equi-joined on generated length keys (len .. len+d), never
   cross-joined.

``method="deletes"`` (``max_dist == 1`` only) — Mor-Fraenkel /
FastSS deletion neighborhood: two strings within edit distance 1
always share a delete-at-most-one-char variant (substitution at i:
both delete i; insertion: the longer side's deletion hits the
shorter string itself), so candidates are an equi-join on the
``len+1`` variant hashes per string. Variant keys carry the
DISCRIMINATIVE remainder of the string, so shared prefixes/suffixes
don't collide buckets — the right choice for identifier-like
corpora ("Customer#0001xx"), where every df-ordered q-gram
signature eventually dips into corpus-wide grams and the candidate
join degenerates toward all-pairs. Fan-out is C(len, d)-ish, which
is why it is gated to d=1.

``q`` trades robustness for selectivity in the q-gram path: each
edit forgives ``q`` grams but gram diversity grows as alphabet^q;
strings shorter than ~q(d+1) chars route to the short-row fallback,
so large-q calls on short-string corpora degrade to the
length-bucketed join rather than losing pairs.

Scale notes (100 TB): corpus-wide shuffles are the gram-df groupBy
(8-byte xxhash64 keys) and the signature/variant equi-join on
``<= d*q+1`` grams (or ``len+1`` variants) per row; candidates are
(id, id) pairs — strings rejoin only for surviving candidates.
All-pairs never materializes; frequent grams are excluded from
signatures by the rare-first prefix order, which is what bounds
both fan-out and join skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["edit_distance_join", "edit_distance_self_join"]


def _rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, s, len) with NULL texts dropped — levenshtein against
    NULL is NULL in both engines, so NULL rows can never pair."""
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.length(text_col).alias("len"),
    )


def _verify(
    cand: DataFrame, lrows: DataFrame, rrows: DataFrame, d: int
) -> DataFrame:
    """Join candidate (lid, rid) pairs back to their strings and keep
    those the banded built-in ``levenshtein(l, r, d)`` (JVM codegen,
    early-exit, returns -1 past the threshold) confirms."""
    ls = lrows.select(F.col("id").alias("lid"), F.col("s").alias("ls"))
    rs = rrows.select(F.col("id").alias("rid"), F.col("s").alias("rs"))
    return (
        cand.join(ls, "lid")
        .join(rs, "rid")
        .withColumn("dist", F.levenshtein(F.col("ls"), F.col("rs"), d))
        .filter(F.col("dist") >= 0)
        .select(
            F.col("lid").alias("l_id"),
            F.col("rid").alias("r_id"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


def _delete_variants(rows: DataFrame) -> DataFrame:
    """(id, len, vh) — xxhash64 of the string itself and each
    one-char-deleted variant. Hashes are only ever compared for
    equality; a 2^-64 collision can only ADD a candidate the
    levenshtein verification then rejects."""
    return rows.select(
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


def _deletes_join_core(
    lrows: DataFrame, rrows: DataFrame, self_join: bool
) -> DataFrame:
    L = _delete_variants(lrows).alias("L")
    R = _delete_variants(rrows).alias("R")
    # lossless: substitution at i => both sides' delete-i variants
    # collide; insert/delete => the longer side's deletion hits the
    # shorter string's keep-variant; identical => keep == keep. Not
    # tight — e.g. "ab"/"ba" share variant "b" at distance 2 — but
    # verification rejects the overshoot.
    pair_pred = (
        (F.col("L.id") < F.col("R.id")) if self_join
        else F.lit(True)
    )
    cand = (
        L.join(R, (F.col("L.vh") == F.col("R.vh")) & pair_pred)
        .filter(
            (F.col("L.len") - F.col("R.len") <= 1)
            & (F.col("R.len") - F.col("L.len") <= 1)
        )
        # the self-join's L.id < R.id predicate already canonicalizes
        # pair order, so both forms project sides as-is
        .select(F.col("L.id").alias("lid"), F.col("R.id").alias("rid"))
        .distinct()
    )
    return _verify(cand, lrows, rrows, 1)


def _positional_grams(rows: DataFrame, q: int) -> DataFrame:
    """(id, len, m, grams:array<struct<gram:long,pos:int>>) —
    positional character q-grams; m = gram count (0 for strings
    shorter than q); xxhash64-compressed 8-byte keys."""
    return rows.select(
        "id",
        "len",
        F.greatest(F.col("len") - (q - 1), F.lit(0)).alias("m"),
        # the `if` guards sequence(1, 0), which steps DOWNWARD to
        # [1, 0] and would fabricate two truncated grams for
        # strings shorter than q (harmless supersets — m still
        # routes them to the short fallback — but wasted join rows)
        F.expr(
            f"if(length(s) >= {q},"
            f"   transform(sequence(1, length(s) - {q - 1}),"
            f"     i -> struct(xxhash64(substr(s, i, {q})) as gram,"
            f"                 CAST(i AS INT) as pos)),"
            f"   cast(array() as array<struct<gram:bigint,pos:int>>))"
        ).alias("grams"),
    )


def _qgram_sig(grams: DataFrame, dfreq: DataFrame, sig_len: int) -> DataFrame:
    exploded = grams.select(
        "id", "len", F.explode("grams").alias("gp")
    ).select(
        "id", "len", F.col("gp.gram").alias("gram"), F.col("gp.pos").alias("pos")
    )
    return (
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


def _qgram_join_core(
    lrows: DataFrame, rrows: DataFrame, d: int, q: int, self_join: bool
) -> DataFrame:
    sig_len = d * q + 1
    lg = _positional_grams(lrows, q)
    rg = lg if self_join else _positional_grams(rrows, q)
    # one SHARED rare-first order: df over both sides' occurrences
    # (self-join: one side counted once)
    all_grams = (
        lg if self_join else lg.unionByName(rg)
    ).select(F.explode("grams").alias("gp")).select(F.col("gp.gram").alias("gram"))
    dfreq = all_grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    L = _qgram_sig(lg, dfreq, sig_len).alias("L")
    R = (
        _qgram_sig(rg, dfreq, sig_len) if not self_join else _qgram_sig(lg, dfreq, sig_len)
    ).alias("R")
    pair_pred = (
        (F.col("L.id") < F.col("R.id")) if self_join else F.lit(True)
    )
    cand = (
        L.join(R, (F.col("L.gram") == F.col("R.gram")) & pair_pred)
        .filter(
            (F.col("L.len") - F.col("R.len") <= d)
            & (F.col("R.len") - F.col("L.len") <= d)
            & (F.col("L.pos") - F.col("R.pos") <= d)
            & (F.col("R.pos") - F.col("L.pos") <= d)
        )
        .select(F.col("L.id").alias("lid"), F.col("R.id").alias("rid"))
    )
    # Short-string fallback: both sides with m <= d*q grams can pair
    # while sharing no gram — equi-join on generated length keys
    # len..len+d AND len-d..len-1 (two-table joins have no symmetry
    # to exploit; the self-join dedups via least/greatest), never a
    # cross join; empty for corpora of strings of >= ~q(d+1) chars.
    sL = lg.filter(F.col("m") <= d * q).select(
        "id",
        "len",
        F.explode(F.sequence(F.col("len") - d, F.col("len") + d)).alias("k"),
    ).alias("SL")
    sR = rg.filter(F.col("m") <= d * q).select("id", "len").alias("SR")
    short_pred = (
        (F.col("SL.id") != F.col("SR.id")) if self_join else F.lit(True)
    )
    cand_short = sL.join(
        sR, (F.col("SL.k") == F.col("SR.len")) & short_pred
    ).select(
        *(
            [
                F.least(F.col("SL.id"), F.col("SR.id")).alias("lid"),
                F.greatest(F.col("SL.id"), F.col("SR.id")).alias("rid"),
            ]
            if self_join
            else [F.col("SL.id").alias("lid"), F.col("SR.id").alias("rid")]
        )
    )
    pairs = cand.unionByName(cand_short).distinct()
    if self_join:
        return _verify(pairs, lrows, lrows, d)
    return _verify(pairs, lrows, rrows, d)


def _check_params(max_dist: int, q: int, method: str) -> None:
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    if method not in ("qgram", "deletes"):
        raise ValueError(f"method must be qgram|deletes, got {method!r}")
    if method == "deletes" and max_dist != 1:
        raise ValueError(
            "method='deletes' supports max_dist=1 only (variant "
            f"fan-out is C(len, d)); got max_dist={max_dist}"
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
    dropped). Exact under either method — the candidate filter is a
    lossless superset (hypothesis-fuzzed against the brute join in
    tests/test_editdist.py) and every candidate is verified with the
    built-in banded ``levenshtein``. See the module docstring for
    choosing ``method`` and ``q``."""
    _check_params(max_dist, q, method)
    rows = _rows(df, id_col, text_col)
    if method == "deletes":
        return _deletes_join_core(rows, rows, self_join=True)
    return _qgram_join_core(rows, rows, int(max_dist), q, self_join=True)


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    l_id: str,
    r_id: str,
    l_text: str,
    r_text: str,
    max_dist: int,
    q: int = 2,
    method: str = "qgram",
) -> DataFrame:
    """Two-table form — ``(l_id, r_id, dist)`` for every cross pair
    with ``levenshtein <= max_dist`` (the reference's NCVR
    snapshot-linkage shape, with an edit-distance predicate instead
    of Jaccard). Same exactness contract and method trade-offs as
    :func:`edit_distance_self_join`."""
    _check_params(max_dist, q, method)
    lrows = _rows(left, l_id, l_text)
    rrows = _rows(right, r_id, r_text)
    if method == "deletes":
        return _deletes_join_core(lrows, rrows, self_join=False)
    return _qgram_join_core(lrows, rrows, int(max_dist), q, self_join=False)
