"""Text canonicalization and chunking for training-data pipelines.

Beyond-reference operators (BASELINE.json north star): the
shard-preparation passes that sit between raw-corpus curation
(functions.text / operators.curate) and sequence packing
(functions.text.pack_sequences):

- :func:`normalize_text` — accent folding, typographic-punctuation
  normalization, control-char stripping, whitespace collapsing.
- :func:`dedup_lines_in_doc` — WITHIN-document repeated-line removal
  (the complement of cross-corpus
  ``functions.text.remove_boilerplate_lines``).
- :func:`chunk_documents` — sliding token-window chunking with
  overlap (RAG / long-context training shard prep).

All three are pure ``pyspark.sql.functions`` column expressions —
JVM-side, whole-stage codegen, ZERO shuffles (chunking adds one
generator explode, still scan-shaped): at 100 TB each is a single
embarrassingly-parallel scan whose cost is bounded by the parquet
read. Each is replicated verbatim in DuckDB SQL for the hash gate
(plans.oracle_ext.{normalize_text_sql, dedup_lines_in_doc_sql,
chunk_documents_sql}).

Determinism contract: no floats anywhere — outputs are strings and
integers, so Spark/DuckDB parity is exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ACCENT_FROM",
    "ACCENT_TO",
    "PUNCT_FROM",
    "PUNCT_TO",
    "chunk_documents",
    "dedup_lines_in_doc",
    "normalize_text",
    "split_sentences",
]

# Whitespace char class — same class as WhitespaceTokzr.
_WS = "[ \t\r\n]"

# Latin-1 Supplement + Latin Extended-A accent-folding map. Equal
# lengths by construction (one replacement char per source char) so
# translate() never deletes. Shared verbatim with the DuckDB oracle.
ACCENT_FROM = (
    "àáâãäåāăąèéêëēĕėęěìíîïĩīĭįıòóôõöōŏőøùúûüũūŭůűų"
    "çćĉċčñńņňďđĝğġģĥħĵķĺļľŀłŕŗřśŝşšţťŧŵýÿŷźżž"
    "ÀÁÂÃÄÅĀĂĄÈÉÊËĒĔĖĘĚÌÍÎÏĨĪĬĮÒÓÔÕÖŌŎŐØÙÚÛÜŨŪŬŮŰŲ"
    "ÇĆĈĊČÑŃŅŇĎĐĜĞĠĢĤĦĴĶĹĻĽĿŁŔŖŘŚŜŞŠŢŤŦŴÝŸŶŹŻŽ"
)
ACCENT_TO = (
    "aaaaaaaaaeeeeeeeeeiiiiiiiiiooooooooouuuuuuuuuu"
    "cccccnnnnddgggghhjklllllrrrsssstttwyyyzzz"
    "AAAAAAAAAEEEEEEEEEIIIIIIIIOOOOOOOOOUUUUUUUUUU"
    "CCCCCNNNNDDGGGGHHJKLLLLLRRRSSSSTTTWYYYZZZ"
)

# Typographic punctuation → ASCII (char-for-char; the one multi-char
# case, the ellipsis, is handled by a regexp_replace before this map).
PUNCT_FROM = "‘’‚‛“”„‟–—― •·"
PUNCT_TO = "''''\"\"\"\"--- **"

# C0 controls except \t (09) and \n (0a), plus DEL. \r is folded into
# the horizontal-whitespace collapse instead (it is part of _WS).
_CTRL_CLASS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def normalize_text(
    df: DataFrame, id_col: str, text_col: str, lowercase: bool = False
) -> DataFrame:
    """Canonicalize raw crawl text so downstream exact-match operators
    (fingerprints, line dedup, shingles) see one spelling per
    grapheme: ellipsis → ``...``, curly quotes / long dashes / NBSP /
    bullets → ASCII, accents folded (Latin-1 Supplement + Extended-A,
    case-preserving), control chars stripped, horizontal whitespace
    runs collapsed to one space, lines trimmed at both ends. Newlines
    are PRESERVED (document structure is data); ``lowercase=True``
    additionally case-folds — off by default because casing is signal
    for quality scoring and NER-ish downstream passes.

    Scale: one scan, all ``translate``/``regexp_replace`` JVM
    expressions inside whole-stage codegen — no shuffle, no UDF.
    Output: ``(id, norm_text, n_chars, n_chars_norm)`` with the
    before/after char counts (the cheap audit signal: a collapse
    ratio far from 1 flags mojibake-heavy shards).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    x = F.regexp_replace(t, "…", "...")
    x = F.translate(x, ACCENT_FROM + PUNCT_FROM, ACCENT_TO + PUNCT_TO)
    x = F.regexp_replace(x, _CTRL_CLASS, "")
    x = F.regexp_replace(x, "[ \t\r]+", " ")
    # trim spaces butting against newlines (leading/trailing per line)
    x = F.regexp_replace(x, " ?\n ?", "\n")
    x = F.trim(x)
    if lowercase:
        x = F.lower(x)
    return df.select(
        F.col(id_col).alias("id"),
        x.alias("norm_text"),
        F.length(t).alias("n_chars"),
        F.length(x).alias("n_chars_norm"),
    )


def dedup_lines_in_doc(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """WITHIN-document repeated-line removal: keep the FIRST
    occurrence of every exact line, drop later repeats — the
    per-document half of line-level dedup (chat transcripts repeating
    headers, scraped pages repeating nav blocks *within* one page).
    Cross-document boilerplate is the separate
    ``remove_boilerplate_lines`` pass. Blank lines are always kept
    (they carry paragraph structure, not content).

    Entirely a per-row array expression — ``filter`` with the
    (element, index) lambda keeps ``lines[i]`` iff
    ``array_position(lines, x) == i+1`` (its first occurrence is
    itself): ZERO shuffles, no explode, no window. The quadratic
    ``array_position`` scan is per-document and bounded by line
    count (crawl docs: tens to hundreds of lines — microseconds),
    never by corpus size. Output:
    ``(id, clean_text, n_lines, n_dropped)``.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n", -1)
    kept = F.filter(
        lines,
        lambda x, i: (x == F.lit(""))
        | (F.array_position(lines, x) == i + F.lit(1)),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).alias("n_lines"),
        (F.size(lines) - F.size(kept)).alias("n_dropped"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Sliding token-window chunking — the RAG / long-context shard
    prep step: split each document's whitespace tokens (case
    preserved — chunk text is payload, not a join key) into windows
    of ``chunk_tokens`` starting every ``stride`` tokens, so
    consecutive chunks overlap by ``chunk_tokens - stride``. A
    document with ``n ≤ chunk_tokens`` tokens yields exactly one
    chunk; otherwise ``1 + ceil((n - chunk_tokens) / stride)`` so the
    final window always reaches the last token. Empty documents
    yield no rows.

    Scale: tokenize + window arithmetic are per-row expressions; the
    only fan-out is the generator explode over chunk ids (output-
    proportional, the floor for any chunker) — no shuffle anywhere,
    so this runs at parquet-scan speed on any corpus size and the
    output partitioning inherits the input's (no skew: fan-out per
    row is ``n/stride``, bounded by doc length). Output:
    ``(id, chunk_id, n_tokens, chunk_text)``.
    """
    c, s = int(chunk_tokens), int(stride)
    if c < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not (1 <= s <= c):
        raise ValueError("stride must be in [1, chunk_tokens]")
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), _WS, -1),
        lambda x: F.trim(x) != F.lit(""),
    )
    base = (
        df.select(F.col(id_col).alias("id"), toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    # extra chunks past the first: ceil((n-c)/s) in exact integer math
    extra = F.expr(f"(n - {c} + {s} - 1) div {s}")
    k = F.when(F.col("n") <= c, F.lit(0)).otherwise(extra).cast("int")
    exploded = base.select(
        "id",
        "toks",
        F.explode(F.sequence(F.lit(0), k)).alias("chunk_id"),
    )
    piece = F.slice("toks", F.col("chunk_id") * s + 1, c)
    return exploded.select(
        "id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def split_sentences(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Sentence segmentation — the unit extractor under C4-style
    sentence-count gates and span-level dedup: a sentence is a
    maximal run of non-terminal characters followed by a run of
    terminal punctuation (``[.!?]+``), plus an unterminated trailing
    fragment if present. Sentences are trimmed; whitespace-only
    pieces are dropped BEFORE numbering, so ``sent_id`` is dense per
    document.

    This is the deterministic regex proxy for an NLP sentence
    splitter (abbreviation handling — "Dr. Smith" — is out of scope;
    at corpus scale the cheap proxy is what pipelines actually run).
    Scale: regexp extraction + array ops per row, one generator
    explode — scan-shaped, zero shuffle, output-proportional fan-out.
    Output: ``(id, sent_id, sentence)``.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    raw = F.regexp_extract_all(
        t, F.lit("[^.!?]+[.!?]+|[^.!?]+$"), F.lit(0)
    )
    # explicit 1-arg lambda: F.trim itself takes an optional second
    # parameter, so transform would feed it the ELEMENT INDEX as the
    # trim-character set (silent no-op)
    sents = F.filter(
        F.transform(raw, lambda x: F.trim(x)), lambda x: x != F.lit("")
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(sents).alias("sent_id", "sentence"),
    )
