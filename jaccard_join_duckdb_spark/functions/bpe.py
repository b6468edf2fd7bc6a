"""Deterministic subword (BPE) tokenization for packing budgets.

Real sequence-packing budgets are subword tokens, not whitespace
words. This module implements classic byte-pair encoding from public
knowledge only — the merge-learning and greedy-merge-encode algorithm
of Sennrich, Haddow & Birch, "Neural Machine Translation of Rare
Words with Subword Units" (ACL 2016) — with a small merge table
shipped in-repo (``data/bpe_merges.txt``, trained deterministically
by ``tools/gen_bpe_merges.py`` on an embedded English seed text; no
downloads, no external tokenizer packages).

Design:

- Pre-tokenize with the same ``\\w+|[^\\w\\s]`` word regex the text
  stats use (``functions.text``), lowercased — one consistent word
  boundary definition across the engine.
- Each word becomes a char sequence + ``</w>`` end-of-word marker;
  merges apply greedily in rank order (lowest rank first), exactly as
  in the reference algorithm.
- The Spark kernel is an Arrow-batched pandas UDF (the documented
  slow path, used only because BPE's iterative merge loop is not
  expressible in built-in column functions) with a per-executor word
  cache: natural-language corpora are Zipfian, so the cache turns
  per-token work into per-DISTINCT-word work within each batch
  stream.

Scale notes (100 TB): the merge table is a few KB broadcast once per
executor; the UDF is a narrow map (no shuffle, no state); token
counting composes with :func:`..functions.text.packing_stats` via its
``token_count_col`` hook, keeping the packing aggregation itself pure
column arithmetic.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_bpe",
    "save_merges",
    "load_merges",
    "default_merges",
    "bpe_encode",
    "bpe_token_count",
    "with_bpe_token_counts",
]

_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_EOW = "</w>"
_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data")
DEFAULT_MERGES_PATH = os.path.join(_DATA_DIR, "bpe_merges.txt")


def _words(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


def train_bpe(
    texts: Iterable[str], n_merges: int = 512
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules (Sennrich et al. 2016, Alg. 1):
    count symbol-pair frequencies over the word-frequency table and
    repeatedly merge the most frequent pair. Ties break
    lexicographically — the whole table is a deterministic function
    of the input corpus.

    Implementation (round 7): indexed-incremental with a
    lazy-invalidation max-heap — per merge, only the word forms that
    actually CONTAIN the merged pair are touched and the best pair is
    popped from a heap instead of a full pair-table rescan, so
    production-scale tables (8k+ merges over tens of thousands of
    word forms) train in seconds instead of hours. Output is
    bit-identical to the naive per-iteration-rescan algorithm
    (pinned by tests/test_bpe.py::test_fast_trainer_matches_naive):
    the heap key ``(-count, pair)`` selects the same
    max-count-then-lexicographically-first pair."""
    import heapq

    vocab: dict[tuple[str, ...], int] = {}
    for text in texts:
        for w in _words(text or ""):
            sym = tuple(w) + (_EOW,)
            vocab[sym] = vocab.get(sym, 0) + 1

    words: list[tuple[tuple[str, ...], int]] = list(vocab.items())
    pair_counts: dict[tuple[str, str], int] = {}
    # pair -> word indices that contained it at some point (lazily
    # filtered on use — stale entries are cheap, rescans are not)
    pair_words: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []

    def _count(idx: int, sym: tuple[str, ...], freq: int, sign: int) -> None:
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + sign * freq
            if sign > 0:
                pair_words.setdefault(p, set()).add(idx)
            heapq.heappush(heap, (-pair_counts[p], p))

    for i, (sym, freq) in enumerate(words):
        _count(i, sym, freq, +1)

    merges: list[tuple[str, str]] = []
    while len(merges) < int(n_merges) and heap:
        neg, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if cur <= 0 or -neg != cur:
            continue  # stale heap entry (count changed since push)
        merges.append(best)
        merged = best[0] + best[1]
        for idx in list(pair_words.get(best, ())):
            sym, freq = words[idx]
            if not any(
                a == best[0] and b == best[1] for a, b in zip(sym, sym[1:])
            ):
                continue  # stale index
            _count(idx, sym, freq, -1)
            out: list[str] = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[idx] = (tuple(out), freq)
            _count(idx, tuple(out), freq, +1)
        # the merged pair is fully consumed
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: jaccard_join_duckdb_spark bpe 1\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    merges = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, _, b = line.partition(" ")
            merges.append((a, b))
    return merges


def default_merges() -> list[tuple[str, str]]:
    """The in-repo merge table (``data/bpe_merges.txt``)."""
    return load_merges(DEFAULT_MERGES_PATH)


def _ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    text: str, merges: list[tuple[str, str]] | None = None
) -> list[str]:
    """Pure-Python reference encoder (also the UDF kernel): lowercase
    word pre-tokenization, then greedy rank-ordered merges per word.
    Subwords carry the ``</w>`` marker on word-final pieces, so the
    original word is always recoverable from its pieces."""
    ranks = _ranks(merges if merges is not None else default_merges())
    out: list[str] = []
    for w in _words(text or ""):
        out.extend(_encode_word(w, ranks))
    return out


def bpe_token_count(
    text: str, merges: list[tuple[str, str]] | None = None
) -> int:
    return len(bpe_encode(text, merges))


def with_bpe_token_counts(
    df: DataFrame,
    text_col: str,
    out_col: str = "n_bpe_tokens",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """``df`` + an ``out_col`` int column holding each row's BPE token
    count — the Arrow-batched kernel (narrow map, no shuffle). The
    merge table rides the closure (a few KB serialized once per task);
    an ``lru_cache`` per executor process collapses the Zipf head so
    repeated words cost one dict walk total."""
    from pyspark.sql.functions import pandas_udf

    mergelist = merges if merges is not None else default_merges()

    @pandas_udf("int")
    def _count(batch: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ranks = _ranks(mergelist)

        @lru_cache(maxsize=65536)
        def word_len(w: str) -> int:
            return len(_encode_word(w, ranks))

        for s in batch:
            yield s.map(
                lambda t: sum(word_len(w) for w in _words(t or ""))
            ).astype("int32")

    return df.withColumn(out_col, _count(F.col(text_col)))


def bpe_packing_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    context_len: int = 2048,
    bucket_width: int = 64,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """:func:`..functions.text.packing_stats` on BPE token counts —
    the deployable packing estimate (budgets in subword tokens, the
    unit a trainer actually packs). Same conservative bucketed model,
    same output schema; only the per-document count column changes."""
    from .text import packing_stats

    counted = with_bpe_token_counts(
        df.select(id_col, text_col), text_col, "n_bpe_tokens", merges
    )
    return packing_stats(
        counted, id_col, text_col,
        context_len=context_len, bucket_width=bucket_width,
        token_count_col="n_bpe_tokens",
    )
