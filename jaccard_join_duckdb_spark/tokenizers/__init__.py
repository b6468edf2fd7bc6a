"""Tokenizers: DataFrame-returning transforms producing
``tokens(id, len, token)``.

Semantics-parity port of the reference's SQL-template tokenizers
(``py_duckdb/similarity_join/tokenizers/__init__.py:1-49``), built
entirely from Spark higher-order array functions — zero UDFs, fully
JVM-side / whole-stage-codegen-friendly (SURVEY.md §2.3).

Parity notes (must-preserve hazards, SURVEY.md §4.3):
- ``len`` is computed on the token *list* BEFORE explode
  (reference ``tokenizers/__init__.py:15``): set cardinality with
  ``return_set=True``, bag size otherwise.
- ``return_set=False`` strips only the dedup step (reference
  ``Tokenizer.__init__`` replaces ``list_distinct`` with nothing).
- DelimiterTokzr dedups BEFORE lowercasing (case-sensitive distinct,
  then ``lower`` at unnest — so "Whisk whisk" yields len=2 and two
  identical lowercase token rows). QGramsTokzr lowercases *inside*
  gram generation, so its dedup is case-insensitive. Both quirks are
  reproduced exactly.
- Records whose token list is empty disappear (unnest/explode of an
  empty list yields no rows) — identical in both engines.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Tokenizer", "QGramsTokzr", "DelimiterTokzr", "WhitespaceTokzr"]


class Tokenizer(ABC):
    """Base: configurable set/bag semantics (reference
    ``tokenizers/__init__.py:1-8``)."""

    def __init__(self, return_set: bool = True):
        self.return_set = return_set

    @abstractmethod
    def _token_list(self, val: Column) -> Column:
        """Pre-dedup token list for one value (array<string>)."""

    def tokenize(self, df: DataFrame, key: str, val: str) -> DataFrame:
        """``(df, key, val) -> tokens(id, len, token)``.

        Lowercasing at explode mirrors the reference's
        ``lower(unnest(tks))`` (``tokenizers/__init__.py:15``).
        """
        tks = self._token_list(F.col(val).cast("string"))
        if self.return_set:
            tks = F.array_distinct(tks)
        return (
            df.select(F.col(key).alias("id"), tks.alias("tks"))
            .select(
                "id",
                F.size("tks").alias("len"),
                F.explode("tks").alias("tk"),
            )
            .select("id", "len", F.lower("tk").alias("token"))
        )


class QGramsTokzr(Tokenizer):
    """Padded character q-grams (reference
    ``tokenizers/__init__.py:11-26``): lowercase, pad both ends with
    ``'#' * (q-1)``, emit all q-length substrings at positions
    ``1 .. len(val)+q-1``."""

    def __init__(self, q: int, return_set: bool = True):
        super().__init__(return_set)
        if q < 1:
            raise ValueError("q must be >= 1")
        self.q = q

    def _token_list(self, val: Column) -> Column:
        q = self.q
        pad = F.lit("#" * (q - 1))
        padded = F.concat(pad, F.lower(val), pad)
        n = F.length(val) + (q - 1)
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda x: padded.substr(x, F.lit(q)),
        )


class DelimiterTokzr(Tokenizer):
    """Regex-class split on a separator set, dropping blank /
    whitespace-only tokens (reference ``tokenizers/__init__.py:29-43``).

    The separator set is interpolated verbatim into a ``[...]`` regex
    character class, exactly as the reference does (no escaping).
    """

    def __init__(self, separators: Iterable[str], return_set: bool = True):
        super().__init__(return_set)
        self.pattern = "[%s]" % "".join(sorted(set(separators)))

    def _token_list(self, val: Column) -> Column:
        return F.filter(
            F.split(val, self.pattern, -1),
            lambda x: F.trim(x) != F.lit(""),
        )


class WhitespaceTokzr(DelimiterTokzr):
    """Whitespace separators (reference ``tokenizers/__init__.py:46-49``)."""

    def __init__(self, return_set: bool = True):
        super().__init__({" ", "\t", "\r", "\n"}, return_set)
