"""Train and write the in-repo BPE merge table (data/bpe_merges.txt).

The seed corpus is embedded below — generic English written for this
repo (no external downloads, no third-party tokenizer assets), so the
merge table is a deterministic artifact of this script alone and does
NOT shift when the test corpora are regenerated. 512 merges is enough
to pull common English digraphs/suffixes together (~1.3 subwords per
word on ordinary prose) while keeping the table a few KB.

Usage::

    python tools/gen_bpe_merges.py [n_merges]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jaccard_join_duckdb_spark.functions.bpe import (  # noqa: E402
    DEFAULT_MERGES_PATH,
    bpe_encode,
    save_merges,
    train_bpe,
)

SEED_TEXT = """
the quick brown fox jumps over the lazy dog while the old grey cat
sleeps in the warm afternoon sun near the garden wall and the children
walk home from school along the river road past the market square
where the people buy bread and milk and fruit and talk about the
weather and the news of the day and the state of the world

a large language model learns from text data collected at scale and
the training pipeline must clean filter deduplicate and tokenize the
documents before packing them into fixed length sequences for the
trainer to consume with high throughput and stable loss curves

the engine reads parquet files from distributed storage partitions the
records across many executors shuffles intermediate results by key and
writes the final tables back with bucketing so that later joins avoid
another exchange of the same data over the network

similarity joins compare token sets with a threshold on the jaccard
coefficient using prefix filtering positional filtering and length
filtering to prune candidate pairs before exact verification of the
overlap between the remaining documents

common english words appear again and again in every corpus and their
frequency follows a power law distribution so the most frequent words
become single tokens while rare words split into smaller pieces that
still reconstruct the original string exactly

numbers like one two three four five six seven eight nine ten and
punctuation marks such as commas periods question marks and quotes
receive their own tokens in the vocabulary of the encoder

machine learning systems require careful evaluation against held out
benchmarks and any contamination of the training set with test data
must be detected and removed before the final run begins

information retrieval engines build inverted indexes mapping each term
to the list of documents and positions where it occurs so that phrase
queries intersect short posting lists instead of scanning all text

quality signals include the ratio of alphabetic characters the length
of the document the repetition of lines and paragraphs the presence of
boilerplate navigation text and the perplexity of the language model

streaming computation processes unbounded event sources with
watermarks to bound state and handle late arrivals while keeping the
results consistent with the equivalent batch computation over the
same input
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    merges = train_bpe([SEED_TEXT], n_merges=n)
    os.makedirs(os.path.dirname(DEFAULT_MERGES_PATH), exist_ok=True)
    save_merges(merges, DEFAULT_MERGES_PATH)
    sample = "the quick brown fox jumped over thirteen lazy dogs"
    toks = bpe_encode(sample, merges)
    n_words = len(sample.split())
    print(f"wrote {len(merges)} merges -> {DEFAULT_MERGES_PATH}")
    print(f"sample: {toks}")
    print(f"{len(toks)} subwords / {n_words} words "
          f"= {len(toks) / n_words:.2f} per word")


if __name__ == "__main__":
    main()
