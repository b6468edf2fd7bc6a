"""Train and write the in-repo BPE merge table (data/bpe_merges.txt).

Training corpus = the embedded English prose seed below (repeated so
ordinary-prose pair statistics dominate the head of the table) + the
deterministic refscale person-profile corpus (tools/gen_refscale.py's
generator at 10k records: names, addresses, digit strings — the
word-shape diversity 8k merges actually need). Both parts are seeded
artifacts of this repo's own code — no external downloads, no
third-party tokenizer assets — so the table is reproducible
bit-for-bit by re-running this script.

Round 7 default is 8192 merges (was 512): a production-scale table
that exercises the Arrow kernel's real per-word merge-loop cost
(O(merges applied)) instead of hiding it behind a toy table, while
still loading in milliseconds (~100 KB).

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


def profile_corpus(n_records: int = 10_000) -> list[str]:
    """Deterministic refscale person-profile lines (the concat view
    the reference joins on) — same generator, same seed discipline as
    tools/gen_refscale.py."""
    import numpy as np

    from tools.gen_refscale import SEED, _concat_val, _make_originals

    rng = np.random.default_rng([SEED, n_records, 97])
    return [_concat_val(r) for r in _make_originals(rng, n_records)]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    # prose seed x20 keeps common-English pairs at the head of the
    # table; the profile corpus supplies the long tail of word shapes
    corpus = [SEED_TEXT] * 20 + profile_corpus()
    merges = train_bpe(corpus, n_merges=n)
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
