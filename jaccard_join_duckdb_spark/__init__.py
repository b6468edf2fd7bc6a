"""jaccard_join_duckdb_spark — a PySpark-native set-similarity join
and large-scale text/data-pipeline engine.

Re-implements the full capability surface of the reference
``RBenassiUnimore/jaccard-join-duckdb`` (a DuckDB-SQL-generating
similarity-join library) as idiomatic Spark DataFrame transforms —
plus the LLM-training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference lacks,
all designed for multi-executor scale.

Public API mirrors ``py_duckdb.similarity_join``'s exports
(``similarity_join/__init__.py:1-4``): ``jaccard_join``,
``jaccard_join_brute_force``, the tokenizers, and ``evaluate``.
"""

from .operators.jaccard import (  # noqa: F401
    jaccard_inner_join,
    jaccard_inner_join_brute_force,
    jaccard_join,
    jaccard_join_brute_force,
    jaccard_self_join,
    jaccard_self_join_brute_force,
    tokens_with_doc_freq,
)
from .operators.evaluate import confusion_matrix_df, evaluate  # noqa: F401
from .session import get_spark  # noqa: F401
from .tokenizers import (  # noqa: F401
    DelimiterTokzr,
    WordsTokzr,
    QGramsTokzr,
    Tokenizer,
    WhitespaceTokzr,
)

__version__ = "0.1.0"
