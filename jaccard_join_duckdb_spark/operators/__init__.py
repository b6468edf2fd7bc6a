from .jaccard import (  # noqa: F401
    jaccard_inner_join,
    jaccard_inner_join_brute_force,
    jaccard_join,
    jaccard_join_brute_force,
    jaccard_self_join,
    jaccard_self_join_brute_force,
    tokens_with_doc_freq,
)
from .evaluate import confusion_matrix_df, evaluate  # noqa: F401
