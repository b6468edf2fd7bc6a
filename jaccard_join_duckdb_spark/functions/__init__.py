from .text import (  # noqa: F401
    BPE_REGEX,
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    poly_hash,
    text_stats,
    token_counts,
    ws_token_array,
)
