from .text import (  # noqa: F401
    fingerprint_md5,
    lang_id_expr,
    quality_score_expr,
    token_count_regex,
    tokens_expr,
)
from .vectors import cosine_similarity, dot_product, l2_norm  # noqa: F401
