from inside_vectordb_spark.functions.vector import (
    as_double_array,
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)
from inside_vectordb_spark.functions.text import (
    tokenize,
    token_count,
    char_ngrams,
    word_shingles,
)

__all__ = [
    "as_double_array",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "tokenize",
    "token_count",
    "char_ngrams",
    "word_shingles",
]
