"""Column-expression helpers (pure ``pyspark.sql.functions`` compositions).

Everything here stays JVM-side (higher-order functions, no Python UDFs) so
whole-stage codegen applies — the 100 TB hot-path rule from SURVEY.md §2.B.
"""

from .textfns import distinct_tokens, shingles, token_fingerprint, tokens
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "tokens",
    "distinct_tokens",
    "shingles",
    "token_fingerprint",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
