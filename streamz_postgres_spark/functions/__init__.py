from streamz_postgres_spark.functions.numeric import dsum, davg, dvar_samp, dstddev_samp
from streamz_postgres_spark.functions.vector import dot, cosine_similarity, l2_norm

__all__ = [
    "dsum",
    "davg",
    "dvar_samp",
    "dstddev_samp",
    "dot",
    "cosine_similarity",
    "l2_norm",
]
