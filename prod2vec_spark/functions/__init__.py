from prod2vec_spark.functions.hashing import (  # noqa: F401
    hash_unit,
    hex_prefix_long,
    rolling_fingerprint,
)
from prod2vec_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
from prod2vec_spark.functions.arrays import seeded_shuffle  # noqa: F401
