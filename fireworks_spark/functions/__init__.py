from fireworks_spark.functions.vector import cosine_similarity, dot, l2_norm
from fireworks_spark.functions.text import normalize_text, words
from fireworks_spark.functions.time import epoch_micros

__all__ = [
    "cosine_similarity",
    "dot",
    "epoch_micros",
    "l2_norm",
    "normalize_text",
    "words",
]
