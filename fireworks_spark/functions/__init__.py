from fireworks_spark.functions.vector import cosine_similarity, dot, l2_norm
from fireworks_spark.functions.rounding import pround, pround_sql
from fireworks_spark.functions.text import normalize_text, words
from fireworks_spark.functions.time import epoch_micros

__all__ = [
    "cosine_similarity",
    "dot",
    "epoch_micros",
    "l2_norm",
    "normalize_text",
    "pround",
    "pround_sql",
    "words",
]
