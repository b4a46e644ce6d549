from fireworks_spark.functions.vector import cosine_similarity, dot, l2_norm
from fireworks_spark.functions.text import normalize_text, words

__all__ = ["cosine_similarity", "dot", "l2_norm", "normalize_text", "words"]
