"""Large-scale training-data pipeline operators (beyond the reference's
own surface): deduplication, similarity search, text analysis, multimodal
columns. All expression-first; Python only where semantics demand it.
"""

from kiji_mapreduce_spark.pipeline import (
    classifier, curate, decontaminate, dedup, dsir, graph, lm,
    multimodal, sample, search, similarity, sketch, text, vocab,
)

__all__ = ["classifier", "curate", "decontaminate", "dedup", "dsir",
           "graph", "lm", "multimodal", "sample", "search",
           "similarity", "sketch", "text", "vocab"]
