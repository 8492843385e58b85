from dataops_testgen_spark.pipeline import (bpe, classify, curation, dedup,
                                            multimodal, retrieval, sampling,
                                            sessions, similarity, skew, text)

__all__ = ["bpe", "classify", "curation", "dedup", "multimodal",
           "retrieval", "sampling", "sessions", "similarity", "skew",
           "text"]
