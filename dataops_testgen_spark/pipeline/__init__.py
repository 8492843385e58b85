from dataops_testgen_spark.pipeline import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
