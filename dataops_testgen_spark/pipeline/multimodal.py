"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata; decode / feature
extraction run as Arrow-batched ``mapInPandas`` stages (the only place Python
touches the data, and it streams batch-by-batch — bounded memory per task,
shape-preserving partitioning).

The container has no image/audio codecs, so the actual decode step is STUBBED
(``decode_stub``) behind a deterministic fake; the Spark-side plumbing —
schema, batch iteration, UDF signature, partition behavior — is real and
tested. Swap ``decode_stub`` for a PIL/librosa call in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("content_md5", T.StringType()),
    T.StructField("fake_feature", T.DoubleType()),
])


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode': real decoders (PIL.Image.open,
    soundfile.read, av.open) are unavailable in this container.

    Returns byte-level features any real decoder would subsume."""
    if payload is None:
        return {"byte_len": None, "first_byte": None, "fake_feature": None}
    return {
        "byte_len": len(payload),
        "first_byte": payload[0] if payload else None,
        # stand-in for e.g. mean pixel luminance
        "fake_feature": (sum(payload[:64]) / min(len(payload), 64)) if payload else 0.0,
    }


def decode_image(payload: bytes):
    """Real image decode — requires PIL, absent here by design."""
    raise NotImplementedError("image codecs not available in this container; "
                              "use decode_stub for plumbing tests")


def extract_features(df: DataFrame, binary_col: str = "payload",
                     id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over a binary column. One Arrow batch
    in → one pandas frame out; no pivot to the driver; partitioning preserved."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[binary_col].map(lambda b: decode_stub(bytes(b) if b is not None else None))
            out = pd.DataFrame({
                "doc_id": pdf[id_col],
                "byte_len": [f["byte_len"] for f in feats],
                "first_byte": [f["first_byte"] for f in feats],
                "content_md5": pdf[binary_col].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None),
                "fake_feature": [f["fake_feature"] for f in feats],
            })
            yield out

    return df.select(id_col, binary_col).mapInPandas(run, FEATURE_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """Demo helper: materialize a binary column (UTF-8 bytes of text) so the
    multimodal plumbing is exercisable on the synthetic documents table."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))
