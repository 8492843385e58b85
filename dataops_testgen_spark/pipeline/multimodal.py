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
                              "use parse_media_header / decode_stub instead")


def parse_media_header(payload: bytes) -> dict:
    """Container-format header parse WITHOUT a codec: format detection from
    magic bytes plus the dimensions/sample-rate fields the headers carry.

    Handles PNG (IHDR width/height), JPEG (SOFn frame width/height), GIF
    (logical screen descriptor), BMP (DIB header), and WAV (fmt chunk
    channels/sample-rate). Anything else → format=None. Pure byte reads, no
    image/audio library needed."""
    none = {"format": None, "width": None, "height": None,
            "channels": None, "sample_rate": None}
    if not payload:
        return none
    b = bytes(payload)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            return {"format": "png",
                    "width": int.from_bytes(b[16:20], "big"),
                    "height": int.from_bytes(b[20:24], "big"),
                    "channels": None, "sample_rate": None}
        if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOFn marker
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(b[i + 2:i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return {"format": "jpeg",
                            "height": int.from_bytes(b[i + 5:i + 7], "big"),
                            "width": int.from_bytes(b[i + 7:i + 9], "big"),
                            "channels": b[i + 9], "sample_rate": None}
                i += 2 + seg_len
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return {"format": "gif",
                    "width": int.from_bytes(b[6:8], "little"),
                    "height": int.from_bytes(b[8:10], "little"),
                    "channels": None, "sample_rate": None}
        if b[:2] == b"BM" and len(b) >= 26:
            return {"format": "bmp",
                    "width": int.from_bytes(b[18:22], "little", signed=True),
                    "height": abs(int.from_bytes(b[22:26], "little", signed=True)),
                    "channels": None, "sample_rate": None}
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 28:
            return {"format": "wav", "width": None, "height": None,
                    "channels": int.from_bytes(b[22:24], "little"),
                    "sample_rate": int.from_bytes(b[24:28], "little")}
    except (IndexError, ValueError):
        pass
    return none


HEADER_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def extract_media_headers(df: DataFrame, binary_col: str = "payload",
                          id_col: str = "doc_id") -> DataFrame:
    """mapInPandas header extraction: same Arrow-batched shape as
    extract_features, but the parse is REAL (magic bytes + header fields),
    not a stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            heads = [parse_media_header(bytes(b) if b is not None else b"")
                     for b in pdf[binary_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "format": [h["format"] for h in heads],
                "width": [h["width"] for h in heads],
                "height": [h["height"] for h in heads],
                "channels": [h["channels"] for h in heads],
                "sample_rate": [h["sample_rate"] for h in heads],
            })

    return df.select(id_col, binary_col).mapInPandas(run, HEADER_SCHEMA)


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
