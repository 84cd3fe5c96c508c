"""Multimodal column plumbing: opaque binary media + typed metadata.

The contract's documents interleave text and media spans (BASELINE.json:15);
at training-pipeline scale the media bytes live in a binary column processed
by decode / feature-extract / resize UDFs. The image/audio codec libraries
are not in this container, so the DECODE step is stubbed behind
``_decode_stub`` (clearly marked; deterministic fake) — but the Spark-side
plumbing is real and tested: schema, Arrow batch shape (iterator of
pandas DataFrames through ``mapInPandas``), and partition-count preservation
are exactly what a real decoder would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sandbox stand-in for a real media payload: the UTF-8 bytes of the
    text column as an opaque ``binary`` column."""
    return df.withColumn("media_bytes", F.encode(F.col(text_col), "UTF-8"))


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB — real image/audio decode is NOT implemented (codec libs absent
    in this container). Returns deterministic fake (width, height, n_frames)
    derived from the payload length so the pipeline shape is testable.
    Replace with e.g. PIL.Image.open(BytesIO(payload)) on a real cluster.
    """
    n = len(payload)
    return 64 + n % 512, 64 + (n * 7) % 512, 1 + n % 16


def decode_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode pass: iterator-of-batches so one decoder context
    per partition, Arrow-bounded memory per batch."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_stub(bytes(b)) for b in pdf["media_bytes"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "byte_len": [len(bytes(b)) for b in pdf["media_bytes"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                }
            )

    return df.select(id_col, "media_bytes").mapInPandas(decode, MEDIA_META_SCHEMA)
