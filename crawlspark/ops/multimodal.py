"""Multimodal column plumbing: opaque binary media + typed metadata.

The contract's documents interleave text and media spans (BASELINE.json:15);
at training-pipeline scale the media bytes live in a binary column processed
by decode / feature-extract / resize UDFs.

The decode step is REAL for the two container-formats a pure-python parser
covers without codec libraries: BMP (BITMAPINFOHEADER) and WAV (RIFF PCM).
The fixture generators emit complete well-formed files (headers + payload),
and ``decode_media_meta`` recovers width/height/frames/sample-rate by parsing
the BYTES, not by replaying the generator arithmetic — the driver oracle
(``media_meta``) recomputes the expected values independently from doc_id, so
a header-layout bug on either side breaks the hash. Formats beyond BMP/WAV
(JPEG/PNG/MP4...) would need codec libs absent from this container; they
return kind='unknown' with NULL metadata rather than a fake.

Spark-side shape: one ``mapInPandas`` iterator pass (one decoder context per
partition, Arrow-bounded batches) — the same plumbing a PIL/ffmpeg decoder
drops into on a real cluster.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


# --------------------------------------------------------------- generators
def make_bmp(width: int, height: int) -> bytes:
    """A complete 24-bpp bottom-up BMP (BITMAPFILEHEADER + BITMAPINFOHEADER
    + padded pixel rows). Pixels are a deterministic gradient."""
    row = (3 * width + 3) // 4 * 4  # rows pad to 4 bytes
    img_size = row * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    px = bytearray(img_size)
    for y in range(height):
        base = y * row
        for x in range(3 * width):
            px[base + x] = (x + y) & 0xFF
    return header + info + bytes(px)


def make_wav(sample_rate: int, n_channels: int, n_samples: int) -> bytes:
    """A complete 16-bit PCM RIFF/WAVE file with a deterministic ramp."""
    block = n_channels * 2
    data_size = n_samples * block
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + data_size, b"WAVE",
        b"fmt ", 16, 1, n_channels, sample_rate, sample_rate * block, block, 16,
        b"data", data_size,
    )
    data = bytearray(data_size)
    for i in range(0, data_size, 2):
        struct.pack_into("<h", data, i, (i // 2) % 1000 - 500)
    return hdr + bytes(data)


def attach_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media fixture: docs with doc_id % 4 == 3 carry a WAV,
    the rest a BMP, dimensions/rates derived from doc_id (the arithmetic the
    driver oracle mirrors in SQL)."""

    @F.pandas_udf("binary")
    def _gen(ids: pd.Series) -> pd.Series:
        def one(i: int) -> bytes:
            i = int(i)
            if i % 4 == 3:
                return make_wav(8000 + 1000 * (i % 5), 1 + i % 2, 100 + i % 900)
            return make_bmp(1 + i % 64, 1 + (i * 7) % 64)

        return ids.map(one)

    return df.withColumn("media_bytes", _gen(F.col(id_col)))


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Opaque-binary stand-in used by byte-level ops: the UTF-8 bytes of the
    text column as a ``binary`` column."""
    return df.withColumn("media_bytes", F.encode(F.col(text_col), "UTF-8"))


# ------------------------------------------------------------------ decode
def decode_media(payload: bytes) -> dict:
    """Pure-python container-header decode (no codec libs). BMP: width and
    height from BITMAPINFOHEADER (abs() — negative height means top-down
    rows); WAV: channels/rate from the fmt chunk, frames from the data chunk
    size. Unknown magic -> kind='unknown', NULL metadata."""
    meta = {
        "kind": "unknown",
        "width": None,
        "height": None,
        "n_frames": None,
        "sample_rate": None,
        "n_channels": None,
    }
    if len(payload) >= 54 and payload[:2] == b"BM":
        w, h = struct.unpack_from("<ii", payload, 18)
        meta.update(kind="bmp", width=w, height=abs(h), n_frames=1)
    elif (
        len(payload) >= 44
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        # walk RIFF chunks: fmt_ then data (generators emit them in order,
        # but parse generally)
        pos = 12
        channels = rate = block = None
        frames = None
        while pos + 8 <= len(payload):
            cid, csize = struct.unpack_from("<4sI", payload, pos)
            if cid == b"fmt ":
                _, channels, rate = struct.unpack_from("<HHI", payload, pos + 8)
                block = struct.unpack_from("<H", payload, pos + 20)[0]
            elif cid == b"data" and block:
                frames = csize // block
            pos += 8 + csize + (csize & 1)
        if channels is not None:
            meta.update(
                kind="wav",
                n_frames=frames,
                sample_rate=rate,
                n_channels=channels,
            )
    return meta


def decode_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode pass: iterator-of-batches so one decoder context
    per partition, Arrow-bounded memory per batch. Every metadata value is
    parsed out of the bytes."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf["media_bytes"]]
            metas = [decode_media(b) for b in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "byte_len": [len(b) for b in payloads],
                    "kind": [m["kind"] for m in metas],
                    "width": pd.array(
                        [m["width"] for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in metas], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [m["n_frames"] for m in metas], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [m["sample_rate"] for m in metas], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [m["n_channels"] for m in metas], dtype="Int32"
                    ),
                }
            )

    return df.select(id_col, "media_bytes").mapInPandas(decode, MEDIA_META_SCHEMA)
