"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed via Arrow-batched mapInPandas.

The container ships no codec libraries, so the DECODE step is a
deterministic fake (clearly marked); everything Spark-side — schemas,
batch iteration, partition sizing, UDF signatures — is real and
tested. Swapping `_fake_decode` for PIL/libav calls is a one-function
change on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        # md5 (not sha1): the engine-wide exactness rule is that all
        # content hashing derives from md5, which DuckDB shares — so
        # even this stubbed-decode operator gets an exact oracle
        T.StructField("content_md5", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha1", T.StringType()),
    ]
)


def _fake_decode(buf: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decoder (no image libs in this container):
    derives an (8, 8, 3) uint8 'image' from the byte content. Replace
    with a real codec (PIL.Image.open etc.) in production — the Spark
    plumbing around it is unchanged."""
    h = hashlib.sha256(buf).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64)[0])
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def image_metadata(df: DataFrame, binary_col: str = "html", url_col: str = "url") -> DataFrame:
    """Decode-free metadata extraction (size, content hash, fake dims).
    mapInPandas: one Arrow batch in, one out; no per-row Python beyond
    the hashlib call per binary payload (CPU-bound C code)."""
    src = df.select(url_col, binary_col)

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = pdf[binary_col]
            yield pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "width": np.full(len(pdf), 8, dtype=np.int32),
                    "height": np.full(len(pdf), 8, dtype=np.int32),
                    "n_bytes": bufs.map(len).astype(np.int64),
                    "content_md5": bufs.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return src.mapInPandas(_map, schema=IMAGE_META_SCHEMA)


def image_features(df: DataFrame, binary_col: str = "html", url_col: str = "url") -> DataFrame:
    """Decode -> feature-extract (mean-pool channels of the fake decode;
    a real pipeline would run a vision encoder here). Returns
    array<float> ready for operators.similarity."""
    src = df.select(url_col, binary_col)

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(b)).reshape(-1, 3).mean(axis=0).astype(np.float32).tolist()
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame({"url": pdf[url_col], "feature": feats})

    return src.mapInPandas(_map, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_n: int = 2, n_frames: int = 4,
    binary_col: str = "html", url_col: str = "url",
) -> DataFrame:
    """Video frame-sampling shape: one input row -> n output rows
    (frame index + content hash of the fake frame). Exercises the
    1:N mapInPandas expansion pattern real frame extraction needs."""
    src = df.select(url_col, binary_col)

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, hashes = [], [], []
            for u, b in zip(pdf[url_col], pdf[binary_col]):
                data = bytes(b)
                for i in range(n_frames):
                    frame = _fake_decode(data + bytes([i * every_n]))
                    urls.append(u)
                    idxs.append(i * every_n)
                    hashes.append(hashlib.sha1(frame.tobytes()).hexdigest())
            yield pd.DataFrame(
                {"url": urls, "frame_idx": np.asarray(idxs, dtype=np.int32), "frame_sha1": hashes}
            )

    return src.mapInPandas(_map, schema=FRAME_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int, binary_col: str = "html") -> DataFrame:
    """Resize is NOT implementable without codec libs; this stub keeps
    the API surface and fails loudly if actually executed."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "resize requires an image codec (PIL/opencv), not shipped in this container"
        )
        yield  # pragma: no cover

    return df.mapInPandas(_map, schema=df.schema)
