"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (north star).

The Spark-side plumbing is real — schemas, Arrow-batched
``mapInPandas`` decode/feature/resize/frame-sample operators with
correct batch shapes and partitioning — while the actual codec calls
are stubbed (image/audio libraries are not in this container): with
``fake=True`` (default) a deterministic byte-derived fake is produced
so the pipeline is end-to-end testable; with ``fake=False`` the codec
import is attempted and a clear ``NotImplementedError`` raised if
missing.

At 100 TB: payloads stay in executors (never collected); decode is an
Arrow batch pipe with ``maxRecordsPerBatch`` bounding memory;
``repartition`` by size-bucket before heavy decode balances skew from
variable-length payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: One media item: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter for the driver testdata: treat document text bytes as an
    opaque payload so the multimodal plumbing is exercised end-to-end."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def media_manifest(df: DataFrame) -> DataFrame:
    """Cheap metadata pass (no decode): byte length, 4 KiB chunk count,
    content hash.  Pure Column expressions."""
    return df.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("byte_len"),
        F.ceil(F.octet_length("payload") / F.lit(4096.0)).cast("long").alias("n_chunks_4k"),
        F.md5("payload").alias("content_md5"),
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real image encoder: bytes of the
    sha256 digest scaled to [0,1).  Stable across runs/machines."""
    d = hashlib.sha256(payload).digest()
    return [d[i] / 255.0 for i in range(dim)]


def decode_image_features(df: DataFrame, dim: int = 8, fake: bool = True) -> DataFrame:
    """Arrow-batched decode + feature extraction over ``mapInPandas``.

    Real decoders (PIL/torchvision) are not available in this
    container; the stub keeps the exact Spark plumbing (schema, batch
    iteration, null payloads) and substitutes a deterministic fake.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires PIL/torchvision; not available in this "
            "environment — use fake=True for plumbing tests"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": payloads.map(
                        lambda b: None if b is None else _fake_features(bytes(b), dim)
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def audio_window_features(
    df: DataFrame, window_chars: int = 256, max_windows: int = 8
) -> DataFrame:
    """Audio feature windows, stubbed: decode the payload and emit one
    row per fixed-length window with a deterministic per-window
    fingerprint — the exact shape of PCM windowing + per-window
    feature extraction (RMS, MFCC), with the decoder swapped for
    UTF-8 and the feature for md5.  A real implementation replaces
    only the two marked lines inside the same Arrow-batched
    ``mapInPandas``; the fan-out (≤ ``max_windows`` rows per item),
    schema, and null handling are production-shaped."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("window_no", T.IntegerType(), False),
            T.StructField("n_chars", T.LongType(), False),
            T.StructField("window_md5", T.StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "window_no": [], "n_chars": [], "window_md5": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                samples = bytes(payload).decode("utf-8")  # real op: PCM decode
                if not samples:
                    continue
                n = min(max_windows, -(-len(samples) // window_chars))
                for i in range(n):
                    seg = samples[i * window_chars : (i + 1) * window_chars]
                    out["media_id"].append(mid)
                    out["window_no"].append(i)
                    out["n_chars"].append(len(seg))
                    # real op: RMS/MFCC over the window's samples
                    out["window_md5"].append(hashlib.md5(seg.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "window_no": pd.Series(out["window_no"], dtype="int32"),
                    "n_chars": pd.Series(out["n_chars"], dtype="int64"),
                    "window_md5": pd.Series(out["window_md5"], dtype="object"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, schema)


def resize_media(df: DataFrame, stride: int = 4) -> DataFrame:
    """Image resize, stubbed: nearest-neighbor downsampling stands in
    as keep-every-``stride``-th sample of the decoded payload — the
    decode → transform → re-encode shape (PIL ``Image.resize`` slots
    into the marked line) with input/output sizes and a content
    fingerprint for lineage.  Same Arrow-batched ``mapInPandas``
    plumbing; the resized payload is emitted as a binary column so a
    downstream sink can write it back."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("orig_chars", T.LongType(), False),
            T.StructField("resized_chars", T.LongType(), False),
            T.StructField("resized_md5", T.StringType(), False),
            T.StructField("resized", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in schema.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                samples = bytes(payload).decode("utf-8")
                resized = samples[::stride]  # real op: Image.resize / scipy.signal.resample
                out["media_id"].append(mid)
                out["orig_chars"].append(len(samples))
                out["resized_chars"].append(len(resized))
                out["resized_md5"].append(hashlib.md5(resized.encode("utf-8")).hexdigest())
                out["resized"].append(resized.encode("utf-8"))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "orig_chars": pd.Series(out["orig_chars"], dtype="int64"),
                    "resized_chars": pd.Series(out["resized_chars"], dtype="int64"),
                    "resized_md5": pd.Series(out["resized_md5"], dtype="object"),
                    "resized": pd.Series(out["resized"], dtype="object"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, schema)


def frame_sample(df: DataFrame, every_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Video frame sampling, stubbed: deterministically slice the
    payload every ``every_bytes`` as stand-in 'frames'.  The real
    implementation would swap the slicer for an ffmpeg call inside the
    same mapInPandas shape."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                for i in range(min(max_frames, max(1, len(raw) // every_bytes))):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["frame"].append(raw[i * every_bytes : (i + 1) * every_bytes])
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(run, schema)
