"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star extension — the reference's record model
is schema-less KV bytes, SURVEY.md §1.1, so "binary payload + metadata"
is its closest native concept, made columnar here).

The Spark-side plumbing is real and tested: binary columns, Arrow-batched
mapInPandas decode, stable output schema, partition-preserving shape. The
real media decode (``fake=False``) uses PIL when importable (r7) —
``decode_image_meta`` reads actual width/height/mode from the payload and
``resize_image`` runs Image.resize; property-tested on generated PNGs in
tests/test_multimodal.py (skipped where PIL is absent). Where PIL is
genuinely missing — this container — the real branch raises
NotImplementedError and the deterministic fake decoder (pure function of
the payload bytes) remains the oracled driver surface. Audio/video
(soundfile/ffmpeg) stay honestly stubbed.

Scale notes: mapInPandas streams Arrow batches — no row-at-a-time serde,
no driver collection; payloads stay partitioned exactly as scanned.
Control batch memory for large blobs with
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tez_spark.operators.core import bounded_sort
from tez_spark.sources.catalog import load_table

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, checksum string"
)


def _pil_image():
    """PIL.Image when importable, else None — resolved once per
    executor-side import of this module."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _decode_one(payload: bytes, fake: bool) -> tuple[int, int, int, str]:
    """Decode one payload to (n_bytes, width, height, checksum).

    fake=True: deterministic fake 'image header' (pure function of the
    bytes) — the oracled driver surface. fake=False: REAL decode via
    PIL.Image.open when PIL is importable; NotImplementedError only when
    it is genuinely absent."""
    n = len(payload)
    if not fake:
        Image = _pil_image()
        if Image is None:
            raise NotImplementedError(
                "real image decode requires PIL, which is not installed; "
                "pass fake=True for the deterministic stand-in"
            )
        import io

        with Image.open(io.BytesIO(bytes(payload))) as im:
            return n, im.width, im.height, hashlib.md5(payload).hexdigest()
    return n, n % 640, n % 480, hashlib.md5(payload).hexdigest()


def decode_image_meta(df: DataFrame, payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Binary payload -> typed metadata via Arrow-batched mapInPandas."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_one(p, fake) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "checksum": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(proc, DECODE_SCHEMA)


FEATURE_BINS = 16


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Payload -> fixed-size feature vector (normalized 16-bin byte
    histogram — the deterministic stand-in for a real image/audio
    embedding model). Output array<double> plugs directly into the
    similarity operators (brute_force_topk / lsh)."""
    import numpy as np

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=FEATURE_BINS).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return df.mapInPandas(proc, "doc_id long, feature array<double>")


def frame_sample(df: DataFrame, n_frames: int = 4, payload_col: str = "payload") -> DataFrame:
    """Video-style 1->N expansion: sample n byte-range 'frames' per
    payload (real impl: ffmpeg keyframe extraction). Demonstrates row
    fan-out inside Arrow batches — output stays partition-local, no
    shuffle."""

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(p)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step]
                    if not chunk:
                        break
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(chunk)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(proc, "doc_id long, frame_idx int, frame binary")


def resize_image(
    df: DataFrame, width: int, height: int, payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Resize to a fixed width×height grayscale pixel plane.

    fake=True: the byte plane is truncated/padded to width*height —
    schema and sizing logic real, no codec. fake=False: REAL
    PIL.Image.open → convert('L') → resize((width, height)) when PIL is
    importable (tested on generated PNGs); NotImplementedError only when
    PIL is genuinely absent. Either way the output is exactly
    width*height bytes per row — the fixed-shape tensor a training
    pipeline feeds downstream."""
    target = width * height
    if not fake and _pil_image() is None:
        raise NotImplementedError(
            "real resize requires PIL, which is not installed; "
            "pass fake=True for the byte-plane stand-in"
        )

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = _pil_image()
        # Re-check HERE, not just on the driver (ADVICE r7): proc runs
        # in executors, and a cluster with PIL installed on the driver
        # only would otherwise die with AttributeError (Image is None)
        # instead of the explicit contract error.
        if not fake and Image is None:
            raise NotImplementedError(
                "real resize requires PIL on the EXECUTORS (importable "
                "on the driver but not here); install it cluster-wide "
                "or pass fake=True for the byte-plane stand-in"
            )
        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                if fake:
                    out.append((bytes(p) + b"\0" * target)[:target])
                else:
                    with Image.open(io.BytesIO(bytes(p))) as im:
                        out.append(
                            im.convert("L").resize((width, height)).tobytes()
                        )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pixels": out})

    return df.mapInPandas(proc, "doc_id long, pixels binary")


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents' text re-encoded as a binary payload column, pushed
    through the decode pipeline. The oracle recomputes the same metadata
    in SQL (octet_length / md5), proving the Python plumbing is lossless.
    """
    from tez_spark.operators.core import fan_out

    docs = load_table(spark, sf_dir, "documents")
    payloads = fan_out(
        docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    )
    return decode_image_meta(payloads, fake=True).orderBy("doc_id")


ORACLE: dict[str, str] = {
    "multimodal_decode": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
               CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height,
               md5(text) AS checksum
        FROM documents ORDER BY doc_id
    """,
}

QUERIES = {
    "multimodal_decode": q_multimodal_decode,
}
