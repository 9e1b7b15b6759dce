"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque ``binary`` columns with typed metadata beside
them — the same design as the reference's opaque ``ByteSequence`` payloads
carried through the index with typed headers (jvector-base/.../graph/disk/
feature/FeatureId.java:31-62: feature-flagged per-node byte records).

What is REAL here (tested): schemas, Arrow batch shapes, partitioning, the
mapInPandas plumbing, metadata extraction (size, hash, magic-byte format
sniff) — all JVM-side or vectorized pandas. What is STUBBED: the actual
pixel/sample decode, because no image/audio codec libraries exist in this
container. ``decode_image_features(..., fake=False)`` raises
NotImplementedError at the exact point a real decoder (PIL/ffmpeg) would
plug in; ``fake=True`` substitutes a deterministic byte-statistics
"feature vector" so the full pipeline (including downstream consumers) is
exercisable end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-byte prefixes → format label (hex, uppercase — matches F.hex and
# DuckDB hex() so the sniffer is cross-engine reproducible)
MAGIC = [
    ("FFD8FF", "jpeg"),
    ("89504E47", "png"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi/webp container
    ("494433", "mp3"),
    ("664C6143", "flac"),
    ("1A45DFA3", "mkv"),
    ("00000018667479", "mp4"),
]


def media_meta_cols(blob: Column | str) -> dict[str, Column]:
    """Typed metadata for an opaque media blob — pure Catalyst expressions
    (codegen'd; no Python): byte size, content hash, sniffed format."""
    c = F.col(blob) if isinstance(blob, str) else blob
    hx = F.hex(c)
    fmt = F.lit("unknown")
    for prefix, label in reversed(MAGIC):
        fmt = F.when(hx.startswith(prefix), F.lit(label)).otherwise(fmt)
    return {
        "n_bytes": F.length(c).cast("long"),
        "content_md5": F.md5(c),
        "format": fmt,
    }


def media_meta(
    df: DataFrame, blob_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_bytes, content_md5, format) for a binary media column."""
    m = media_meta_cols(blob_col)
    return df.select(
        F.col(id_col),
        m["n_bytes"].alias("n_bytes"),
        m["content_md5"].alias("content_md5"),
        m["format"].alias("format"),
    )


# ---------------------------------------------------------------------------
# decode / feature-extract (mapInPandas; decode step stubbed)
# ---------------------------------------------------------------------------

FEATURE_DIM = 8


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in feature extractor: byte-statistics vector
    (len, mean, std, min, max, first, last, checksum-mod) per blob. Shaped
    and batched exactly like a real embedding extractor would be."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, buf in enumerate(payloads):
        if buf is None or len(buf) == 0:
            continue
        a = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
        out[i] = [
            len(a),
            a.mean(),
            a.std(),
            a.min(),
            a.max(),
            a[0],
            a[-1],
            float(int(a.sum()) % 997),
        ]
    return out


def decode_image_features(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
    batch_rows: int = 256,
) -> DataFrame:
    """(id, features: array<float>) via mapInPandas — the Spark-side
    plumbing (schema, Arrow batching, partition parallelism) is real; the
    pixel decode is stubbed (see module docstring).

    Scale notes: media blobs are large, so the input should be read with
    small ``spark.sql.files.maxPartitionBytes`` (or pre-repartitioned) so a
    batch of ``batch_rows`` blobs fits executor memory; features are tiny,
    so the output frame is orders of magnitude smaller than the input —
    project the blob column away immediately after this operator.
    """

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows]
                if fake:
                    feats = _fake_features(chunk[blob_col])
                else:
                    raise NotImplementedError(
                        "real image decode requires PIL/libjpeg — not in "
                        "this container; plug the decoder in here"
                    )
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].to_numpy(),
                        "features": list(feats),
                    }
                )

    return df.select(id_col, blob_col).mapInPandas(
        fn, schema=f"{id_col} long, features array<float>"
    )


def frame_sample(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
    fake: bool = True,
) -> DataFrame:
    """One row per sampled "frame" of a (fake) video blob: (id, frame_idx,
    frame_bytes). Real version would ffmpeg-seek keyframes; the stub slices
    fixed-width byte windows — identical row multiplicity + schema."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fidx, frames = [], [], []
            for _id, buf in zip(pdf[id_col], pdf[blob_col]):
                if not fake:
                    raise NotImplementedError("real frame sampling needs ffmpeg")
                if buf is None:
                    continue
                b = bytes(buf)
                for j in range(0, max(len(b), 1), every_n_bytes):
                    ids.append(_id)
                    fidx.append(j // every_n_bytes)
                    frames.append(b[j : j + every_n_bytes])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "frame_bytes": frames}
            )

    return df.select(id_col, blob_col).mapInPandas(
        fn, schema=f"{id_col} long, frame_idx int, frame_bytes binary"
    )
