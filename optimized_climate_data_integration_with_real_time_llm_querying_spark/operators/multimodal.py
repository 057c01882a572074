"""Multimodal (image/audio/video) column plumbing.

Media rides through the engine as opaque ``binary`` columns plus a
typed metadata struct — the storage/shuffle layer never interprets
the bytes. Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so the Python boundary is
crossed per-batch, not per-row.

The image/audio codec libraries are NOT in this container, so the
codec call itself is stubbed: ``decoder="fake"`` uses a deterministic
byte-hash featurizer (stable across runs/partitions, good enough to
test partitioning, schema, and batch shape), ``decoder="real"``
raises NotImplementedError at the exact seam where Pillow/ffmpeg
would plug in. Everything around the stub — schemas, batching,
iterator contracts, output multiplicity — is real Spark and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media rows for testing the pipeline: payload
    bytes derived from the text, metadata derived from the id. At
    ingest time this column would come from tar/webdataset shards."""
    payload = F.sha2(F.col(text_col).cast("binary"), 256).cast("binary")
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        (F.col(id_col) % 64 + 16).cast("int").alias("width"),
        (F.col(id_col) % 48 + 16).cast("int").alias("height"),
        (F.col(id_col) % 30 + 1).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )
    return df.select(F.col(id_col), payload.alias("media"), meta.alias("media_meta"))


_FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        # double, not float32: the featurizer's dyadic rationals
        # (uint32/2^32) are exact in double, which lets an external
        # oracle reproduce them bit-for-bit (media_feature_extract).
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a vision encoder: sha256 of the
    payload chopped into _FEATURE_DIM floats in [0, 1)."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(_FEATURE_DIM)]


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + featurize each media payload (Arrow-batched).

    ``decoder="real"`` is the seam for an actual codec+encoder stack
    (Pillow/torchvision/ffmpeg) — not available in this container.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode needs codec libs (Pillow/ffmpeg) "
                    "not present in this environment; use decoder='fake'"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["media"].map(len).astype("int32"),
                    "features": pdf["media"].map(_fake_features),
                }
            )

    return df.select("doc_id", "media").mapInPandas(op, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META),
    ]
)


def fit_within(w: int, h: int, max_w: int, max_h: int) -> tuple[int, int]:
    """Aspect-preserving thumbnail dimensions (never upscales) — the
    REAL half of resize, independent of any codec: scale by
    min(max_w/w, max_h/h, 1), round HALF-UP (floor(x+0.5), not
    Python's banker's round — SQL engines round ties away from zero,
    and the cross-engine oracle needs both sides to agree at .5),
    floor at 1px."""
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid source dimensions {w}x{h}")
    scale = min(max_w / w, max_h / h, 1.0)
    return max(1, int(w * scale + 0.5)), max(1, int(h * scale + 0.5))


def resize_media(
    df: DataFrame, max_w: int = 32, max_h: int = 32, decoder: str = "fake"
) -> DataFrame:
    """Resize each image payload to fit within (max_w, max_h),
    aspect-preserving, never upscaling (Arrow-batched 1:1
    mapInPandas). The dimension math and the metadata update are
    real; only the pixel resample is behind the decoder seam —
    ``decoder="fake"`` emits a deterministic payload derived from the
    source bytes + target dims, ``decoder="real"`` raises where
    Pillow's ``Image.thumbnail`` would plug in."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image resample needs Pillow, not present in "
                    "this environment; use decoder='fake'"
                )
            out_media, out_meta = [], []
            for media, meta in zip(pdf["media"], pdf["media_meta"]):
                nw, nh = fit_within(int(meta["width"]), int(meta["height"]), max_w, max_h)
                # dims ride in an ASCII suffix (not raw bytes) so the
                # derivation is replayable by VARCHAR-only SQL hash
                # functions — the media_resize_report oracle
                out_media.append(
                    hashlib.sha256(bytes(media) + f"|{nw}x{nh}".encode()).digest()
                )
                out_meta.append(
                    {
                        "mime": meta["mime"],
                        "width": nw,
                        "height": nh,
                        "n_frames": meta["n_frames"],
                        "sample_rate": meta["sample_rate"],
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out_media,
                    "media_meta": out_meta,
                }
            )

    return df.select("doc_id", "media", "media_meta").mapInPandas(op, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 10, decoder: str = "fake") -> DataFrame:
    """1:N frame sampling — each video row yields one row per sampled
    frame (output multiplicity > 1 through mapInPandas). The fake
    decoder stamps the frame index into the payload hash so frames
    are distinct and deterministic."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real frame extraction needs ffmpeg; use decoder='fake'"
                )
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, media, meta in zip(pdf["doc_id"], pdf["media"], pdf["media_meta"]):
                n_frames = int(meta["n_frames"])
                for idx in range(0, n_frames, every_n):
                    out_ids.append(doc_id)
                    out_idx.append(idx)
                    out_frames.append(
                        hashlib.sha256(bytes(media) + idx.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame": out_frames,
                }
            )

    return df.select("doc_id", "media", "media_meta").mapInPandas(op, FRAME_SCHEMA)
