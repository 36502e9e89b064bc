"""Multimodal binary-column plumbing: images/audio/video as opaque binary
with typed metadata; decode / feature-extract / frame-sample as Arrow-batched
pandas UDFs over mapInPandas.

The container has no image/audio libraries, so the actual decoders are
STUBBED: `decode_backend="fake"` (default) computes deterministic metadata
from the bytes themselves (tested, reproducible); `decode_backend="pil"` /
`"ffmpeg"` raise NotImplementedError behind an import-try. Everything
Spark-side — schemas, partitioning, UDF signatures, Arrow batch shapes —
is real and tested; swapping in a real decoder changes one function.

Reference analogue: Olaf's decode step is exactly this shape — an external
decoder (ffmpeg subprocess, cli/olaf_cli_util_audio.zig:177-246) invoked
per blob, producing fixed-schema features downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta_format string"
)

IMAGE_META_SCHEMA = (
    "media_id long, n_bytes long, format string, width int, height int, sha1 string"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_sha1 string"


def _fake_decode_image(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake decoder: derives (format, width, height) from the
    payload bytes. Replace with PIL when available."""
    h = hashlib.sha1(payload).digest()
    fmt = ["png", "jpeg", "webp"][h[0] % 3]
    width = 16 + (h[1] | (h[2] << 8)) % 4080
    height = 16 + (h[3] | (h[4] << 8)) % 4080
    return fmt, width, height


def image_meta(media: DataFrame, decode_backend: str = "fake") -> DataFrame:
    """media(media_id, payload binary, ...) -> typed image metadata.

    mapInPandas: one Python invocation per Arrow batch, never per row.
    """
    if decode_backend == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "PIL backend not available in this container; use decode_backend='fake'"
            ) from e
        raise NotImplementedError("real PIL decode: wire Image.open over payload bytes")
    if decode_backend != "fake":
        raise NotImplementedError(f"unknown decode backend {decode_backend!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_fake_decode_image(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "sha1": [hashlib.sha1(bytes(b)).hexdigest() for b in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, IMAGE_META_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Video frame sampling (stub): emits deterministic per-frame rows.

    Real implementation would ffmpeg-decode and sample every Nth frame; the
    stub derives a frame count from the payload and hashes byte slices —
    the Spark-side fan-out (1 row -> M frame rows) is the part under test.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_sha = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(b)
                n_frames = min(max_frames, max(1, len(data) // (every_n * 16)))
                for fi in range(n_frames):
                    lo = fi * 16
                    out_ids.append(int(mid))
                    out_idx.append(fi)
                    out_sha.append(hashlib.sha1(data[lo : lo + 64]).hexdigest())
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_sha1": out_sha}
            )

    return media.select("media_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


def synth_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table from a text table (payload = utf-8 bytes),
    for exercising the binary-column plumbing without real media files."""
    kind = F.when(F.col(id_col) % 3 == 0, "image").when(F.col(id_col) % 3 == 1, "audio").otherwise("video")
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("synthetic").alias("meta_format"),
    )
