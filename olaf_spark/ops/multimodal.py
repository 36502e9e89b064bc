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
    "media_id long, n_bytes long, format string, width long, height long, content_md5 string"
)

FRAME_SCHEMA = "media_id long, frame_idx long, frame_md5 string"

FORMATS = ["png", "jpeg", "webp"]


def _fake_decode_image(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake decoder: derives (format, width, height) from the
    md5 hex digest of the payload bytes. Replace with PIL when available.

    md5-hex arithmetic (not raw digest bytes) on purpose: the derivation is
    expressible in portable SQL, so the driver's DuckDB oracle checks the
    whole mapInPandas plumbing end-to-end (image_meta_sql), not rows-only.
    """
    h = hashlib.md5(payload).hexdigest()
    fmt = FORMATS[int(h[0], 16) % 3]
    width = 16 + int(h[1:5], 16) % 4080
    height = 16 + int(h[5:9], 16) % 4080
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
                    "content_md5": [hashlib.md5(bytes(b)).hexdigest() for b in pdf["payload"]],
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
            out_ids, out_idx, out_md5 = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(b)
                n_frames = min(max_frames, max(1, len(data) // (every_n * 16)))
                for fi in range(n_frames):
                    lo = fi * 16
                    out_ids.append(int(mid))
                    out_idx.append(fi)
                    out_md5.append(hashlib.md5(data[lo : lo + 64]).hexdigest())
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return media.select("media_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


def _sql_hex_at(col_sql: str, pos: int) -> str:
    """Portable SQL: integer value of 1-based hex digit `pos` of a hex string."""
    cases = " ".join(f"WHEN '{d}' THEN {int(d, 16)}" for d in "0123456789abcdef")
    return f"(CASE substr({col_sql}, {pos}, 1) {cases} ELSE 0 END)"


def _sql_hex_int(col_sql: str, start: int, n: int) -> str:
    """Portable SQL: int(hex[start:start+n], 16), start 1-based."""
    return "(" + " + ".join(
        f"{_sql_hex_at(col_sql, start + j)} * {16 ** (n - 1 - j)}" for j in range(n)
    ) + ")"


def image_meta_sql(table: str = "documents") -> str:
    """DuckDB oracle twin of image_meta over synth_media(documents):
    payload = utf-8 bytes of `text` (ASCII corpus -> md5(text) == md5 of
    the payload bytes), metadata derived from md5 hex exactly like
    _fake_decode_image."""
    h = "h"
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, md5(text) AS h,
         octet_length(encode(text))::BIGINT AS n_bytes
  FROM {table}
)
SELECT media_id, n_bytes,
       CASE ({_sql_hex_at(h, 1)} % 3) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
       (16 + {_sql_hex_int(h, 2, 4)} % 4080)::BIGINT AS width,
       (16 + {_sql_hex_int(h, 6, 4)} % 4080)::BIGINT AS height,
       h AS content_md5
FROM m
"""


def frame_sample_sql(
    table: str = "documents", every_n: int = 10, max_frames: int = 8
) -> str:
    """DuckDB oracle twin of frame_sample over synth_media's video rows
    (doc_id % 3 == 2). ASCII corpus -> substr on the string equals the byte
    slice the UDF hashes."""
    stride = every_n * 16
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text,
         octet_length(encode(text)) AS n
  FROM {table} WHERE doc_id % 3 = 2
), f AS (
  SELECT media_id, text,
         unnest(generate_series(0, least({max_frames}, greatest(1, n // {stride})) - 1)) AS frame_idx
  FROM m
)
SELECT media_id, frame_idx::BIGINT AS frame_idx,
       md5(substr(text, frame_idx * 16 + 1, 64)) AS frame_md5
FROM f
"""


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
