"""Multimodal (image/audio/video) column plumbing for the ingest pipeline.

Media payloads ride the same change-event rows as html: an opaque
``binary`` column plus typed metadata (mime, width/height, duration). The
Spark-side machinery here is real — schema, partition-preserving
``mapInPandas``, Arrow batch shapes, null/delete handling — while the
actual codec work is STUBBED (this container has no image/audio libraries):
``decode_image_meta`` parses only deterministic fake headers, and
``extract_features`` emits a seeded deterministic embedding. Swapping the
stub body for PIL/libsndfile is a one-function change; nothing about the
distributed plan moves.

Design rules for 100 TB media tables:
- media bytes NEVER pass through a shuffle: ``mapInPandas`` runs where the
  scan runs, emits only small derived columns; joins/apply happen on the
  narrow outputs;
- Arrow batch size stays at the session's 10k default but media rows are
  large — ``media_batch_iter`` re-chunks by payload bytes so a batch of
  4K-frame blobs cannot blow executor memory;
- deletes (NULL payload) project to NULL metadata, mirroring the engine's
  tombstone discipline.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "url string, warc_ts timestamp, mime string, n_bytes int, width int, "
    "height int, sha256 string, feat array<float>"
)

# deterministic fake header: b"FAKEIMG" + <I width + <I height
_MAGIC = b"FAKEIMG"


def make_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic pseudo-image used by tests and the datagen — a real
    container would carry JPEG/PNG bytes here."""
    body = hashlib.sha256(f"{width}x{height}:{seed}".encode()).digest() * 4
    return _MAGIC + struct.pack("<II", width, height) + body


try:  # real codec path when PIL is installed; deterministic stub otherwise
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # this container ships no imaging libs — stub only
    _PILImage = None


def _decode_one(payload: bytes | None) -> tuple[str | None, int | None, int | None]:
    """Decode one payload header. The deterministic FAKEIMG header always
    works (tests/datagen); anything else uses PIL when available and
    raises the documented NotImplementedError otherwise — the surrounding
    distributed plan is identical either way."""
    if payload is None:
        return None, None, None
    if payload.startswith(_MAGIC):
        w, h = struct.unpack("<II", payload[len(_MAGIC) : len(_MAGIC) + 8])
        return "image/fake", int(w), int(h)
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(payload)) as img:
            fmt = (img.format or "unknown").lower()
            return f"image/{fmt}", int(img.width), int(img.height)
    raise NotImplementedError(
        "real image decoding requires PIL (absent in this environment); "
        "payload does not carry the deterministic FAKEIMG header"
    )


def _feature_one(payload: bytes | None, dim: int = 8) -> list[float] | None:
    """STUB feature extractor: a deterministic pseudo-embedding derived
    from the payload digest (stands in for a vision encoder)."""
    if payload is None:
        return None
    d = hashlib.sha256(payload).digest()
    return [((d[i] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def media_batch_iter(
    batches: Iterator[pd.DataFrame], max_batch_bytes: int = 64 << 20
) -> Iterator[pd.DataFrame]:
    """Re-chunk Arrow batches by payload size so huge blobs can't blow a
    single pandas batch (row-count-based batching is wrong for media)."""
    for pdf in batches:
        sizes = pdf["payload"].map(lambda b: 0 if b is None else len(b))
        start, acc = 0, 0
        for i, s in enumerate(sizes):
            acc += int(s)
            if acc >= max_batch_bytes and i > start:
                yield pdf.iloc[start:i]
                start, acc = i, int(s)
        if start < len(pdf):
            yield pdf.iloc[start:]


def decode_image_meta(df: DataFrame, dim: int = 8) -> DataFrame:
    """Per-row media decode + feature extract via ``mapInPandas``.

    Input: (url, warc_ts, payload binary). Output: MEDIA_META_SCHEMA —
    narrow derived columns only; the payload does not survive into the
    output (keep media bytes out of downstream shuffles).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in media_batch_iter(batches):
            meta = pdf["payload"].map(_decode_one)
            out = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "mime": meta.map(lambda t: t[0]),
                    "n_bytes": pdf["payload"].map(
                        lambda b: None if b is None else len(b)
                    ),
                    "width": meta.map(lambda t: t[1]),
                    "height": meta.map(lambda t: t[2]),
                    "sha256": pdf["payload"].map(
                        lambda b: None if b is None else hashlib.sha256(b).hexdigest()
                    ),
                    "feat": pdf["payload"].map(lambda b: _feature_one(b, dim)),
                }
            )
            yield out

    return df.select("url", "warc_ts", "payload").mapInPandas(
        fn, MEDIA_META_SCHEMA
    )
