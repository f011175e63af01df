"""Multimodal (image/audio/video) column plumbing for the ingest pipeline.

Media payloads ride the same change-event rows as html: an opaque
``binary`` column plus typed metadata (mime, width/height, duration). The
Spark-side machinery — schema, partition-preserving ``mapInPandas``, Arrow
batch shapes, null/delete handling — is real, and so is the codec work for
the formats stdlib can express: PNG (full zlib+unfilter pixel decode), BMP,
PPM, and PCM WAV all decode via ``operators/mediacodecs.py`` with no
external libraries, and baseline + progressive JPEG decode via the
from-spec T.81 codec (``operators/jpegcodec.py``); image features come
from the decoded pixels; video frame sampling decodes REAL frames for
Motion-JPEG AVI (each ``00dc`` chunk is a T.81 JPEG). The deterministic
FAKEIMG header remains for datagen; formats that require external
decoders (arithmetic-coded JPEG, H.264/H.265 video) raise the documented
NotImplementedError or yield no frame rows — swapping in PIL/libsndfile
is a one-function change and nothing about the distributed plan moves.

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
    """Decode one payload. Real pure-stdlib codecs handle PNG / BMP / PPM
    (``operators/mediacodecs.py`` — full pixel decode, not just headers);
    the deterministic FAKEIMG header serves datagen/tests; PIL is used for
    other formats when available; otherwise the documented
    NotImplementedError (e.g. arithmetic-coded JPEG). The
    surrounding distributed plan is identical in every case."""
    from go_bqloader_spark.operators import mediacodecs as mc

    if payload is None:
        return None, None, None
    if payload.startswith(_MAGIC):
        w, h = struct.unpack("<II", payload[len(_MAGIC) : len(_MAGIC) + 8])
        return "image/fake", int(w), int(h)
    if mc.is_png(payload):
        w, h, _ch, _px = mc.decode_png(payload)
        return "image/png", w, h
    if mc.is_bmp(payload):
        w, h, _ch, _px = mc.decode_bmp(payload)
        return "image/bmp", w, h
    if mc.is_ppm(payload):
        w, h, _ch, _px = mc.decode_ppm(payload)
        return "image/x-portable-pixmap", w, h
    from go_bqloader_spark.operators import jpegcodec as jc

    if jc.is_jpeg(payload):
        try:
            w, h, _ch, _px = jc.decode_jpeg(payload)
            return "image/jpeg", w, h
        except NotImplementedError:
            # variants the built-in codec doesn't cover (e.g. arithmetic
            # coding) fall through to PIL when present — matching
            # _feature_one's handling (ADVICE r4: an uncaught raise here
            # failed the whole mapInPandas batch and made the PIL path
            # unreachable)
            pass
    if _PILImage is not None:
        import io

        with _PILImage.open(io.BytesIO(payload)) as img:
            fmt = (img.format or "unknown").lower()
            return f"image/{fmt}", int(img.width), int(img.height)
    raise NotImplementedError(
        "no codec for this payload (built-in codecs cover PNG/BMP/PPM/"
        "baseline+progressive JPEG; arithmetic-coded JPEG and video need "
        "external decoders absent in this environment)"
    )


def _feature_one(payload: bytes | None, dim: int = 8) -> list[float] | None:
    """Feature extractor: for payloads our codecs fully decode (PNG / BMP /
    PPM / baseline+progressive JPEG) the embedding is computed from the
    REAL pixels
    (per-channel mean/spread + shape — ``channel_stats_features``);
    otherwise a deterministic digest-based pseudo-embedding stands in for
    a vision encoder. Both are 8-dim, deterministic, and shuffle nothing
    wide."""
    from go_bqloader_spark.operators import jpegcodec as jc
    from go_bqloader_spark.operators import mediacodecs as mc

    if payload is None:
        return None
    try:
        if mc.is_png(payload):
            return mc.channel_stats_features(*mc.decode_png(payload))[:dim]
        if mc.is_bmp(payload):
            return mc.channel_stats_features(*mc.decode_bmp(payload))[:dim]
        if mc.is_ppm(payload):
            return mc.channel_stats_features(*mc.decode_ppm(payload))[:dim]
        if jc.is_jpeg(payload):
            return mc.channel_stats_features(*jc.decode_jpeg(payload))[:dim]
    except (ValueError, NotImplementedError):
        pass  # unsupported shape → digest fallback below
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


AUDIO_META_SCHEMA = (
    "url string, warc_ts timestamp, mime string, n_bytes int, "
    "sample_rate int, n_channels int, duration_ms int, mean_abs double, "
    "sha256 string"
)


def decode_audio_meta(df: DataFrame) -> DataFrame:
    """Audio analog of :func:`decode_image_meta`: PCM WAV payloads decode
    for real (RIFF chunk walk + PCM16 amplitude stats, stdlib only); other
    containers yield NULL metadata rather than failing the batch (a 100 TB
    crawl always carries undecodable tails — poison rows must not kill
    tasks). Same rules: payload parsed where it was read, never shuffled;
    output is narrow."""
    from go_bqloader_spark.operators.mediacodecs import decode_wav_meta, is_wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in media_batch_iter(batches):
            metas = []
            for b in pdf["payload"]:
                if b is not None and is_wav(bytes(b)):
                    try:
                        metas.append(decode_wav_meta(bytes(b)))
                        continue
                    except ValueError:
                        pass
                metas.append(None)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "mime": ["audio/wav" if m else None for m in metas],
                    "n_bytes": pdf["payload"].map(
                        lambda b: None if b is None else len(b)
                    ),
                    "sample_rate": [m["sample_rate"] if m else None for m in metas],
                    "n_channels": [m["n_channels"] if m else None for m in metas],
                    "duration_ms": [m["duration_ms"] if m else None for m in metas],
                    "mean_abs": [m.get("mean_abs") if m else None for m in metas],
                    "sha256": pdf["payload"].map(
                        lambda b: None if b is None else hashlib.sha256(b).hexdigest()
                    ),
                }
            )

    return df.select("url", "warc_ts", "payload").mapInPandas(
        fn, AUDIO_META_SCHEMA
    )


VIDEO_META_SCHEMA = (
    "url string, warc_ts timestamp, mime string, n_bytes int, brand string, "
    "duration_ms int, width int, height int, n_tracks int, "
    "has_video boolean, has_audio boolean, sha256 string"
)


def decode_video_meta(df: DataFrame) -> DataFrame:
    """Video analog of :func:`decode_image_meta`: ISO-BMFF/MP4 containers
    yield REAL metadata (ftyp brand, mvhd duration, tkhd dimensions,
    per-track handlers — public ISO/IEC 14496-12 box walk, stdlib only),
    and RIFF/AVI containers yield MainAVIHeader + per-stream metadata
    (``mime`` ``video/x-msvideo``, ``brand`` = the video stream's handler
    fourcc, e.g. ``MJPG``); other payloads yield NULL metadata rather
    than failing the batch. Same plumbing rules as images: payload parsed
    where it was read, never shuffled; output narrow."""
    from go_bqloader_spark.operators.mediacodecs import (
        decode_avi_meta, decode_mp4_meta, is_avi, is_mp4,
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in media_batch_iter(batches):
            metas = []
            for b in pdf["payload"]:
                if b is not None and is_mp4(bytes(b)):
                    try:
                        metas.append(decode_mp4_meta(bytes(b)))
                        continue
                    except ValueError:
                        pass
                if b is not None and is_avi(bytes(b)):
                    try:
                        a = decode_avi_meta(bytes(b))
                        vids = [h for t, h in a["handlers"] if t == "vids"]
                        metas.append({
                            "mime": "video/x-msvideo",
                            "brand": vids[0] if vids else None,
                            "duration_ms": a["duration_ms"],
                            "width": a["width"], "height": a["height"],
                            "n_tracks": a["n_streams"],
                            "has_video": a["has_video"],
                            "has_audio": a["has_audio"],
                        })
                        continue
                    except ValueError:
                        pass
                metas.append(None)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "mime": [
                        m.get("mime", "video/mp4") if m else None
                        for m in metas
                    ],
                    "n_bytes": pdf["payload"].map(
                        lambda b: None if b is None else len(b)
                    ),
                    "brand": [m["brand"] if m else None for m in metas],
                    "duration_ms": [m["duration_ms"] if m else None for m in metas],
                    "width": [m["width"] if m else None for m in metas],
                    "height": [m["height"] if m else None for m in metas],
                    "n_tracks": [m["n_tracks"] if m else None for m in metas],
                    "has_video": [m["has_video"] if m else None for m in metas],
                    "has_audio": [m["has_audio"] if m else None for m in metas],
                    "sha256": pdf["payload"].map(
                        lambda b: None if b is None else hashlib.sha256(b).hexdigest()
                    ),
                }
            )

    return df.select("url", "warc_ts", "payload").mapInPandas(
        fn, VIDEO_META_SCHEMA
    )


VIDEO_FRAME_SCHEMA = (
    "url string, warc_ts timestamp, frame_idx int, t_ms int, width int, "
    "height int, sha256 string, feat array<float>"
)


def sample_video_frames(df: DataFrame, every_ms: int = 1000,
                        dim: int = 8) -> DataFrame:
    """Time-strided frame sampling with REAL pixel decode for Motion-JPEG
    AVI — each ``00dc`` chunk of a RIFF ``vids``/``MJPG`` stream is one
    complete T.81 JPEG, so ``operators/jpegcodec.py`` decodes actual
    frames with no external codec. One output row per sampled frame:
    the frame's index, its timestamp from the container's
    ``dwMicroSecPerFrame``, decoded dimensions, a content hash, and the
    per-channel pixel-stats feature vector (same encoder the image path
    uses).

    Sampling picks every ``ceil(every_ms / frame_period)``-th frame (at
    least stride 1), so ``every_ms=1000`` on a 10 fps stream keeps frames
    0, 10, 20, … — only SAMPLED frames are Huffman-decoded; skipped
    frames cost one RIFF header read.

    Payloads in containers that need external codecs (MP4/H.264, VP9, …)
    and undecodable/truncated payloads yield zero frame rows rather than
    failing the batch (poison-row discipline; container-level metadata
    for MP4 still comes from :func:`decode_video_meta`). Same 100 TB
    rules as the image path: frames are decoded where the payload was
    read via ``mapInPandas``, only narrow derived columns come out, and
    the media bytes never cross a shuffle."""
    from go_bqloader_spark.operators import jpegcodec as jc
    from go_bqloader_spark.operators import mediacodecs as mc

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in media_batch_iter(batches):
            rows: dict[str, list] = {
                "url": [], "warc_ts": [], "frame_idx": [], "t_ms": [],
                "width": [], "height": [], "sha256": [], "feat": [],
            }
            for url, ts, payload in zip(
                pdf["url"], pdf["warc_ts"], pdf["payload"]
            ):
                if payload is None:
                    continue
                b = bytes(payload)
                if not mc.is_avi(b):
                    continue
                try:
                    meta = mc.decode_avi_meta(b)
                except ValueError:
                    continue
                period_ms = meta["micro_per_frame"] / 1000.0
                stride = (
                    max(1, -(-every_ms // max(period_ms, 1e-9)))
                    if period_ms > 0 else 1
                )
                for i, frame in enumerate(mc.iter_avi_frames(b)):
                    if i % int(stride):
                        continue
                    try:
                        w, h, ch, px = jc.decode_jpeg(frame)
                    except (ValueError, NotImplementedError):
                        continue  # poison frame: skip it, keep the rest
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    rows["frame_idx"].append(i)
                    rows["t_ms"].append(int(i * period_ms))
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["sha256"].append(hashlib.sha256(frame).hexdigest())
                    rows["feat"].append(
                        mc.channel_stats_features(w, h, ch, px)[:dim]
                    )
            # explicit dtypes: an all-skipped batch must still emit
            # Arrow-castable empty columns (a bare empty DataFrame
            # defaults to float64, which can't cast to timestamp)
            yield pd.DataFrame({
                "url": pd.Series(rows["url"], dtype="object"),
                "warc_ts": pd.Series(rows["warc_ts"],
                                     dtype="datetime64[us]"),
                "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                "t_ms": pd.Series(rows["t_ms"], dtype="int32"),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "sha256": pd.Series(rows["sha256"], dtype="object"),
                "feat": pd.Series(rows["feat"], dtype="object"),
            })

    return df.select("url", "warc_ts", "payload").mapInPandas(
        fn, VIDEO_FRAME_SCHEMA
    )
