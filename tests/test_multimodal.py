"""Multimodal plumbing tests: schema, mapInPandas batch shapes, byte-based
re-chunking, null (delete) handling, deterministic stub decode/features."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_bqloader_spark.operators.multimodal import (
    decode_image_meta,
    make_fake_image,
    media_batch_iter,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (f"https://m/{i}", f"2024-01-01 00:00:{i:02d}",
         make_fake_image(640 + i, 480 + i, seed=i) if i % 5 else None)
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts string, payload binary"
    ).select("url", F.to_timestamp("warc_ts").alias("warc_ts"), "payload")


def test_decode_schema_and_values(spark, media_df):
    out = decode_image_meta(media_df)
    assert out.columns == [
        "url", "warc_ts", "mime", "n_bytes", "width", "height", "sha256", "feat"
    ]
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == 20
    r = rows["https://m/3"]
    assert (r["mime"], r["width"], r["height"]) == ("image/fake", 643, 483)
    assert len(r["feat"]) == 8 and all(-1.0 <= v <= 1.0 for v in r["feat"])
    # deletes (null payload) → null metadata, row preserved
    r0 = rows["https://m/0"]
    assert r0["mime"] is None and r0["feat"] is None and r0["n_bytes"] is None


def test_decode_deterministic(spark, media_df):
    a = sorted(map(str, decode_image_meta(media_df).collect()))
    b = sorted(map(str, decode_image_meta(media_df).collect()))
    assert a == b


def test_media_batch_iter_rechunks_by_bytes():
    blob = b"x" * 1000
    pdf = pd.DataFrame({"payload": [blob] * 10})
    chunks = list(media_batch_iter(iter([pdf]), max_batch_bytes=2500))
    assert sum(len(c) for c in chunks) == 10
    assert len(chunks) >= 3  # split well below a single 10-row batch
    assert all(c["payload"].map(len).sum() <= 3500 for c in chunks)


def test_unknown_payload_raises_not_implemented(spark):
    df = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", b"\x00\x01some-unknown-container")],
        "url string, warc_ts string, payload binary",
    ).select("url", F.to_timestamp("warc_ts").alias("warc_ts"), "payload")
    with pytest.raises(Exception, match="(?i)stub|NotImplemented"):
        decode_image_meta(df).collect()


def test_real_codec_path_decodes_png_without_pil(spark):
    """The real-codec branch decodes an ACTUAL PNG via the pure-stdlib
    decoder (round 3) — no imaging libs needed; features come from the
    decoded pixels, not the payload digest."""
    from go_bqloader_spark.operators.mediacodecs import encode_png

    pixels = bytes((x * 21 + c * 7) % 256 for x in range(12 * 7) for c in range(3))
    df = spark.createDataFrame(
        [("u1", None, bytearray(encode_png(12, 7, 3, pixels)))],
        "url string, warc_ts timestamp, payload binary",
    )
    row = decode_image_meta(df).collect()[0]
    assert (row["mime"], row["width"], row["height"]) == ("image/png", 12, 7)
    # feature = channel stats of the real pixels
    from go_bqloader_spark.operators.mediacodecs import channel_stats_features

    assert list(row["feat"]) == pytest.approx(
        channel_stats_features(12, 7, 3, pixels)[:8], abs=1e-6
    )


# ------------------------------------------- pure-stdlib codecs (round 3)
def _ref_filter(prev, line, ch, f):
    """Forward PNG filter (the encoder side) used to exercise unfiltering."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if f == 0:
            out[i] = line[i]
        elif f == 1:
            out[i] = (line[i] - a) & 0xFF
        elif f == 2:
            out[i] = (line[i] - b) & 0xFF
        elif f == 3:
            out[i] = (line[i] - ((a + b) >> 1)) & 0xFF
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def test_png_roundtrip_and_all_filters():
    import struct
    import zlib

    from go_bqloader_spark.operators.mediacodecs import decode_png, encode_png

    w, h, ch = 5, 5, 3
    pixels = bytes((x * 37 + 11) % 256 for x in range(w * h * ch))
    assert decode_png(encode_png(w, h, ch, pixels)) == (w, h, ch, pixels)

    # hand-build a PNG whose 5 rows use filters 0..4 — decode must invert
    stride = w * ch
    rows = [pixels[y * stride:(y + 1) * stride] for y in range(h)]
    raw, prev = b"", bytearray(stride)
    for f, line in enumerate(rows):
        raw += bytes([f]) + _ref_filter(prev, line, ch, f)
        prev = line
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, body):
        return struct.pack(">I", len(body)) + typ + body + struct.pack(
            ">I", zlib.crc32(typ + body) & 0xFFFFFFFF)

    data = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert decode_png(data) == (w, h, ch, pixels)


def test_bmp_decode_padding_and_bgr():
    import struct

    from go_bqloader_spark.operators.mediacodecs import decode_bmp

    # 3x2 24-bit bottom-up BMP, stride 12 (9 data + 3 pad)
    px_rgb = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
              (10, 20, 30), (40, 50, 60), (70, 80, 90)]
    rows = [px_rgb[0:3], px_rgb[3:6]]
    body = b""
    for row in reversed(rows):  # bottom-up
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        body += line + b"\x00" * (12 - len(line))
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(body),
                         2835, 2835, 0, 0))
    w, h, ch, out = decode_bmp(hdr + body)
    assert (w, h, ch) == (3, 2, 3)
    got = [tuple(out[i * 3:(i + 1) * 3]) for i in range(6)]
    assert got == px_rgb


def test_ppm_decode_with_comment():
    from go_bqloader_spark.operators.mediacodecs import decode_ppm

    pix = bytes(range(2 * 2 * 3))
    data = b"P6\n# a comment\n2 2\n255\n" + pix
    assert decode_ppm(data) == (2, 2, 3, pix)


def test_wav_decode_meta():
    import struct

    from go_bqloader_spark.operators.mediacodecs import decode_wav_meta

    samples = [0, 16384, -16384, 32767, -32768, 0, 8192, -8192]  # 4 stereo frames
    body = struct.pack("<8h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    data = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)
    m = decode_wav_meta(data)
    assert (m["sample_rate"], m["n_channels"], m["bits"], m["n_frames"]) == (8000, 2, 16, 4)
    assert m["duration_ms"] == 0  # 4 frames @ 8kHz = 0.5ms → floors to 0
    want = sum(abs(s) for s in samples) / len(samples) / 32768.0
    assert m["mean_abs"] == pytest.approx(want)


def test_audio_meta_mapinpandas(spark):
    import struct

    from go_bqloader_spark.operators.multimodal import decode_audio_meta

    body = struct.pack("<4h", 1000, -1000, 2000, -2000)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(body)) + body)
    df = spark.createDataFrame(
        [("a", None, bytearray(wav)), ("b", None, bytearray(b"not audio")),
         ("c", None, None)],
        "url string, warc_ts timestamp, payload binary",
    )
    rows = {r["url"]: r for r in decode_audio_meta(df).collect()}
    assert rows["a"]["mime"] == "audio/wav" and rows["a"]["sample_rate"] == 16000
    assert rows["a"]["n_channels"] == 1 and rows["a"]["sha256"] is not None
    assert rows["b"]["mime"] is None and rows["b"]["n_bytes"] == 9
    assert rows["c"]["mime"] is None and rows["c"]["n_bytes"] is None


# ---------------------------------------------- baseline JPEG (round 4)
def test_jpeg_structural_invariants():
    """Encoder and decoder share ZIGZAG/_M, so a transposed table would
    self-cancel in roundtrips — assert the tables independently."""
    import numpy as np

    from go_bqloader_spark.operators.jpegcodec import ZIGZAG, _M

    assert sorted(ZIGZAG) == list(range(64))  # permutation
    # first diagonal walk of the T.81 zigzag
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-3:] == [55, 62, 63]
    # DCT basis is orthonormal: M @ M.T == I (so _M.T @ X @ _M inverts)
    assert np.abs(_M @ _M.T - np.eye(8)).max() < 1e-12


def test_jpeg_roundtrip_444_and_gray():
    """Near-lossless roundtrip at flat quant=1: only DCT/color rounding,
    so error <= 2/channel. Odd dims exercise partial-block replication."""
    import numpy as np

    from go_bqloader_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg, is_jpeg,
    )

    rng = np.random.default_rng(7)
    w, h = 37, 23
    x = np.linspace(0, 255, w)[None, :, None]
    y = np.linspace(0, 255, h)[:, None, None]
    img = np.clip(x * 0.5 + y * 0.5 + rng.normal(0, 8, (h, w, 3)), 0, 255).astype(
        np.uint8
    )
    data = encode_jpeg(w, h, 3, img.tobytes())
    assert is_jpeg(data)
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 3)
    out = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    g = img[..., 0]
    data = encode_jpeg(w, h, 1, g.tobytes())
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 1)
    out = np.frombuffer(px, np.uint8).reshape(h, w)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2


def test_jpeg_420_subsampling_and_byte_stuffing():
    """4:2:0 exercises the multi-block MCU + chroma upsampling path; on a
    chroma-smooth image the loss stays small. The entropy stream must
    contain FF00 stuffing at least once across fixtures (decoder unstuffs)."""
    import numpy as np

    from go_bqloader_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    w, h = 48, 32
    # luma detail, chroma smooth (gray-ish) — 4:2:0's design assumption
    base = rng.integers(0, 255, (h, w), dtype=np.uint8)
    img = np.stack([base, base, base], axis=2)
    data = encode_jpeg(w, h, 3, img.tobytes(), subsample=(2, 2))
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 3)
    out = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0
    # stuffing seen somewhere in the scan (after the last DHT segment)
    scan_start = data.rindex(b"\xff\xda")
    assert b"\xff\x00" in data[scan_start:]


def test_jpeg_arithmetic_raises():
    """Arithmetic-coded JPEG (SOF9) is the remaining documented stub —
    progressive (SOF2) now decodes (see roundtrip tests below)."""
    import struct

    import pytest as _pytest

    from go_bqloader_spark.operators.jpegcodec import decode_jpeg

    sof9 = b"\xff\xd8" + b"\xff\xc9" + struct.pack(">H", 11) + bytes(9)
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(sof9)


# ------------------------------------------- progressive JPEG (round 5)
def test_jpeg_progressive_roundtrip_444_and_gray():
    """SOF2 4-phase scan script (DC first/refine, per-comp AC first/refine
    with EOB runs) decodes near-losslessly at flat quant=1; odd dims
    exercise the component ceil-grid (non-MCU) block geometry of
    single-component AC scans (T.81 A.2.2)."""
    import numpy as np

    from go_bqloader_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg_progressive, is_jpeg,
    )

    rng = np.random.default_rng(17)
    w, h = 37, 23
    x = np.linspace(0, 255, w)[None, :, None]
    y = np.linspace(0, 255, h)[:, None, None]
    img = np.clip(x * 0.5 + y * 0.5 + rng.normal(0, 8, (h, w, 3)), 0, 255).astype(
        np.uint8
    )
    data = encode_jpeg_progressive(w, h, 3, img.tobytes())
    assert is_jpeg(data)
    assert b"\xff\xc2" in data  # really SOF2
    # 4-phase script: 2 DC scans + 3 AC-first + 3 AC-refine = 8 SOS
    assert data.count(b"\xff\xda") == 8
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 3)
    out = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    g = img[..., 0]
    data = encode_jpeg_progressive(w, h, 1, g.tobytes())
    assert data.count(b"\xff\xda") == 4  # gray: 2 DC + 1 AC first + 1 refine
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 1)
    out = np.frombuffer(px, np.uint8).reshape(h, w)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2


def test_jpeg_progressive_420_subsampling():
    """4:2:0 progressive: interleaved DC scans over multi-block MCUs but
    PER-COMPONENT AC scans over each component's own ceil grid — the two
    grids genuinely differ here, catching grid-confusion bugs."""
    import numpy as np

    from go_bqloader_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg_progressive,
    )

    rng = np.random.default_rng(19)
    w, h = 41, 29  # odd dims + subsampling: ceil grids all around
    base = rng.integers(0, 255, (h, w), dtype=np.uint8)
    img = np.stack([base, base, base], axis=2)
    data = encode_jpeg_progressive(w, h, 3, img.tobytes(), subsample=(2, 2))
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 3)
    out = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_jpeg_progressive_matches_baseline_decode():
    """Baseline and progressive encodings of the SAME image must decode to
    (near-)identical pixels — the scan script is a transport detail."""
    import numpy as np

    from go_bqloader_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(32, 24, 3, img.tobytes()))
    prog = decode_jpeg(encode_jpeg_progressive(32, 24, 3, img.tobytes()))
    assert base[:3] == prog[:3]
    a = np.frombuffer(base[3], np.uint8).astype(int)
    b = np.frombuffer(prog[3], np.uint8).astype(int)
    assert np.abs(a - b).max() <= 1  # only rounding-path differences


def test_jpeg_progressive_through_decode_image_meta(spark):
    """decode_image_meta returns REAL dimensions + pixel features for a
    progressive payload (VERDICT r4 item #6 'Done' criterion)."""
    import numpy as np

    from go_bqloader_spark.operators.jpegcodec import (
        decode_jpeg, encode_jpeg_progressive,
    )
    from go_bqloader_spark.operators.mediacodecs import channel_stats_features

    rng = np.random.default_rng(29)
    img = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(24, 16, 3, img.tobytes())
    df = spark.createDataFrame(
        [("u1", None, bytearray(payload))],
        "url string, warc_ts timestamp, payload binary",
    )
    row = decode_image_meta(df).collect()[0]
    assert (row["mime"], row["width"], row["height"]) == ("image/jpeg", 24, 16)
    w, h, ch, px = decode_jpeg(payload)
    assert list(row["feat"]) == pytest.approx(
        channel_stats_features(w, h, ch, px)[:8], abs=1e-6
    )


def test_jpeg_through_decode_image_meta(spark):
    """decode_image_meta returns REAL dimensions for a JPEG payload and
    pixel-derived features (VERDICT r3 'Done' criterion for JPEG)."""
    import numpy as np

    from go_bqloader_spark.operators.jpegcodec import decode_jpeg, encode_jpeg
    from go_bqloader_spark.operators.mediacodecs import channel_stats_features

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    payload = encode_jpeg(24, 16, 3, img.tobytes())
    df = spark.createDataFrame(
        [("u1", None, bytearray(payload))],
        "url string, warc_ts timestamp, payload binary",
    )
    row = decode_image_meta(df).collect()[0]
    assert (row["mime"], row["width"], row["height"]) == ("image/jpeg", 24, 16)
    # features come from the DECODED pixels
    w, h, ch, px = decode_jpeg(payload)
    assert list(row["feat"]) == pytest.approx(
        channel_stats_features(w, h, ch, px)[:8], abs=1e-6
    )


# ----------------------------------------------- MP4 container (round 4)
def test_mp4_meta_roundtrip_and_edge_boxes():
    from go_bqloader_spark.operators.mediacodecs import (
        decode_mp4_meta, is_mp4, write_mp4_skeleton,
    )

    d = write_mp4_skeleton(1920, 1080, 90000, brand=b"mp42", with_audio=True)
    assert is_mp4(d)
    m = decode_mp4_meta(d)
    assert m == {"brand": "mp42", "duration_ms": 90000, "n_tracks": 2,
                 "width": 1920, "height": 1080, "has_video": True,
                 "has_audio": True}
    # video-only, zero duration
    m2 = decode_mp4_meta(write_mp4_skeleton(320, 240, 0))
    assert (m2["width"], m2["height"], m2["has_audio"]) == (320, 240, False)
    # non-MP4 rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_mp4_meta(b"\x00" * 32)


def _mjpeg_avi(n_frames=6, size=16, fps=10, progressive_at=None):
    """n_frames solid-gray JPEGs (frame i has pixel value i*40) in an
    MJPEG AVI; optionally one frame encoded progressive (SOF2)."""
    import numpy as np

    from go_bqloader_spark.operators.jpegcodec import (
        encode_jpeg, encode_jpeg_progressive,
    )
    from go_bqloader_spark.operators.mediacodecs import write_avi_mjpeg

    frames = []
    for i in range(n_frames):
        px = np.full((size, size, 3), i * 40, dtype=np.uint8).tobytes()
        enc = (encode_jpeg_progressive if i == progressive_at
               else encode_jpeg)
        frames.append(enc(size, size, 3, px))
    return write_avi_mjpeg(frames, size, size, fps=fps), frames


def test_avi_mjpeg_container_roundtrip():
    from go_bqloader_spark.operators.jpegcodec import decode_jpeg
    from go_bqloader_spark.operators.mediacodecs import (
        decode_avi_meta, is_avi, iter_avi_frames,
    )

    avi, frames = _mjpeg_avi(n_frames=5, size=16, fps=25)
    assert is_avi(avi) and not is_avi(b"RIFF\x04\x00\x00\x00WAVE")
    m = decode_avi_meta(avi)
    assert (m["n_frames"], m["width"], m["height"]) == (5, 16, 16)
    assert m["micro_per_frame"] == 40000 and m["duration_ms"] == 200
    assert m["handlers"] == [("vids", "MJPG")] and m["has_video"]
    got = list(iter_avi_frames(avi))
    assert got == frames  # byte-exact chunk extraction, odd sizes padded
    w, h, _ch, _px = decode_jpeg(got[3])
    assert (w, h) == (16, 16)
    with pytest.raises(ValueError):
        decode_avi_meta(b"\x00" * 32)
    # truncated container: the RIFF walk stops, no raise
    assert list(iter_avi_frames(avi[: len(avi) // 2])) != frames


def test_video_meta_mapinpandas(spark):
    from go_bqloader_spark.operators.mediacodecs import write_mp4_skeleton
    from go_bqloader_spark.operators.multimodal import decode_video_meta

    avi, _ = _mjpeg_avi(n_frames=4, size=16, fps=10)
    rows = [
        ("u1", None, bytearray(write_mp4_skeleton(640, 360, 12500,
                                                  with_audio=True))),
        ("u2", None, bytearray(b"not a video at all")),
        ("u3", None, None),  # tombstone
        ("u4", None, bytearray(avi)),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, payload binary"
    )
    out = {r["url"]: r for r in decode_video_meta(df).collect()}
    assert (out["u1"]["mime"], out["u1"]["width"], out["u1"]["height"],
            out["u1"]["duration_ms"], out["u1"]["has_audio"]) == (
        "video/mp4", 640, 360, 12500, True)
    assert out["u2"]["mime"] is None and out["u2"]["n_bytes"] == 18
    assert out["u3"]["mime"] is None and out["u3"]["n_bytes"] is None
    assert (out["u4"]["mime"], out["u4"]["brand"], out["u4"]["width"],
            out["u4"]["duration_ms"], out["u4"]["has_video"],
            out["u4"]["n_tracks"]) == (
        "video/x-msvideo", "MJPG", 16, 400, True, 1)


def test_sample_video_frames_real_decode(spark):
    """MJPEG-AVI frames decode for real: time-strided sampling, correct
    per-frame timestamps, and features computed from the decoded pixels
    (frame i is solid gray i*40 → feature mean tracks it). MP4 (no H.264
    decoder) and poison payloads yield zero rows, not task failures."""
    from go_bqloader_spark.operators.mediacodecs import write_mp4_skeleton
    from go_bqloader_spark.operators.multimodal import sample_video_frames

    # one frame progressive — both T.81 paths feed the video pipeline
    avi, _ = _mjpeg_avi(n_frames=6, size=16, fps=10, progressive_at=3)
    rows = [
        ("v1", None, bytearray(avi)),
        ("v2", None, bytearray(write_mp4_skeleton(320, 240, 5000))),
        ("v3", None, bytearray(avi[:40])),  # truncated AVI
        ("v4", None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, payload binary"
    )
    # 10 fps → 100 ms/frame; every 300 ms → stride 3 → frames 0 and 3
    out = sample_video_frames(df, every_ms=300).collect()
    assert {r["url"] for r in out} == {"v1"}
    by_idx = {r["frame_idx"]: r for r in out}
    assert sorted(by_idx) == [0, 3]
    assert by_idx[0]["t_ms"] == 0 and by_idx[3]["t_ms"] == 300
    assert by_idx[3]["width"] == 16 and by_idx[3]["height"] == 16
    # feat[0] is the first-channel mean scaled to [-1,1]: frame 0 (solid
    # 0) ≈ -1, frame 3 (solid 120) ≈ 120/255*2-1 (flat-quant fixture
    # JPEG is near-lossless)
    assert abs(by_idx[0]["feat"][0] - (-1.0)) < 0.02
    assert abs(by_idx[3]["feat"][0] - (120 / 255 * 2 - 1)) < 0.02
    # every_ms below the frame period keeps every frame
    assert len(sample_video_frames(df, every_ms=50).collect()) == 6


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn path: encoder emits restart markers every 2 MCUs (DC
    predictors reset, byte-aligned); decoder resynchronizes and the image
    still roundtrips near-losslessly."""
    import numpy as np

    from go_bqloader_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(13)
    w, h = 40, 24  # 5x3 = 15 MCUs at 4:4:4 → 7 RST markers
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    data = encode_jpeg(w, h, 3, img.tobytes(), restart_interval=2)
    assert b"\xff\xdd" in data          # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))  # RSTn
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 3)
    out = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    # and combined with 4:2:0 subsampling (multi-block MCUs)
    base = rng.integers(0, 255, (h, w), dtype=np.uint8)
    gray3 = np.stack([base] * 3, axis=2)
    d2 = encode_jpeg(w, h, 3, gray3.tobytes(), subsample=(2, 2),
                     restart_interval=3)
    dw, dh, ch, px = decode_jpeg(d2)
    out = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert np.abs(out.astype(int) - gray3.astype(int)).mean() < 3.0
