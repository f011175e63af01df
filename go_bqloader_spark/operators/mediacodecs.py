"""Pure-stdlib media codecs for the multimodal pipeline.

This container ships no imaging/audio libraries, but several real formats
are decodable with nothing beyond ``struct`` + ``zlib`` (both stdlib), all
implemented here from the public specs:

- **PNG** (RFC 2083): full pixel decode — chunk walk, IDAT concat, zlib
  inflate, per-scanline unfilter (None/Sub/Up/Average/Paeth). Bit depth 8,
  color types 0/2/6, non-interlaced — the shapes a crawler actually emits
  for screenshots/thumbnails. Includes a minimal encoder so tests can
  fabricate deterministic fixtures.
- **BMP** (BITMAPINFOHEADER): uncompressed 24/32-bit bottom-up decode.
- **PPM** (netpbm P6): binary RGB decode.
- **WAV** (RIFF PCM): fmt/data chunk walk → sample rate, channels,
  duration, plus mean-absolute-amplitude over PCM16 samples.

- **AVI** (RIFF, [MS] AVI RIFF File Reference): container metadata walk
  plus Motion-JPEG frame extraction — each ``00dc`` chunk of a
  ``vids``/``MJPG`` stream is one complete JPEG, decoded for real by
  ``operators/jpegcodec.py``.

These are the REAL codec paths behind ``operators/multimodal.py`` (the
reference engine has no media handling at all; this is part of the
training-data-pipeline surface). Formats needing external decoders
(arithmetic-coded JPEG, H.264/H.265 video) still raise the documented
``NotImplementedError`` or yield no rows upstream.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _PNG_SIG


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, n_channels, raw pixels row-major). Supports bit
    depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
    non-interlaced."""
    if not is_png(data):
        raise ValueError("not a PNG")
    pos, idat, meta = 8, b"", None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG shape (depth={depth}, color={ctype}, "
                    f"interlace={interlace})"
                )
            meta = (w, h, _CHANNELS[ctype])
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + crc
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, ch = meta
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal encoder (filter 0 rows, one IDAT) for test fixtures."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def is_bmp(data: bytes) -> bool:
    return data[:2] == b"BM"


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP → (w, h, ch, pixels
    top-down row-major, BGR(A) reordered to RGB(A))."""
    if not is_bmp(data):
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if hdr_size < 40 or comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (hdr={hdr_size}, comp={comp}, bpp={bpp})")
    ch = bpp // 8
    flip = h > 0
    h = abs(h)
    stride = (w * ch + 3) & ~3
    out = bytearray(w * h * ch)
    for row in range(h):
        src_y = (h - 1 - row) if flip else row
        line = data[off + src_y * stride : off + src_y * stride + w * ch]
        for x in range(w):
            px = line[x * ch : (x + 1) * ch]
            dst = (row * w + x) * ch
            out[dst] = px[2]      # B,G,R(,A) → R,G,B(,A)
            out[dst + 1] = px[1]
            out[dst + 2] = px[0]
            if ch == 4:
                out[dst + 3] = px[3]
    return w, h, ch, bytes(out)


def is_ppm(data: bytes) -> bool:
    return data[:2] == b"P6"


def decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """Binary netpbm P6 → (w, h, 3, RGB pixels)."""
    if not is_ppm(data):
        raise ValueError("not a P6 PPM")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    pix = data[pos : pos + need]
    if len(pix) < need:
        raise ValueError("PPM pixel data truncated")
    return w, h, 3, pix


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav_meta(data: bytes) -> dict:
    """RIFF PCM WAV → {sample_rate, n_channels, bits, n_frames,
    duration_ms, mean_abs (PCM16 only)}."""
    if not is_wav(data):
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    body = None
    while pos + 8 <= len(data):
        cid, ln = struct.unpack_from("<4sI", data, pos)
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", data, pos + 8)
            bits = struct.unpack_from("<H", data, pos + 22)[0]
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV codec {audio_fmt} (PCM only)")
            fmt = (n_ch, rate, bits)
        elif cid == b"data":
            body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    if fmt is None or body is None:
        raise ValueError("WAV missing fmt/data chunk")
    n_ch, rate, bits = fmt
    frame = n_ch * (bits // 8)
    n_frames = len(body) // frame if frame else 0
    meta = {
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits": bits,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 / rate) if rate else 0,
    }
    if bits == 16 and n_frames:
        n = len(body) // 2
        samples = struct.unpack(f"<{n}h", body[: n * 2])
        meta["mean_abs"] = sum(abs(s) for s in samples) / n / 32768.0
    return meta


def channel_stats_features(w: int, h: int, ch: int, pixels: bytes) -> list[float]:
    """8-dim REAL image feature from decoded pixels: per-channel mean and
    spread (first 3 channels), log-area, aspect — a deterministic stand-in
    with actual signal, unlike a payload-hash embedding."""
    import math

    n = w * h
    feats: list[float] = []
    for c in range(3):
        if c < ch:
            vals = pixels[c::ch]
            mean = sum(vals) / n
            var = sum((v - mean) ** 2 for v in vals) / n
            feats += [mean / 255.0 * 2 - 1, math.sqrt(var) / 128.0 - 1]
        else:
            feats += [0.0, 0.0]
    feats.append(math.tanh(math.log10(max(n, 1)) / 4))
    feats.append(math.tanh(w / max(h, 1) - 1))
    return feats


# ----------------------------------------------------- MP4 (ISO BMFF) meta
def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        typ = data[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            break
        yield typ, body, pos + size
        pos += size


def decode_mp4_meta(data: bytes) -> dict:
    """Container-level metadata from the public ISO/IEC 14496-12 box
    structure: brand, duration (mvhd), per-track handler + video WxH
    (tkhd 16.16 fixed point). FRAME decode needs an H.264/H.265 decoder
    (absent here), so MP4 payloads yield no rows from
    ``sample_video_frames`` — MJPEG-AVI is the frame-decodable container
    (see ``iter_avi_frames``)."""
    if not is_mp4(data):
        raise ValueError("not an ISO-BMFF/MP4 container")
    meta = {"brand": None, "duration_ms": None, "n_tracks": 0,
            "width": None, "height": None, "has_video": False,
            "has_audio": False}
    for typ, b, e in _walk_boxes(data, 0, len(data)):
        if typ == b"ftyp":
            meta["brand"] = data[b : b + 4].decode("latin-1")
        elif typ == b"moov":
            for t2, b2, e2 in _walk_boxes(data, b, e):
                if t2 == b"mvhd":
                    ver = data[b2]
                    if ver == 1:
                        ts, dur = struct.unpack_from(">IQ", data, b2 + 20)
                    else:
                        ts, dur = struct.unpack_from(">II", data, b2 + 12)
                    if ts:
                        meta["duration_ms"] = int(dur * 1000 // ts)
                elif t2 == b"trak":
                    meta["n_tracks"] += 1
                    for t3, b3, e3 in _walk_boxes(data, b2, e2):
                        if t3 == b"tkhd":
                            ver = data[b3]
                            off = b3 + (96 if ver == 1 else 84) - 8
                            w, h = struct.unpack_from(">II", data, off)
                            if w and h:  # 16.16 fixed; audio tracks are 0x0
                                meta["width"] = w >> 16
                                meta["height"] = h >> 16
                        elif t3 == b"mdia":
                            for t4, b4, _e4 in _walk_boxes(data, b3, e3):
                                if t4 == b"hdlr":
                                    handler = data[b4 + 8 : b4 + 12]
                                    if handler == b"vide":
                                        meta["has_video"] = True
                                    elif handler == b"soun":
                                        meta["has_audio"] = True
    return meta


def write_mp4_skeleton(
    width: int, height: int, duration_ms: int, brand: bytes = b"isom",
    with_audio: bool = False,
) -> bytes:
    """Minimal valid ISO-BMFF box tree (ftyp + moov[mvhd, trak...]) for
    fixtures — structure only, no media data (same fixture-writer
    discipline as write_xls / encode_png / encode_jpeg)."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    ts = 1000
    mvhd = box(b"mvhd", bytes(4) + struct.pack(">IIII", 0, 0, ts, duration_ms)
               + bytes(80))
    def trak(handler: bytes, w: int, h: int) -> bytes:
        tkhd = box(b"tkhd", bytes(4) + bytes(72)
                   + struct.pack(">II", w << 16, h << 16))
        hdlr = box(b"hdlr", bytes(8) + handler + bytes(12) + b"\x00")
        mdia = box(b"mdia", hdlr)
        return box(b"trak", tkhd + mdia)

    traks = trak(b"vide", width, height)
    if with_audio:
        traks += trak(b"soun", 0, 0)
    moov = box(b"moov", mvhd + traks)
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + b"isomiso2")
    return ftyp + moov


# ---------------------------------------------------------------------------
# AVI (RIFF) — Motion-JPEG video, from the public AVI RIFF File Reference
# ([MS] AVI RIFF spec / OpenDML). A 'vids'/'MJPG' stream is a sequence of
# '00dc' chunks each holding one complete T.81 JPEG image, so the existing
# from-spec decoder in ``operators/jpegcodec.py`` decodes real frames —
# this is the one video container where frame sampling needs no external
# codec. (The reference engine has no media handling; this is part of the
# training-data-pipeline surface, like the image/audio codecs above.)


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _walk_riff(data: bytes, start: int, end: int):
    """Yield ``(fourcc, list_type, body_start, body_end)`` for each RIFF
    chunk in ``data[start:end)``. ``LIST``/``RIFF`` chunks carry their
    4-byte list type (body range excludes it); plain chunks yield None.
    Chunks pad to even size; a truncated chunk terminates the walk rather
    than raising (poison-row discipline — crawled media is often cut)."""
    pos = start
    while pos + 8 <= end:
        fcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body0, body1 = pos + 8, pos + 8 + size
        if body1 > end:
            return
        if fcc in (b"RIFF", b"LIST") and size >= 4:
            yield fcc, data[body0:body0 + 4], body0 + 4, body1
        else:
            yield fcc, None, body0, body1
        pos = body1 + (size & 1)


def decode_avi_meta(data: bytes) -> dict:
    """AVI container metadata: MainAVIHeader (``avih``) frame timing and
    dimensions plus per-stream ``strh`` types/handlers. Raises ValueError
    on non-AVI input (mirrors ``decode_mp4_meta``)."""
    if not is_avi(data):
        raise ValueError("not an AVI (RIFF) payload")
    meta = {
        "micro_per_frame": 0, "n_frames": 0, "width": None, "height": None,
        "n_streams": 0, "handlers": [], "has_video": False,
        "has_audio": False, "duration_ms": 0,
    }
    for fcc, lt, b0, b1 in _walk_riff(data, 12, len(data)):
        if fcc != b"LIST" or lt != b"hdrl":
            continue
        for c2, l2, c0, c1 in _walk_riff(data, b0, b1):
            if c2 == b"avih" and c1 - c0 >= 40:
                (mpf, _mbps, _pad, _flags, nfr, _init, nstr, _sug,
                 w, h) = struct.unpack("<10I", data[c0:c0 + 40])
                meta.update(micro_per_frame=mpf, n_frames=nfr,
                            n_streams=nstr, width=w, height=h,
                            duration_ms=int(mpf * nfr / 1000))
            elif c2 == b"LIST" and l2 == b"strl":
                for c3, _l3, d0, d1 in _walk_riff(data, c0, c1):
                    if c3 == b"strh" and d1 - d0 >= 8:
                        ftype = data[d0:d0 + 4].decode("ascii", "replace")
                        hdl = data[d0 + 4:d0 + 8].decode("ascii", "replace")
                        meta["handlers"].append((ftype, hdl))
                        if ftype == "vids":
                            meta["has_video"] = True
                        elif ftype == "auds":
                            meta["has_audio"] = True
    return meta


def iter_avi_frames(data: bytes):
    """Yield the raw bytes of each video frame chunk (``##dc``/``##db``)
    in the ``movi`` list, in stream order; grouped ``rec ``-list records
    are walked recursively. For an MJPG stream each yielded value is one
    complete JPEG."""

    def walk_movi(start: int, end: int):
        for fcc, lt, b0, b1 in _walk_riff(data, start, end):
            if fcc == b"LIST" and lt == b"rec ":
                yield from walk_movi(b0, b1)
            elif fcc[2:4] in (b"dc", b"db"):
                yield data[b0:b1]

    for fcc, lt, b0, b1 in _walk_riff(data, 12, len(data)):
        if fcc == b"LIST" and lt == b"movi":
            yield from walk_movi(b0, b1)


def write_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10,
) -> bytes:
    """Fixture-grade Motion-JPEG AVI: RIFF('AVI ') with hdrl(avih +
    strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)), a movi list of
    ``00dc`` chunks (one JPEG per frame, from ``encode_jpeg``/
    ``encode_jpeg_progressive``), and an idx1 index — the layout real
    MJPEG recorders emit. Same fixture-writer discipline as
    ``write_mp4_skeleton``."""

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    mpf = int(round(1_000_000 / fps))
    max_size = max((len(f) for f in frames), default=0)
    avih = chunk(b"avih", struct.pack(
        "<10I", mpf, 0, 0, 0x10, len(frames), 0, 1, max_size, width, height,
    ) + bytes(16))
    strh = chunk(b"strh", b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), max_size,
        0xFFFFFFFF, 0,
    ) + struct.pack("<4H", 0, 0, width, height))
    strf = chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    ))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi_body = b""
    idx = b""
    for f in frames:
        # idx1 offsets are relative to the 'movi' list-type fourcc
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body), len(f))
        movi_body += chunk(b"00dc", f)
    movi = lst(b"movi", movi_body)
    idx1 = chunk(b"idx1", idx)
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
