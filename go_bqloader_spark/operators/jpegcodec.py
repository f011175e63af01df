"""Baseline-sequential JPEG codec (ITU-T T.81), numpy + stdlib only.

The container ships no imaging libraries, so — same discipline as the
BIFF8 reader (``sources/xlsbiff.py``) and the PNG/BMP/PPM/WAV codecs
(``operators/mediacodecs.py``) — the most common crawl image format is
implemented from the public spec:

- **decoder**: baseline DCT (SOF0) and PROGRESSIVE DCT (SOF2, T.81
  Annex G: spectral selection + successive approximation — DC
  first/refine, AC first/refine with EOB runs), 8-bit precision,
  grayscale or YCbCr, arbitrary DHT/DQT tables (every JPEG embeds its
  own), subsampling factors 1-2 per axis (covers 4:4:4 / 4:2:2 / 4:2:0),
  restart intervals (DRI/RSTn), byte-stuffing (FF00). Arithmetic coding
  (SOF9-11) and lossless/hierarchical modes raise — genuinely out of
  scope (patent-era variants crawls essentially never carry).
- **encoder** (fixture writer): 4:4:4 / 4:2:0 / grayscale, flat
  quantization, and SELF-DEFINED canonical Huffman tables (every symbol
  at a fixed 9-bit code): T.81 lets the DHT segment carry any valid
  canonical table, so fixtures exercise the decoder's generic table
  builder without transcribing the Annex K example tables. The
  progressive fixture writer (``encode_jpeg_progressive``) emits the
  standard 4-phase scan script (DC first Al=1 → DC refine → per-comp AC
  first Al=1 → per-comp AC refine) with cross-block EOB runs and
  buffered correction bits, exercising every Annex-G decode path.

Lossy roundtrip: with flat quant=1 the error is only DCT float rounding,
so ``decode(encode(img))`` matches within ±2/channel — what the fixture
tests assert. Per-pixel work runs in numpy (already a hard dependency of
the Arrow/pandas UDF path); the bit-level entropy decode is pure Python —
fine for fixture-sized images and correctness-grade decode inside
``mapInPandas``; a production hot path would swap in a vectorized scan.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# 8x8 DCT-II basis matrix: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


# ------------------------------------------------------------------ decode
class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 byte
    stuffing; stops at any real marker (FFxx, xx not in {00, D0-D7})."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None:
                self.bits = (self.bits << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad past the marker (EOB territory)
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bits = ((self.bits << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker and realign to the next byte.

        Buffered-but-unhanded bits are always pre-marker padding (the
        filler stops consuming at any marker), so they are dropped;
        remaining padding BYTES before the marker (including a stuffed
        0xFF00 produced by an all-ones padded byte) are skipped."""
        self.bits = 0
        self.nbits = 0
        self.marker = None
        d = self.data
        while True:
            if d[self.pos] == 0xFF:
                nxt = d[self.pos + 1]
                if 0xD0 <= nxt <= 0xD7:
                    self.pos += 2
                    return
                if nxt == 0x00:  # stuffed padding byte
                    self.pos += 2
                    continue
                raise ValueError(f"expected RSTn, found marker {nxt:#x}")
            self.pos += 1  # non-FF padding byte


def _build_huff(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code in scan data")


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


# ------------------------------------------------------- progressive decode
def _geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _comp_blocks(frame, c):
    """A single-component (non-interleaved) scan covers the component's
    own ceil-grid of blocks (T.81 A.2.2), not the MCU-padded grid."""
    hmax, vmax, _, _ = _geometry(frame)
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _alloc_coefs(frame) -> list[np.ndarray]:
    """Natural-order coefficient accumulators, one (by, bx, 64) array per
    component, sized to the MCU-padded grid (superset of the ceil grid)."""
    _, _, mcux, mcuy = _geometry(frame)
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


def _ac_first_block(br, act, b, ss, se, al, eobrun) -> int:
    """AC first scan on one block (T.81 G.1.2.2 with EOB runs)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += br.receive(r)
            return eobrun - 1  # this block belongs to the run
        k += r
        b[ZIGZAG[k]] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, act, b, ss, se, al, eobrun) -> int:
    """AC refinement scan on one block (T.81 G.1.2.3): one correction bit
    per already-nonzero coefficient, new coefficients arrive at ±2^Al."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad AC-refine symbol (s must be 1)")
                newval = p1 if br.read_bit() else m1
            # advance over the run: nonzero-history coefficients take a
            # correction bit (and don't count), zero-history ones consume r
            while k <= se:
                c = ZIGZAG[k]
                if b[c] != 0:
                    if br.read_bit() and (b[c] & p1) == 0:
                        b[c] += p1 if b[c] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                b[ZIGZAG[k]] = newval
            k += 1
    if eobrun > 0:
        # block is inside an EOB run: only correction bits to the end
        while k <= se:
            c = ZIGZAG[k]
            if b[c] != 0:
                if br.read_bit() and (b[c] & p1) == 0:
                    b[c] += p1 if b[c] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _skip_to_marker(data: bytes, pos: int) -> int:
    """Advance past entropy padding / RSTn to the next true marker."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return pos


def _decode_prog_scan(
    data, pos, frame, sel, huff_dc, huff_ac, ss, se, ah, al,
    restart_interval, coefs,
) -> int:
    """Decode one progressive scan into the coefficient accumulators;
    returns the stream position of the next marker."""
    comps = frame["comps"]
    scan = [(ci, c) for ci, c in enumerate(comps) if c["id"] in sel]
    br = _BitReader(data, pos)
    eobrun = 0
    pred = {ci: 0 for ci, _ in scan}
    unit = 0  # MCUs (interleaved) or blocks (single-component)

    def _restart():
        nonlocal eobrun, pred
        br.sync_restart()
        eobrun = 0
        pred = {ci: 0 for ci, _ in scan}

    if ss == 0:  # DC scan (se must be 0; interleaved allowed)
        if se != 0:
            raise ValueError("DC scan must have Se = 0")
        if len(scan) == len(comps) and len(comps) > 1:
            _, _, mcux, mcuy = _geometry(frame)
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit and unit % restart_interval == 0:
                        _restart()
                    unit += 1
                    for ci, c in scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                b = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                                _dc_one(br, huff_dc, sel, c, b, ah, al, pred, ci)
        else:  # single-component DC scan: component ceil grid
            for ci, c in scan:
                bw_, bh_ = _comp_blocks(frame, c)
                for by in range(bh_):
                    for bx in range(bw_):
                        if restart_interval and unit and unit % restart_interval == 0:
                            _restart()
                        unit += 1
                        _dc_one(br, huff_dc, sel, c, coefs[ci][by, bx],
                                ah, al, pred, ci)
    else:  # AC scan: T.81 requires exactly one component
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci, c = scan[0]
        act = huff_ac.get(sel[c["id"]][1])
        bw_, bh_ = _comp_blocks(frame, c)
        for by in range(bh_):
            for bx in range(bw_):
                if restart_interval and unit and unit % restart_interval == 0:
                    _restart()
                unit += 1
                b = coefs[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(br, act, b, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_block(br, act, b, ss, se, al, eobrun)
    return _skip_to_marker(data, br.pos)


def _dc_one(br, huff_dc, sel, c, b, ah, al, pred, ci):
    if ah == 0:  # first pass: Huffman-coded diffs, point-transformed
        t = _huff_decode(br, huff_dc[sel[c["id"]][0]])
        pred[ci] += _extend(br.receive(t), t)
        b[0] = pred[ci] << al
    else:  # refinement: one raw bit per block
        if br.read_bit():
            b[0] |= 1 << al


def _reconstruct_progressive(frame, qt, coefs) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficients (vectorized over
    blocks) and hand off to the shared upsample/color stage."""
    comps = frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        bh_, bw_, _ = coefs[ci].shape
        blocks = coefs[ci].reshape(bh_, bw_, 8, 8).astype(np.float64) * q
        spatial = np.einsum("ui,yxuv,vj->yxij", _M, blocks, _M) + 128.0
        planes.append(
            spatial.transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8)
        )
    return _planes_to_pixels(frame, planes)


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, n_channels, raw pixels row-major, 8-bit). 1
    channel for grayscale, 3 (RGB) for YCbCr sources."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    coefs: list[np.ndarray] | None = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                t = np.zeros(64)
                for j in range(64):
                    t[ZIGZAG[j]] = body[i + 1 + j]
                qt[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                syms = body[i + 17 : i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(counts, syms)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline-ish, SOF2 prog
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                coefs = _alloc_coefs(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic-coded / lossless / hierarchical JPEG is out of "
                "scope (T.81 SOF0 baseline + SOF2 progressive supported)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                sel[cs] = (tdta >> 4, tdta & 0xF)
            if frame.get("progressive"):
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                pos = _decode_prog_scan(
                    data, pos + 2 + seglen, frame, sel, huff_dc, huff_ac,
                    ss, se, ahal >> 4, ahal & 0xF, restart_interval, coefs,
                )
                continue
            if ns != len(frame["comps"]):
                raise NotImplementedError("non-interleaved multi-scan")
            pixels = _decode_scan(
                data, pos + 2 + seglen, frame, sel, qt, huff_dc, huff_ac,
                restart_interval,
            )
            w, h = frame["w"], frame["h"]
            return w, h, pixels.shape[2], pixels.tobytes()
        pos += 2 + seglen
    if frame is not None and frame.get("progressive"):
        pixels = _reconstruct_progressive(frame, qt, coefs)
        return frame["w"], frame["h"], pixels.shape[2], pixels.tobytes()
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = sel[c["id"]]
                dct = huff_dc[dc_t]
                act = huff_ac[ac_t]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64)
                        t = _huff_decode(br, dct)
                        diff = _extend(br.receive(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            coeffs[ZIGZAG[k]] = _extend(br.receive(s), s)
                            k += 1
                        block = coeffs.reshape(8, 8) * q
                        spatial = _M.T @ block @ _M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1
    return _planes_to_pixels(frame, planes)


def _planes_to_pixels(frame, planes) -> np.ndarray:
    """Upsample component planes to full resolution, crop, color-convert
    (shared by the baseline and progressive paths)."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(full[0], 0, 255)[..., None]
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        out = np.clip(np.stack([r, g, b], axis=2), 0, 255)
    return np.round(out).astype(np.uint8)


# ------------------------------------------------------------------ encode
def _fixed_huff(symbols: list[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """All symbols at 9 bits — a valid canonical table (len(symbols) < 511
    so the all-ones max-length code is never assigned)."""
    counts = [0] * 16
    counts[8] = len(symbols)  # 9-bit codes
    enc = {}
    code = 0
    for length in range(1, 17):
        if length == 9:
            for s in symbols:
                enc[s] = (9, code)
                code += 1
        code <<= 1
    return counts, bytes(symbols), enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s (T.81 F.1.2.3)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _prep_planes(width, height, channels, pixels, subsample):
    """Color-convert + chroma-downsample the input into component planes
    (shared by the baseline and progressive fixture encoders)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        sh, sv = subsample
    else:
        planes = [img[..., 0].astype(np.float64)]
        sh, sv = 1, 1
    hv = [(sh, sv)] + [(1, 1)] * (len(planes) - 1) if channels == 3 else [(1, 1)]
    hmax = max(a for a, _ in hv)
    vmax = max(b for _, b in hv)
    if channels == 3 and (sh, sv) != (1, 1):
        # downsample chroma by box average to the component grid
        for i in (1, 2):
            p = planes[i]
            ph = (height + sv - 1) // sv * sv
            pw = (width + sh - 1) // sh * sh
            pad = np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
            planes[i] = pad.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
    return planes, hv, hmax, vmax


def encode_jpeg(
    width: int, height: int, channels: int, pixels: bytes,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Fixture-grade baseline JPEG: flat quant=1 (near-lossless — only DCT
    rounding), fixed 9-bit canonical Huffman tables, 4:4:4 by default or
    4:2:0 via ``subsample=(2, 2)`` (chroma averaged). ``channels`` 1 or 3.
    ``restart_interval=N`` emits a DRI segment and RSTn markers every N
    MCUs (DC predictors reset, bitstream byte-aligned) — exercises the
    decoder's restart path, and is what real encoders emit for error
    resilience."""
    planes, hv, hmax, vmax = _prep_planes(width, height, channels, pixels, subsample)

    dc_syms = list(range(12))
    ac_syms = sorted({0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)})
    dc_counts, dc_vals, dc_enc = _fixed_huff(dc_syms)
    ac_counts, ac_vals, ac_enc = _fixed_huff(ac_syms)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id0, flat 1s
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, nc)
    for ci in range(nc):
        ch, cv = hv[ci] if ci == 0 else (1, 1)
        sof += struct.pack(">BBB", ci + 1, (ch << 4) | cv, 0)
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_vals)
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_vals)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc]) + b"".join(
        struct.pack(">BB", ci + 1, 0x00) for ci in range(nc)
    ) + bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * nc
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align (flush pads with 1s), emit RSTn, reset DC
                out += bw.flush()
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                ch, cv = hv[ci] if ci == 0 else (1, 1)
                p = planes[ci]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = np.full((8, 8), 128.0)
                        ys = min(8, p.shape[0] - y0)
                        xs = min(8, p.shape[1] - x0)
                        if ys > 0 and xs > 0:
                            block[:ys, :xs] = p[y0 : y0 + ys, x0 : x0 + xs]
                            # edge-replicate partial blocks
                            if xs < 8:
                                block[:ys, xs:] = block[:ys, xs - 1 : xs]
                            if ys < 8:
                                block[ys:, :] = block[ys - 1 : ys, :]
                        coeffs = _M @ (block - 128.0) @ _M.T
                        zz = np.round(coeffs.reshape(64)[ZIGZAG]).astype(int)
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t = _mag_cat(diff)
                        bw.write(*dc_enc[t])
                        if t:
                            bw.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
                        run = 0
                        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                        for k in range(1, last_nz + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                bw.write(*ac_enc[0xF0])
                                run -= 16
                            s = _mag_cat(v)
                            bw.write(*ac_enc[(run << 4) | s])
                            bw.write(s, v if v >= 0 else v + (1 << s) - 1)
                            run = 0
                        if last_nz < 63:
                            bw.write(*ac_enc[0x00])  # EOB
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------ progressive encode
def _zz_block(p, y0: int, x0: int) -> np.ndarray:
    """Forward-DCT one 8x8 block at (y0, x0) of plane ``p`` (edge-replicate
    partial blocks, all-128 fully-outside blocks) → zigzag-order ints."""
    block = np.full((8, 8), 128.0)
    ys = min(8, p.shape[0] - y0)
    xs = min(8, p.shape[1] - x0)
    if ys > 0 and xs > 0:
        block[:ys, :xs] = p[y0 : y0 + ys, x0 : x0 + xs]
        if xs < 8:
            block[:ys, xs:] = block[:ys, xs - 1 : xs]
        if ys < 8:
            block[ys:, :] = block[ys - 1 : ys, :]
    coeffs = _M @ (block - 128.0) @ _M.T
    return np.round(coeffs.reshape(64)[ZIGZAG]).astype(np.int64)


def _flush_eobrun(bwr: _BitWriter, ac_enc, state: dict) -> None:
    """Emit a pending EOB-run symbol (+ its appended-bit count) and any
    correction bits buffered against it (refinement scans)."""
    e = state["eob_run"]
    if e > 0:
        nb = e.bit_length() - 1
        bwr.write(*ac_enc[nb << 4])
        if nb:
            bwr.write(nb, e - (1 << nb))
        state["eob_run"] = 0
    for bit in state["be"]:
        bwr.write(1, bit)
    state["be"] = []


def encode_jpeg_progressive(
    width: int, height: int, channels: int, pixels: bytes,
    subsample: tuple[int, int] = (1, 1),
) -> bytes:
    """Fixture-grade PROGRESSIVE JPEG (SOF2): flat quant=1, fixed 9-bit
    canonical tables, and the standard 4-phase scan script —

    1. DC first, interleaved, Al=1   (successive approximation, coarse)
    2. DC refinement, Ah=1 → Al=0    (one raw bit per block)
    3. per component: AC first, Ss=1..63, Al=1 (spectral + SA, EOB runs)
    4. per component: AC refinement, Ah=1 → Al=0 (correction bits)

    — so a decode exercises every T.81 Annex-G path: DC/AC first and
    refinement, cross-block EOB runs, ZRL-in-refinement, and buffered
    correction bits. Near-lossless like the baseline fixture writer
    (only DCT rounding; decode matches within ±2/channel)."""
    planes, hv, hmax, vmax = _prep_planes(width, height, channels, pixels, subsample)
    nc = len(planes)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # forward-DCT every component over its MCU-padded grid (zigzag order)
    zz = []
    for ci in range(nc):
        ch_, cv_ = hv[ci]
        arr = np.zeros((mcuy * cv_, mcux * ch_, 64), dtype=np.int64)
        for by in range(arr.shape[0]):
            for bx in range(arr.shape[1]):
                arr[by, bx] = _zz_block(planes[ci], by * 8, bx * 8)
        zz.append(arr)

    dc_syms = list(range(12))
    # AC symbols: EOBn (r<<4, r 0..14), ZRL, and every (run, size<=10)
    ac_syms = sorted(
        {r << 4 for r in range(15)} | {0xF0}
        | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    )
    dc_counts, dc_vals, dc_enc = _fixed_huff(dc_syms)
    ac_counts, ac_vals, ac_enc = _fixed_huff(ac_syms)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, height, width, nc)
    for ci in range(nc):
        chv, cvv = hv[ci]
        sof += struct.pack(">BBB", ci + 1, (chv << 4) | cvv, 0)
    out += _seg(0xC2, sof)  # SOF2: progressive
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_vals)
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_vals)

    def sos(comp_idx: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_idx)])
        for ci in comp_idx:
            body += struct.pack(">BB", ci + 1, 0x00)
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    ch_, cv_ = hv[ci]
                    for by in range(cv_):
                        for bx in range(ch_):
                            yield ci, my * cv_ + by, mx * ch_ + bx

    # ---- scan 1: DC first, Al=1 ------------------------------------
    out += sos(list(range(nc)), 0, 0, 0, 1)
    bwr = _BitWriter()
    pred = [0] * nc
    for ci, by, bx in mcu_blocks():
        v = int(zz[ci][by, bx, 0]) >> 1  # DC point transform: arith shift
        diff = v - pred[ci]
        pred[ci] = v
        t = _mag_cat(diff)
        bwr.write(*dc_enc[t])
        if t:
            bwr.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
    out += bwr.flush()

    # ---- scan 2: DC refinement, Ah=1 Al=0 (raw bits) -----------------
    out += sos(list(range(nc)), 0, 0, 1, 0)
    bwr = _BitWriter()
    for ci, by, bx in mcu_blocks():
        bwr.write(1, int(zz[ci][by, bx, 0]) & 1)
    out += bwr.flush()

    def comp_grid(ci: int):
        ch_, cv_ = hv[ci]
        cw = (width * ch_ + hmax - 1) // hmax
        chh = (height * cv_ + vmax - 1) // vmax
        for by in range((chh + 7) // 8):
            for bx in range((cw + 7) // 8):
                yield zz[ci][by, bx]

    # ---- scans 3..: AC first per component, Ss=1..63 Al=1 -------------
    for ci in range(nc):
        out += sos([ci], 1, 63, 0, 1)
        bwr = _BitWriter()
        state = {"eob_run": 0, "be": []}
        for blk in comp_grid(ci):
            r = 0
            for k in range(1, 64):
                v = int(blk[k])
                a = (-v if v < 0 else v) >> 1  # Al=1 point transform
                if a == 0:
                    r += 1
                    continue
                _flush_eobrun(bwr, ac_enc, state)
                while r > 15:
                    bwr.write(*ac_enc[0xF0])
                    r -= 16
                s = a.bit_length()
                bwr.write(*ac_enc[(r << 4) | s])
                bwr.write(s, a if v >= 0 else (~a) & ((1 << s) - 1))
                r = 0
            if r > 0:
                state["eob_run"] += 1
                if state["eob_run"] == 0x7FFF:
                    _flush_eobrun(bwr, ac_enc, state)
        _flush_eobrun(bwr, ac_enc, state)
        out += bwr.flush()

    # ---- scans ..: AC refinement per component, Ah=1 Al=0 --------------
    for ci in range(nc):
        out += sos([ci], 1, 63, 1, 0)
        bwr = _BitWriter()
        state = {"eob_run": 0, "be": []}
        for blk in comp_grid(ci):
            absv = [0] * 64
            eobpos = 0
            for k in range(1, 64):
                absv[k] = abs(int(blk[k]))  # Al=0: the value itself
                if absv[k] == 1:
                    eobpos = k  # last NEWLY-nonzero coefficient
            r = 0
            br_bits: list[int] = []
            for k in range(1, 64):
                temp = absv[k]
                if temp == 0:
                    r += 1
                    continue
                # ZRLs only when they can't fold into the block's EOB
                while r > 15 and k <= eobpos:
                    _flush_eobrun(bwr, ac_enc, state)
                    bwr.write(*ac_enc[0xF0])
                    r -= 16
                    for bit in br_bits:
                        bwr.write(1, bit)
                    br_bits = []
                if temp > 1:  # already nonzero: one correction bit
                    br_bits.append(temp & 1)
                    continue
                _flush_eobrun(bwr, ac_enc, state)
                bwr.write(*ac_enc[(r << 4) | 1])
                bwr.write(1, 1 if int(blk[k]) >= 0 else 0)
                for bit in br_bits:
                    bwr.write(1, bit)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                state["eob_run"] += 1
                state["be"].extend(br_bits)
                if state["eob_run"] == 0x7FFF:
                    _flush_eobrun(bwr, ac_enc, state)
        _flush_eobrun(bwr, ac_enc, state)
        out += bwr.flush()

    out += b"\xff\xd9"
    return bytes(out)
