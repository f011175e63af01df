"""Property-based tests (hypothesis) for the binary codecs — the
fixture-writer/decoder pairs must roundtrip for ARBITRARY valid inputs,
not just the hand-picked goldens. Pure Python, no Spark session."""

import numpy as np
from hypothesis import given, settings, strategies as st

from go_bqloader_spark.operators.jpegcodec import decode_jpeg, encode_jpeg
from go_bqloader_spark.operators.mediacodecs import (
    decode_mp4_meta,
    decode_png,
    encode_png,
    write_mp4_skeleton,
)
from go_bqloader_spark.sources.xlsbiff import read_xls_rows, write_xls

# printable-ish cell text incl. CJK and the quote/comma hazards
_cell = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ0123456789 ,\"'¥-./:") + ["金", "額", "日", "é"]
    ),
    max_size=12,
)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(st.one_of(st.none(), _cell), min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_xls_roundtrip_property(grid):
    """write_xls∘read_xls_rows is identity on the FirstCol..LastCol view:
    leading Nones trim, interior Nones read back as '' (unpopulated gaps
    inside the populated range), trailing Nones trim."""
    expected = []
    for row in grid:
        vals = [(i, v) for i, v in enumerate(row) if v is not None]
        if not vals:
            continue  # fully unpopulated rows don't exist in BIFF
        first, last = vals[0][0], vals[-1][0]
        expected.append(
            [row[i] if row[i] is not None else "" for i in range(first, last + 1)]
        )
    got = read_xls_rows(write_xls(grid))
    assert got == expected


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, ch, seed):
    rng = np.random.default_rng(seed)
    # encode_png supports gray(1)/RGB(3); random bytes exercise filters
    px = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
    # encoder emits color type per channel count; 1→gray needs ctype 0
    dw, dh, dch, out = decode_png(encode_png(w, h, ch, px))
    assert (dw, dh, dch) == (w, h, ch) and out == px


@settings(max_examples=12, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    chans=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
    rst=st.sampled_from([0, 2, 5]),
)
def test_jpeg_roundtrip_property(w, h, chans, seed, rst):
    """Flat-quant baseline JPEG: any size (odd dims → partial blocks),
    any restart interval — roundtrip within DCT rounding. Worst case is
    ±3/channel: quantization rounds each coefficient by ±0.5 and the
    float DCT→IDCT plus YCbCr↔RGB re-rounding can align on one pixel
    (seed 53965 @40×23 produces exactly one such pixel in both the
    baseline and progressive paths); typical error is ≤2."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, chans), dtype=np.uint8)
    data = encode_jpeg(w, h, chans, img.tobytes(), restart_interval=rst)
    dw, dh, dch, px = decode_jpeg(data)
    assert (dw, dh, dch) == (w, h, chans)
    out = np.frombuffer(px, np.uint8).reshape(h, w, chans)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 3 and err.mean() < 1.0


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    chans=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
    sub=st.sampled_from([(1, 1), (2, 2)]),
)
def test_jpeg_progressive_roundtrip_property(w, h, chans, seed, sub):
    """SOF2 4-phase scan script: any size / gray vs color / 4:4:4 vs
    4:2:0 — decode matches the source within DCT rounding. Random data
    maximizes AC density, stressing EOB-run + refinement bookkeeping."""
    from go_bqloader_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, chans), dtype=np.uint8)
    if chans == 3 and sub == (2, 2):
        img[..., 1] = img[..., 0]  # chroma-smooth: subsampling is lossy
        img[..., 2] = img[..., 0]
    data = encode_jpeg_progressive(
        w, h, chans, img.tobytes(), subsample=sub if chans == 3 else (1, 1)
    )
    dw, dh, dch, px = decode_jpeg(data)
    assert (dw, dh, dch) == (w, h, chans)
    out = np.frombuffer(px, np.uint8).reshape(h, w, chans)
    err = np.abs(out.astype(int) - img.astype(int))
    if chans == 3 and sub == (2, 2):
        assert err.mean() < 3.0
    else:
        # same ±3 worst case as the baseline roundtrip (shared DCT/
        # color-convert rounding — verified identical error on the
        # falsifying seed), NOT progressive-refinement loss
        assert err.max() <= 3 and err.mean() < 1.0


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(0, 8192),
    h=st.integers(0, 8192),
    dur=st.integers(0, 10**7),
    audio=st.booleans(),
)
def test_mp4_meta_property(w, h, dur, audio):
    m = decode_mp4_meta(write_mp4_skeleton(w, h, dur, with_audio=audio))
    assert m["duration_ms"] == dur and m["has_audio"] == audio
    if w and h:
        assert (m["width"], m["height"]) == (w, h)
    assert m["n_tracks"] == (2 if audio else 1) and m["has_video"]
