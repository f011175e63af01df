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
        [("u", "2024-01-01 00:00:00", b"\xff\xd8\xff real jpeg bytes")],
        "url string, warc_ts string, payload binary",
    ).select("url", F.to_timestamp("warc_ts").alias("warc_ts"), "payload")
    with pytest.raises(Exception, match="(?i)stub|NotImplemented"):
        decode_image_meta(df).collect()


def test_real_codec_path_when_pil_present(spark):
    """The real-codec branch decodes an actual PNG via PIL; auto-skips in
    environments without imaging libs (the stub path stays tested above)."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [("u1", None, bytearray(buf.getvalue()))],
        "url string, warc_ts timestamp, payload binary",
    )
    row = decode_image_meta(df).collect()[0]
    assert (row["mime"], row["width"], row["height"]) == ("image/png", 12, 7)
