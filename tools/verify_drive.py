"""End-to-end drive via the production launch path: seeded CDC feed ->
LakeTable merge (out-of-order split) -> convergence + idempotence + text
byte-invariant; plus the new MJPEG-AVI frame-sampling path."""
import tempfile

from pyspark.sql import SparkSession, functions as F

from go_bqloader_spark.sources.datagen import gen_changes, expected_final_state
from go_bqloader_spark.lake.table import LakeTable
from go_bqloader_spark.functions.webtext import extract_text

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

changes = gen_changes(spark, n_events=50_000, n_urls=8_000, seed=42).cache()
n = changes.count()

tmp = tempfile.mkdtemp(prefix="gbs_verify_")
tbl = LakeTable.create(
    spark, tmp,
    [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
     ("text", "string"), ("lang", "string")],
    key=["url", "warc_ts"], bucket_col="url", n_buckets=8,
)
# out-of-order application: second half first
first = changes.filter(F.col("seq") % 2 == 0)
second = changes.filter(F.col("seq") % 2 == 1)
s1 = tbl.merge(second, batch_key=("drive", 1))
s2 = tbl.merge(first, batch_key=("drive", 2))
final = tbl.read()
exp = expected_final_state(changes)
a = final.select("url", "warc_ts", "text").exceptAll(
    exp.select("url", "warc_ts", "text"))
b = exp.select("url", "warc_ts", "text").exceptAll(
    final.select("url", "warc_ts", "text"))
assert a.count() == 0 and b.count() == 0, "state mismatch vs expected"
rows_final = final.count()

# idempotent redelivery
s3 = tbl.merge(first, batch_key=("drive", 2))
assert s3.skipped, "redelivered batch must be ledger-skipped"
assert tbl.read().count() == rows_final

# empty batch
s4 = tbl.merge(changes.limit(0), batch_key=("drive", 3))
assert tbl.read().count() == rows_final

# text byte-invariant: text == extract_text(html)
bad = final.filter(
    F.col("html").isNotNull()
    & (F.col("text") != extract_text(F.col("html")))
).count()
assert bad == 0, f"{bad} rows violate text byte-invariant"

print(f"DRIVE OK: events={n} final_rows={rows_final} "
      f"up1={s1.rows_upserted} up2={s2.rows_upserted} skipped_ok idempotent_ok "
      f"empty_ok text_invariant_ok")

# --- MJPEG-AVI frame-sampling path (new this session) ---
from go_bqloader_spark.operators import jpegcodec as jc
from go_bqloader_spark.operators import mediacodecs as mc
from go_bqloader_spark.operators.multimodal import (
    decode_video_meta, sample_video_frames)

frames = [jc.encode_jpeg(16, 16, 3, bytes(
              (x * 16 + y * 3 + f * 40) % 256
              for y in range(16) for x in range(16) for _ in range(3)))
          for f in range(12)]
avi = mc.write_avi_mjpeg(frames, 16, 16, fps=10)
vdf = spark.createDataFrame(
    [("http://v/a.avi", None, bytearray(avi)),
     ("http://v/bad.bin", None, bytearray(b"not a video"))],
    "url string, warc_ts timestamp, payload binary")
meta = {r["url"]: r.asDict() for r in decode_video_meta(
    vdf.withColumnRenamed("payload", "html")
       .withColumn("warc_ts", F.current_timestamp())
       .withColumnRenamed("html", "payload")).collect()} \
    if False else {}
vmeta = decode_video_meta(vdf).collect()
byurl = {r["url"]: r for r in vmeta}
assert byurl["http://v/a.avi"]["mime"] == "video/x-msvideo", byurl
assert byurl["http://v/a.avi"]["brand"] == "MJPG"
assert byurl["http://v/a.avi"]["width"] == 16
assert byurl["http://v/bad.bin"]["mime"] is None
fr = sample_video_frames(vdf, every_ms=300).collect()
idxs = sorted(r["frame_idx"] for r in fr)
assert idxs == [0, 3, 6, 9], idxs
assert all(r["width"] == 16 and r["height"] == 16 for r in fr)
assert len({r["sha256"] for r in fr}) == 4
print(f"AVI OK: meta_brand=MJPG frames={idxs}")

# --- corpus-prep pipeline (textpipeline operators, new) ---
from go_bqloader_spark.operators.textpipeline import (
    paragraph_dedup, pii_scrub, repetition_stats, stratified_sample)

docs = spark.createDataFrame(
    [(1, "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12 b13 b14 b15 b16 b17 "
         "b18 b19 u1 u2 mail x@y.org"),
     (2, "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12 b13 b14 b15 b16 b17 "
         "b18 b19"),
     (3, "spam spam spam spam spam spam")],
    "doc_id bigint, text string")
pd_ = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
assert pd_[1]["kept_chunks"] == 2 and pd_[2]["dropped_chunks"] == 1
rp = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
assert rp[3]["low_quality"] and not rp[2]["low_quality"]
sc_ = pii_scrub(docs).filter("doc_id = 1").collect()[0]
assert sc_["n_emails"] == 1 and "<EMAIL>" in sc_["redacted"]
samp = stratified_sample(docs.withColumn("source", F.lit("s")), "source")
assert samp.count() == samp.count()  # deterministic plan executes
print("TEXTPIPE OK: chunk-dedup, repetition flags, pii redaction, sampling")

# --- corpus hygiene through the CDC path (quality_rewrite + projectors) ---
from go_bqloader_spark.lake import quality_rewrite

tmp2 = tempfile.mkdtemp(prefix="gbs_q_")
tq = LakeTable.create(
    spark, tmp2,
    [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
     ("text", "string"), ("lang", "string")],
    key=["url", "warc_ts"], bucket_col="url", n_buckets=4,
)
boiler = " ".join(f"b{i}" for i in range(20))
rows = [("U", 1, "https://a.ex/1", None, None,
         boiler + " " + " ".join(f"u{i}" for i in range(40)), "en"),
        ("U", 2, "https://a.ex/2", None, None, boiler, "en"),
        ("U", 3, "https://s.ex/1", None, None,
         "spam spam spam spam spam spam spam spam", "en"),
        ("U", 4, "https://c.ex/1", None, None,
         " ".join(f"w{i}" for i in range(30)), "en")]
tq.merge(spark.createDataFrame(
    rows, "op string, seq bigint, url string, warc_ts timestamp, "
          "html binary, text string, lang string"), batch_key=("q", 0))
qr = quality_rewrite(tq, batch_id=0)
assert qr.removed == 2 and qr.n_repetitive == 1 and qr.n_chunk_dup == 1
qr2 = quality_rewrite(tq, batch_id=0)
assert qr2.merge.skipped
from go_bqloader_spark.streaming import (
    pii_scrub_projector, quality_filter_projector)
b = spark.createDataFrame(
    [("U", 1, "x", "keep me " + " ".join(f"k{i}" for i in range(10))),
     ("U", 2, "y", "spam spam spam spam spam spam"),
     ("D", 3, "z", "spam spam spam spam spam spam")],
    "op string, seq bigint, url string, text string")
kept = sorted(r["seq"] for r in quality_filter_projector()(b).collect())
assert kept == [1, 3], kept
s = pii_scrub_projector()(spark.createDataFrame(
    [("U", 1, "u", None, "mail a@b.org now")],
    "op string, seq bigint, url string, html binary, text string")).collect()[0]
assert s["text"] == "mail xEMAILx now"
print(f"HYGIENE OK: quality_rewrite removed={qr.removed} ledger_skip "
      f"projector_kept={kept} scrubbed")

# --- URL canonicalization (CDC key normalization) ---
from go_bqloader_spark.functions.urlnorm import canonical_url
cu = spark.createDataFrame(
    [("HTTP://A.EX:80/P?utm_s=1&q=2#f",)], "url string"
).select(canonical_url("url").alias("c")).collect()[0]["c"]
assert cu == "http://a.ex/P?q=2", cu
print("URLNORM OK:", cu)

# --- r5 additions: domain rollup, dataset card, training-set export ---
from go_bqloader_spark.functions.urlnorm import host_of, registrable_domain

rd = spark.createDataFrame(
    [("https://a.b.site.co.uk:8443/x",), ("http://www.news.org/p",)],
    "url string",
).select(registrable_domain(host_of("url")).alias("d")).collect()
assert [r["d"] for r in rd] == ["site.co.uk", "news.org"], rd

from go_bqloader_spark.plans.export import export_training_set

clean40 = " ".join(f"tok{i}" for i in range(40))
corpus = spark.createDataFrame(
    [(1, clean40, "en"), (2, clean40, "en"), (3, "hi", "en"),
     (4, " ".join(["spam"] * 30), "en"),
     (5, "ping x@y.org " + clean40, "fr")],
    "doc_id bigint, text string, lang string")
exp_dir = tempfile.mkdtemp(prefix="gbs_exp_") + "/rel"
stats = export_training_set(corpus, exp_dir, min_tokens=5,
                            capacity=32, n_shards=2)
assert stats["input_docs"] == 5 and stats["after_dedup"] == 4
assert stats["exported_docs"] == 2, stats
shipped = {r["doc_id"]: r for r in
           spark.read.parquet(f"{exp_dir}/shards").collect()}
assert sorted(shipped) == [1, 5] and "<EMAIL>" in shipped[5]["text"]
card = {r["stratum"]: r["docs"] for r in
        spark.read.parquet(f"{exp_dir}/card").collect()}
assert card == {"en": 1, "fr": 1}, card
print(f"EXPORT OK: funnel={stats['after_dedup']}->{stats['exported_docs']} "
      f"card={card} domain_rollup_ok")

# --- manifest key Blooms: point lookup through the production API ---
tmp3 = tempfile.mkdtemp(prefix="gbs_bl_")
tb = LakeTable.create(
    spark, tmp3,
    [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
     ("text", "string"), ("lang", "string")],
    key=["url", "warc_ts"], n_buckets=4, bloom_bits=8192,
)
feed2 = gen_changes(spark, n_events=3000, n_urls=400, n_hosts=20, seed=13)
tb.merge(feed2, batch_key=("bl", 0))
mrow = tb.read().limit(1).collect()[0]
pt = tb.read(point={"url": mrow["url"], "warc_ts": mrow["warc_ts"]}).collect()
assert pt == [mrow], pt
mman = tb.manifest()
assert all(e.get("bloom") for es in mman["buckets"].values() for e in es)
print(f"BLOOM OK: point lookup exact, {sum(len(v) for v in mman['buckets'].values())} entries carry filters")

# --- per-domain politeness quota at ingest ---
from go_bqloader_spark.streaming import domain_quota_projector
qb = spark.createDataFrame(
    [("U", i, f"https://{'www.' if i % 2 else ''}hot.co.uk/{i}", f"t{i}")
     for i in range(1, 5)] + [("U", 9, "https://quiet.org/x", "qx")],
    "op string, seq bigint, url string, text string")
qkept = sorted(r["seq"] for r in
               domain_quota_projector(max_per_domain=2)(qb).collect())
assert qkept == [1, 2, 9], qkept
print(f"QUOTA OK: kept={qkept}")

# --- composed hygiene stack through one projector hook ---
from go_bqloader_spark.functions.urlnorm import canonicalize_projector
from go_bqloader_spark.streaming import (
    compose_projectors, pii_scrub_projector, quality_filter_projector)
stack = compose_projectors(
    canonicalize_projector(), quality_filter_projector(),
    pii_scrub_projector(), domain_quota_projector(max_per_domain=2))
cb = spark.createDataFrame(
    [("U", 1, "https://c.ex/p?utm_source=t", "call 415-555-0134 "
      + " ".join(f"k{i}" for i in range(20))),
     ("U", 2, "https://s.ex/x", "spam spam spam spam spam spam")],
    "op string, seq bigint, url string, text string"
).select("op", "seq", "url",
         F.lit(None).cast("timestamp").alias("warc_ts"),
         F.lit(None).cast("binary").alias("html"), "text",
         F.lit("en").alias("lang"))
cres = {r["url"]: r["text"] for r in stack(cb).collect()}
assert list(cres) == ["https://c.ex/p"] and "xPHONEx" in cres["https://c.ex/p"]
print("STACK OK: canonicalized key, spam dropped, PII redacted")

# --- multi-writer optimistic concurrency (r5): interleaved commit rebases ---
tmp4 = tempfile.mkdtemp(prefix="gbs_cc_")
tc = LakeTable.create(
    spark, tmp4,
    [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
     ("text", "string"), ("lang", "string")],
    key=["url", "warc_ts"], n_buckets=4, write_mode="mor",
)
tc2 = LakeTable(spark, tmp4)
_orig_cas = tc.fs.create_exclusive
_fired = {"done": False}
def _race(path, data):
    if not _fired["done"]:
        _fired["done"] = True
        tc2.merge(spark.createDataFrame(
            [("U", 1, "https://w2.ex/p", None, None, "w2", "en")],
            "op string, seq bigint, url string, warc_ts timestamp, "
            "html binary, text string, lang string"), batch_key=("w2", 0))
    return _orig_cas(path, data)
tc.fs.create_exclusive = _race
ccst = tc.merge(spark.createDataFrame(
    [("U", 2, "https://w1.ex/p", None, None, "w1", "en")],
    "op string, seq bigint, url string, warc_ts timestamp, "
    "html binary, text string, lang string"), batch_key=("w1", 0))
assert not ccst.skipped and tc.read().count() == 2
assert tc.committed("w1", 0) and tc.committed("w2", 0)
print(f"CONCURRENCY OK: interleaved commit rebased to v{ccst.version}, both batches live")

# --- incremental near-dup maintenance via the persisted band index ---
import os

from go_bqloader_spark.lake import NearDupIndex
tmp5 = tempfile.mkdtemp(prefix="gbs_ndi_")
tn = LakeTable.create(
    spark, os.path.join(tmp5, "corpus"),
    [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
     ("text", "string"), ("lang", "string")],
    key=["url", "warc_ts"], n_buckets=4,
)
ndx = NearDupIndex.create(spark, os.path.join(tmp5, "idx"), tn, n_buckets=16)
fam = "the quick brown fox jumps over the lazy dog near the old river bank"
def _nb(rows):
    return spark.createDataFrame(
        [("U", s, u, None, None, t, "en") for s, u, t in rows],
        "op string, seq bigint, url string, warc_ts timestamp, "
        "html binary, text string, lang string")
tn.merge(_nb([(1, "u/a2", fam), (2, "u/solo", "unrelated volcanic geology text")]),
         batch_key=("feed", 0))
nr1 = ndx.update(batch_id=0)
tn.merge(_nb([(3, "u/a1", fam)]), batch_key=("feed", 1))
nr2 = ndx.update(batch_id=1)
live = sorted(r["url"] for r in tn.read().select("url").collect())
assert live == ["u/a1", "u/solo"], live
assert nr2.index_buckets_probed < nr2.index_buckets_total
print(f"NEARDUP-INDEX OK: incremental pass removed={nr2.removed} "
      f"probed={nr2.index_buckets_probed}/{nr2.index_buckets_total} buckets, "
      f"indexed_through={ndx.indexed_through()}")

# --- format-3 manifests: O(delta) groups + bounded coalescing (r5 tail) ---
import json as _json
tmp6 = tempfile.mkdtemp(prefix="gbs_f3_")
tf = LakeTable.create(
    spark, tmp6,
    [("url", "string"), ("warc_ts", "timestamp"), ("html", "binary"),
     ("text", "string"), ("lang", "string")],
    key=["url", "warc_ts"], n_buckets=4, max_manifest_groups=4,
)
for i in range(7):
    tf.merge(spark.createDataFrame(
        [("U", i * 10 + j, f"https://f3-{j}.ex/p", None, None, f"f{i}", "en")
         for j in range(4)],
        "op string, seq bigint, url string, warc_ts timestamp, "
        "html binary, text string, lang string"), batch_key=("f3", i))
_raw = _json.loads(tf.fs.read_text(tf._manifest_path(tf.current_version())))
assert "buckets" not in _raw, "format-3 manifest must not inline buckets"
assert len(_raw["groups"]) <= 5, _raw["groups"]
assert any("_m" in g for g in _raw["groups"]), "coalesced group expected"
_cold = LakeTable(spark, tmp6)  # cold reader resolves groups from disk
assert _cold.read().count() == 4
assert {r.text for r in _cold.read().collect()} == {"f6"}
print(f"FORMAT3 OK: 7 delta commits -> {len(_raw['groups'])} live groups "
      "(coalesced), cold-reader LWW state exact")
