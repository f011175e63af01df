"""Incremental near-dup maintenance (lake/neardup_index.py): the persisted
band index must reproduce batch ``near_dup_rewrite`` semantics while only
touching O(batch)-pruned buckets, survive CDC deletes without resurrecting
dead winners, and stay exactly-once under redelivery."""

import pytest
from pyspark.sql import functions as F

from go_bqloader_spark.lake import LakeTable, NearDupIndex, near_dup_rewrite

PAGE_COLS = [
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
]

# three near-dup families + distinct singletons; texts long enough for
# stable 1-shingle minhash
FAM_A = "the quick brown fox jumps over the lazy dog near the old river bank"
FAM_B = "spark structured streaming applies change data capture merges exactly once"
SOLO1 = "completely unrelated text about volcanic geology and mineral formation"
SOLO2 = "a different standalone document covering medieval naval trade routes"


def _corpus(spark, tmp_path, name="corpus"):
    return LakeTable.create(
        spark, str(tmp_path / name), PAGE_COLS, key=["url", "warc_ts"],
        n_buckets=4,
    )


def _batch(spark, rows):
    """rows: [(seq, url, text)] -> change batch."""
    return spark.createDataFrame(
        [("U", s, u, None, None, t, "en") for s, u, t in rows],
        "op string, seq bigint, url string, warc_ts timestamp, "
        "html binary, text string, lang string",
    )


def _live_urls(table):
    return sorted(r["url"] for r in table.read().select("url").collect())


def test_incremental_matches_batch_rewrite(spark, tmp_path):
    """Two ingest+update rounds converge to the same live set as one batch
    near_dup_rewrite over an identically-loaded table."""
    rows1 = [(1, "u/a2", FAM_A), (2, "u/a3", FAM_A), (3, "u/s1", SOLO1)]
    rows2 = [(4, "u/a1", FAM_A), (5, "u/b2", FAM_B), (6, "u/b1", FAM_B),
             (7, "u/s2", SOLO2)]

    inc = _corpus(spark, tmp_path, "inc")
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"), inc, n_buckets=8)
    inc.merge(_batch(spark, rows1), batch_key=("feed", 0))
    r1 = idx.update(batch_id=0)
    assert r1.new_docs == 3 and r1.removed == 1  # a3 loses to a2
    inc.merge(_batch(spark, rows2), batch_key=("feed", 1))
    r2 = idx.update(batch_id=1)
    # a1 (min key) displaces the surviving a2; b2 loses to b1
    assert r2.removed == 2

    ref = _corpus(spark, tmp_path, "ref")
    ref.merge(_batch(spark, rows1), batch_key=("feed", 0))
    ref.merge(_batch(spark, rows2), batch_key=("feed", 1))
    near_dup_rewrite(ref, batch_id=0)

    assert _live_urls(inc) == _live_urls(ref) == ["u/a1", "u/b1", "u/s1", "u/s2"]


def test_index_probe_is_bucket_pruned(spark, tmp_path):
    t = _corpus(spark, tmp_path)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"), t, n_buckets=32)
    t.merge(_batch(spark, [(1, "u/x", FAM_A)]), batch_key=("feed", 0))
    r = idx.update(batch_id=0)
    # 4 band hashes -> at most 4 of 32 index buckets opened
    assert 0 < r.index_buckets_probed <= 4
    assert r.index_buckets_total == 32


def test_deleted_winner_never_tombstones_new_doc(spark, tmp_path):
    """Doc A is indexed, then CDC-deleted. A later near-dup B must survive
    (A's stale index rows can produce candidates but not winners)."""
    t = _corpus(spark, tmp_path)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"), t, n_buckets=8)
    t.merge(_batch(spark, [(1, "u/a-dead", FAM_A)]), batch_key=("feed", 0))
    idx.update(batch_id=0)
    # CDC delete of the indexed doc (normal feed path, index not informed)
    dead = t.read().select("url", "warc_ts").collect()[0]
    t.merge(
        spark.createDataFrame(
            [("D", 2, dead["url"], dead["warc_ts"], None, None, None)],
            "op string, seq bigint, url string, warc_ts timestamp, "
            "html binary, text string, lang string",
        ),
        batch_key=("feed", 1),
    )
    # new near-dup arrives — its only candidate is the dead doc
    t.merge(_batch(spark, [(3, "u/z-new", FAM_A)]), batch_key=("feed", 2))
    r = idx.update(batch_id=1)
    assert r.removed == 0
    assert _live_urls(t) == ["u/z-new"]


def test_update_is_idempotent_under_redelivery(spark, tmp_path):
    t = _corpus(spark, tmp_path)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"), t, n_buckets=8)
    t.merge(_batch(spark, [(1, "u/p1", FAM_A), (2, "u/p2", FAM_A)]),
            batch_key=("feed", 0))
    r1 = idx.update(batch_id=0)
    assert r1.removed == 1
    state = _live_urls(t)
    # redelivery of the SAME maintenance batch: both merges ledger-skip
    r2 = idx.update(batch_id=0, since=-1)
    assert r2.corpus_merge.skipped
    assert r2.index_merge is None or r2.index_merge.skipped
    assert _live_urls(t) == state


def test_losers_never_enter_index_and_old_loser_bands_tombstoned(spark, tmp_path):
    t = _corpus(spark, tmp_path)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"), t, n_buckets=8)
    t.merge(_batch(spark, [(1, "u/a9", FAM_A)]), batch_key=("feed", 0))
    idx.update(batch_id=0)
    # smaller key arrives later: the OLD doc u/a9 loses
    t.merge(_batch(spark, [(2, "u/a0", FAM_A)]), batch_key=("feed", 1))
    r = idx.update(batch_id=1)
    assert r.removed == 1 and _live_urls(t) == ["u/a0"]
    idx_urls = {r2["url"] for r2 in idx.table.read().select("url").collect()}
    assert idx_urls == {"u/a0"}  # loser bands tombstoned, winner indexed


def test_empty_delta_is_noop_commit(spark, tmp_path):
    t = _corpus(spark, tmp_path)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"), t, n_buckets=8)
    r = idx.update(batch_id=0)
    assert r.new_docs == 0 and r.removed == 0
    assert t.committed("neardup_incr", 0)  # ledger still records the pass


def test_indexed_through_tracks_corpus_seq(spark, tmp_path):
    t = _corpus(spark, tmp_path)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"), t, n_buckets=8)
    assert idx.indexed_through() == -1
    t.merge(_batch(spark, [(10, "u/x", SOLO1), (11, "u/y", SOLO2)]),
            batch_key=("feed", 0))
    idx.update(batch_id=0)
    assert idx.indexed_through() == 11
    # second update reads only changes past the watermark
    t.merge(_batch(spark, [(12, "u/z", FAM_B)]), batch_key=("feed", 1))
    r = idx.update(batch_id=1)
    assert r.new_docs == 1


def test_rebuild_gc_stale_rows_and_keeps_live(spark, tmp_path):
    """rebuild(): CDC-deleted docs' leftover band rows are tombstoned,
    live docs' rows survive (LWW tie keeps unchanged rows), and the pass
    is ledgered."""
    t = _corpus(spark, tmp_path)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"), t, n_buckets=8)
    t.merge(_batch(spark, [(1, "u/dead", SOLO1), (2, "u/live", SOLO2)]),
            batch_key=("feed", 0))
    idx.update(batch_id=0)
    assert {r["url"] for r in idx.table.read().select("url").collect()} == {
        "u/dead", "u/live"
    }
    dead = t.read().filter("url = 'u/dead'").select("url", "warc_ts").collect()[0]
    t.merge(
        spark.createDataFrame(
            [("D", 3, dead["url"], dead["warc_ts"], None, None, None)],
            "op string, seq bigint, url string, warc_ts timestamp, "
            "html binary, text string, lang string",
        ),
        batch_key=("feed", 1),
    )
    st = idx.rebuild(batch_id=0)
    assert not st.skipped and st.rows_deleted > 0
    assert {r["url"] for r in idx.table.read().select("url").collect()} == {"u/live"}
    # redelivery is a no-op
    assert idx.rebuild(batch_id=0).skipped
    # physical tombstone expiry through normal table maintenance
    idx.table.compact(expire_tombstones=True, min_entries=1)
    assert {r["url"] for r in idx.table.read().select("url").collect()} == {"u/live"}
    # the index keeps working incrementally after a rebuild
    t.merge(_batch(spark, [(4, "u/live2", SOLO2 + " extra")]), batch_key=("feed", 2))
    r = idx.update(batch_id=1)
    assert r.new_docs == 1


def _arm_race_on_first_cas(table, action):
    """Make the FIRST manifest CAS on ``table``'s fs run ``action()``
    (through an independent handle) before the CAS proceeds — the same
    interleaving seam as tests/test_concurrent_writers.py."""
    orig = table.fs.create_exclusive
    state = {"armed": True}

    def hook(path, data):
        if state["armed"] and "_manifests" in path:
            state["armed"] = False
            action()
        return orig(path, data)

    table.fs.create_exclusive = hook


def test_sweep_races_concurrent_compact(spark, tmp_path):
    """VERDICT r5 #4: a corpus compaction committing between the sweep's
    snapshot read and its tombstone merge must not lose the dedup — the
    delta-append merge rebases and the live set equals a race-free run."""
    rows = [(1, "u/a2", FAM_A), (2, "u/a3", FAM_A), (3, "u/s1", SOLO1)]

    ref = _corpus(spark, tmp_path, "ref")
    ridx = NearDupIndex.create(spark, str(tmp_path / "ridx"), ref, n_buckets=8)
    ref.merge(_batch(spark, rows), batch_key=("feed", 0))
    ridx.update(batch_id=0)

    inc = _corpus(spark, tmp_path, "inc")
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"), inc, n_buckets=8)
    inc.merge(_batch(spark, rows), batch_key=("feed", 0))
    other = LakeTable(spark, str(tmp_path / "inc"))  # independent handle
    _arm_race_on_first_cas(inc, lambda: other.compact(min_entries=1))
    r = idx.update(batch_id=0)

    assert r.removed == 1  # a3 still loses to a2 despite the interleaving
    assert _live_urls(inc) == _live_urls(ref) == ["u/a2", "u/s1"]
    # the sweep is caught up: a follow-up pass finds nothing new
    r2 = idx.update(batch_id=1)
    assert r2.new_docs == 0 and r2.removed == 0


def test_sweep_races_concurrent_rebucket(spark, tmp_path, monkeypatch):
    """VERDICT r5 #4, the layout-changing case: a rebucket commits while
    the sweep is mid-decision (here: right before it builds the
    tombstone reads — the widest point of the window). An UNPINNED
    corpus read would resolve the POST-rebucket manifest but prune it
    with the 4-bucket ids computed from the captured snapshot — a key
    keeps its old bucket id with only P=1/4 under the 16-bucket layout,
    so with 8 token-disjoint loser families at least one delete is
    dropped almost surely (verified red without the version pin). The
    pinned-snapshot reads + the OCC merge retry must converge to the
    race-free live set under the NEW layout."""
    rows, urls = [], []
    for i in range(8):  # 8 families x 2 identical docs -> 8 losers
        # token-DISJOINT families (cross-family jaccard = 0): shared
        # filler words would put every doc in one giant cluster
        fam = " ".join(f"fam{i}tok{j}" for j in range(16))
        rows += [(2 * i + 1, f"u/f{i}a", fam), (2 * i + 2, f"u/f{i}b", fam)]
        urls.append(f"u/f{i}a")
    rows.append((100, "u/s1", SOLO1))
    urls.append("u/s1")

    ref = _corpus(spark, tmp_path, "ref")
    ridx = NearDupIndex.create(spark, str(tmp_path / "ridx"), ref, n_buckets=8)
    ref.merge(_batch(spark, rows), batch_key=("feed", 0))
    r_ref = ridx.update(batch_id=0)
    assert r_ref.removed == 8

    inc = _corpus(spark, tmp_path, "inc")
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"), inc, n_buckets=8)
    inc.merge(_batch(spark, rows), batch_key=("feed", 0))
    other = LakeTable(spark, str(tmp_path / "inc"))

    orig_vdp = NearDupIndex._victim_deletes_pruned
    state = {"armed": True}

    def vdp_with_race(self, cm, losers, allb):
        if state["armed"]:
            state["armed"] = False
            other.rebucket(16)  # commits between decision and reads
        return orig_vdp(self, cm, losers, allb)

    monkeypatch.setattr(NearDupIndex, "_victim_deletes_pruned", vdp_with_race)
    r = idx.update(batch_id=0)

    assert r.removed == 8  # every f{i}b loses to f{i}a
    assert inc.manifest()["n_buckets"] == 16
    assert _live_urls(inc) == _live_urls(ref) == sorted(urls)
    r2 = idx.update(batch_id=1)
    assert r2.new_docs == 0 and r2.removed == 0
