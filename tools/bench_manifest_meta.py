"""Measure commit-metadata cost: format-3 entry groups (actual bytes
written per commit) vs the format-2 counterfactual (the resolved bucket
map the old format would have re-inlined into every manifest).

Runs N MoR delta merges on a small table with Blooms enabled (Bloom
blobs dominate entry size, as they would at 100 TB), and prints one JSON
line: per-commit metadata bytes at the start vs end of the run for both
formats, plus totals. The point: format-2 grows linearly with table
history (re-serializing every accumulated entry each commit), format-3
stays flat at O(touched buckets) with an amortized coalesce spike.

Usage: python tools/bench_manifest_meta.py [n_commits]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_bqloader_spark.lake import LakeTable  # noqa: E402
from go_bqloader_spark.session import build_session  # noqa: E402

COLS = [
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
]


def main(n_commits: int = 60) -> None:
    spark = build_session(master="local[8]")
    tmp = tempfile.mkdtemp(prefix="manifest_meta_")
    try:
        t = LakeTable.create(
            spark, os.path.join(tmp, "tbl"), COLS, key=["url", "warc_ts"],
            n_buckets=8, bloom_bits=4096, max_manifest_groups=16,
        )
        mdir = os.path.join(t.path, "_manifests")
        sizes = {f: os.path.getsize(os.path.join(mdir, f))
                 for f in os.listdir(mdir)}
        f3_per_commit, f2_per_commit, live_groups = [], [], []
        for i in range(n_commits):
            rows = [
                ("U", i * 100 + j, f"https://h{j}.ex/p{i % 3}", None,
                 None, f"text {i} {j}", "en")
                for j in range(12)
            ]
            df = spark.createDataFrame(
                rows,
                "op string, seq bigint, url string, warc_ts timestamp, "
                "html binary, text string, lang string",
            )
            t.merge(df, batch_key=("meta", i))
            now = {f: os.path.getsize(os.path.join(mdir, f))
                   for f in os.listdir(mdir)}
            written = sum(sz for f, sz in now.items() if f not in sizes)
            sizes = now
            f3_per_commit.append(written)
            m = t.manifest()
            f2_per_commit.append(len(json.dumps(m["buckets"])))
            live_groups.append(len(m.get("groups", [])))
        head = slice(0, 5)
        tail = slice(n_commits - 5, n_commits)

        def avg(xs):
            return round(sum(xs) / len(xs))

        def med(xs):
            s = sorted(xs)
            return s[len(s) // 2]

        print(json.dumps({
            "n_commits": n_commits,
            # median isolates the steady-state delta commit; the max is
            # the amortized coalesce spike (prefix re-fold)
            "f3_bytes_per_commit_median": med(f3_per_commit),
            "f3_bytes_per_commit_max": max(f3_per_commit),
            "f3_bytes_per_commit_last5_median": med(f3_per_commit[tail]),
            "f3_bytes_total": sum(f3_per_commit),
            "f2_counterfactual_first5": avg(f2_per_commit[head]),
            "f2_counterfactual_last5": avg(f2_per_commit[tail]),
            "f2_counterfactual_total": sum(f2_per_commit),
            "live_groups_max": max(live_groups),
            "entries_total": sum(
                len(es) for es in t.manifest()["buckets"].values()
            ),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
