#!/usr/bin/env python
"""Materialize the committed expected-output parquets that back the
DuckDB oracles of the non-SQL-expressible queries (GNN extraction,
binary media decode).

Every one of these outputs is fully deterministic — seeded weights,
canonical node/edge ordering, pinned pure-numpy codecs — so its output
at the driver's correctness scale (sf0.01) is a fixed artifact. We
commit it under dist/expected/<query>.parquet and the oracle becomes
``SELECT * FROM read_parquet(...)``: DuckDB replays the committed
truth while Spark recomputes live, which turns the driver's rows-only
check into the full rows+schema+hash gate and turns any regression
(kernel, codec, ordering) into a hash mismatch.

Staleness guard: tests/test_queries_duckdb.py re-runs every one of
these queries against the committed parquet on each pytest run; this
script only needs re-running when an intentional semantic change lands
(then the diff shows up in git).

Usage: python scripts/gen_expected.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# sf0.01 is the scale the driver's correctness gate runs at; the
# documents table DIFFERS between sf0.001 and sf0.01 (same row count,
# different seeded text), so the committed truth is pinned to sf0.01
# and the pytest mirror runs these queries at sf0.01 too.
SF_DIR = "/root/testdata/sf0.01"

# queries whose committed expected output lives under dist/expected/
EXPECTED_QUERIES = [
    "extract_interleaved",
    "extract_interleaved_visibility",
    "extract_interleaved_visual",
    "extract_from_pagexml",
    "media_image_stats",
    "media_patch_embeddings",
    "media_audio_stats",
    "media_video_frame_stats",
    "sim_ivf_topk",
    "dedup_semantic",
    "text_bpe_merges",
    "text_bpe_token_counts",
]


def expected_dir(name: str) -> str:
    return os.path.join(REPO, "dist", "expected", f"{name}.parquet")


def main() -> None:
    names = sys.argv[1:] or EXPECTED_QUERIES
    import __spark_entry__ as E
    from table_recognition_spark.session import get_spark

    qs = E.queries()
    spark = get_spark("gen_expected", parallelism=8)
    for name in names:
        df = qs[name](spark, SF_DIR)
        out = expected_dir(name)
        tmp = out + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        # strip non-data files so the committed artifact is one part file
        for f in os.listdir(tmp):
            if not f.endswith(".parquet"):
                os.remove(os.path.join(tmp, f))
        shutil.rmtree(out, ignore_errors=True)
        os.rename(tmp, out)
        n = spark.read.parquet(out).count()
        print(f"{name}: {n} rows -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
