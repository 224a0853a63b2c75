"""Streaming MinHash-LSH near-dup: the stream's emitted pairs must
equal a batch-computed first-per-bucket oracle that replays the same
signature/banding and the same arrival order (batch index, then
doc_id)."""

import os
import shutil

import pytest

SF = "/root/testdata/sf0.001"
SPLIT = 250  # batch 0: orig doc_id < SPLIT; batch 1: the rest


def _orig(doc_id: int) -> int:
    # planted ids are orig+100000 (exact) / orig+200000 (near)
    return doc_id % 100000


@pytest.mark.spark
@pytest.mark.slow
def test_stream_neardup_matches_first_per_bucket_oracle(spark, tmp_path):
    from table_recognition_spark.operators.dedup import _with_planted_dups
    from table_recognition_spark.streaming.neardup import (
        _SEP,
        _banded,
        stream_neardup_minhash,
    )

    # the operator processes its input verbatim; the synthetic dups are
    # a FIXTURE concern, planted into the staged micro-batch files
    docs = _with_planted_dups(spark.read.parquet(f"{SF}/documents.parquet"))

    # --- expected: replay first-per-bucket on the static banding ------
    banded = _banded(docs).toPandas()
    by_bucket = {}
    for r in banded.itertuples():
        by_bucket.setdefault((r.band, r.bucket), []).append(
            (0 if _orig(r.doc_id) < SPLIT else 1, r.doc_id, r.shingles)
        )
    expected = set()
    for (band, bucket), members in by_bucket.items():
        members.sort()  # (batch, doc_id) arrival order
        keep_doc, keep = members[0][1], set(members[0][2].split(_SEP))
        for _, d, joined in members[1:]:
            sh = set(joined.split(_SEP))
            n_common, n_union = len(keep & sh), len(keep | sh)
            if 2 * n_common >= n_union:
                expected.add((band, bucket, keep_doc, d, n_common, n_union))
    assert expected, "oracle found no near-dups — fixture broken"

    # --- stage two micro-batch files in arrival order -----------------
    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    for i, pred in enumerate(
        (f"doc_id % 100000 < {SPLIT}", f"doc_id % 100000 >= {SPLIT}")
    ):
        part_dir = tmp_path / f"part{i}"
        docs.filter(pred).coalesce(1).write.parquet(str(part_dir))
        part = next(
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        )
        dst = in_dir / f"batch_{i}.parquet"
        shutil.copy(part_dir / part, dst)
        os.utime(dst, (1_000_000_000 + 100 * i,) * 2)

    schema = "doc_id bigint, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(in_dir))
    )
    q = (
        stream_neardup_minhash(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_pairs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (
            r["band"], r["bucket"], r["keep_doc"], r["dup_doc"],
            r["n_common"], r["n_union"],
        )
        for r in spark.sql("SELECT * FROM neardup_pairs").collect()
    }
    assert got == expected


@pytest.mark.spark
@pytest.mark.slow
def test_stream_neardup_resumes_from_checkpoint(spark, tmp_path):
    """Kill the query between micro-batches and restart from the same
    checkpoint: bucket state must survive, so batch-1 dups are still
    matched against batch-0 representatives and nothing re-emits."""
    from table_recognition_spark.operators.dedup import _with_planted_dups
    from table_recognition_spark.streaming.neardup import (
        _SEP,
        _banded,
        stream_neardup_minhash,
    )

    docs = _with_planted_dups(spark.read.parquet(f"{SF}/documents.parquet"))

    banded = _banded(docs).toPandas()
    by_bucket = {}
    for r in banded.itertuples():
        by_bucket.setdefault((r.band, r.bucket), []).append(
            (0 if _orig(r.doc_id) < SPLIT else 1, r.doc_id, r.shingles)
        )
    expected = {0: set(), 1: set()}
    for (band, bucket), members in by_bucket.items():
        members.sort()
        keep_doc, keep = members[0][1], set(members[0][2].split(_SEP))
        for batch, d, joined in members[1:]:
            sh = set(joined.split(_SEP))
            n_common, n_union = len(keep & sh), len(keep | sh)
            if 2 * n_common >= n_union:
                expected[batch].add(
                    (band, bucket, keep_doc, d, n_common, n_union)
                )

    in_dir = tmp_path / "docs_in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string"

    def _stage(i, pred):
        part_dir = tmp_path / f"part{i}"
        docs.filter(pred).coalesce(1).write.parquet(str(part_dir))
        part = next(
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        )
        dst = in_dir / f"batch_{i}.parquet"
        shutil.copy(part_dir / part, dst)
        os.utime(dst, (1_000_000_000 + 100 * i,) * 2)

    out_dir = str(tmp_path / "pairs_out")

    def _run():
        # memory sinks can't recover from a checkpoint; a file sink can
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(str(in_dir))
        )
        q = (
            stream_neardup_minhash(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return {
            (
                r["band"], r["bucket"], r["keep_doc"], r["dup_doc"],
                r["n_common"], r["n_union"],
            )
            for r in spark.read.parquet(out_dir).collect()
        }

    _stage(0, f"doc_id % 100000 < {SPLIT}")
    got0 = _run()

    _stage(1, f"doc_id % 100000 >= {SPLIT}")
    got1 = _run()  # fresh query, same checkpoint

    assert expected[0] and expected[1], "fixture produced no dups"
    assert got0 == expected[0]
    # restart kept the bucket state: batch-1 dups matched against
    # batch-0 representatives, batch-0 pairs not re-emitted
    assert got1 == expected[0] | expected[1]
