"""Kill/resume idempotency (SURVEY.md §5.4): a run crashed mid-way and
resumed must produce byte-identical table state to an uninterrupted run."""

import pytest

from table_recognition_spark.fixtures.generate import corpus_to_spark
from table_recognition_spark.pipeline.checkpoint import CheckpointedExtract


def _collect(df):
    rows = df.collect()
    return sorted(
        (
            r["doc_id"],
            tuple(
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in r["spans"]
            ),
        )
        for r in rows
    )


@pytest.mark.spark
def test_crash_resume_equals_single_run(spark, tiny_corpus, weights, tmp_path):
    docs, media, _ = tiny_corpus
    docs_df, media_df = corpus_to_spark(spark, docs, media)

    ref = CheckpointedExtract(str(tmp_path / "ref"), n_chunks=4)
    ref.run(spark, docs_df, media_df, weights)

    ck = CheckpointedExtract(str(tmp_path / "crashy"), n_chunks=4)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ck.run(spark, docs_df, media_df, weights, fail_after=2)
    assert len(ck.committed()) == 2

    # resume completes only the remaining chunks
    ran = ck.run(spark, docs_df, media_df, weights)
    assert ran == 2
    assert ck.committed() == {0, 1, 2, 3}

    assert _collect(ck.read_output(spark)) == _collect(ref.read_output(spark))

    # progress records carry lineage + throughput
    prog = ck.read_progress(spark).collect()
    assert len(prog) == 4
    for p in prog:
        assert "weights=md5:" in p["lineage"]
        assert p["docs_per_sec"] >= 0


@pytest.mark.spark
def test_rerun_is_noop(spark, tiny_corpus, weights, tmp_path):
    docs, media, _ = tiny_corpus
    docs_df, media_df = corpus_to_spark(spark, docs, media)
    ck = CheckpointedExtract(str(tmp_path / "once"), n_chunks=3)
    assert ck.run(spark, docs_df, media_df, weights) == 3
    assert ck.run(spark, docs_df, media_df, weights) == 0
