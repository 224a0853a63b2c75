"""End-to-end span-sequence parity: Spark pipeline == single-node oracle.

The per-row invariant from BASELINE.json input_hint: exact per-doc_id
equality of the (kind, text, media_ref, order) sequence.
"""

import pytest

from table_recognition_spark.fixtures.generate import corpus_to_spark
from table_recognition_spark.oracle.extract import extract_corpus
from table_recognition_spark.pipeline.extract import extract, extract_flat


def _spans_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def _run_parity(spark, corpus, weights, **kwargs):
    docs, media, _ = corpus
    docs_df, media_df = corpus_to_spark(spark, docs, media)
    out = extract(docs_df, media_df, weights, **kwargs)
    got = {
        r["doc_id"]: _spans_tuples([s.asDict() for s in r["spans"]])
        for r in out.collect()
    }
    expected = {
        did: _spans_tuples(spans)
        for did, spans in extract_corpus(docs, media, weights).items()
    }
    assert set(got) == set(expected)
    for did in sorted(expected):
        assert got[did] == expected[did], f"span mismatch for {did}"


@pytest.mark.spark
def test_parity_small_corpus_jvm_text(spark, small_corpus, weights):
    _run_parity(spark, small_corpus, weights, text_engine="jvm")


@pytest.mark.spark
def test_parity_tiny_corpus_pandas_udf_text(spark, tiny_corpus, weights):
    _run_parity(spark, tiny_corpus, weights, text_engine="pandas_udf")


@pytest.mark.spark
def test_parity_with_kernel_repartition(spark, tiny_corpus, weights):
    _run_parity(spark, tiny_corpus, weights, kernel_partitions=7)


@pytest.mark.spark
def test_flat_output_offsets_dense(spark, tiny_corpus, weights):
    docs, media, _ = tiny_corpus
    docs_df, media_df = corpus_to_spark(spark, docs, media)
    flat = extract_flat(docs_df, media_df, weights)
    rows = flat.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["offset"])
    for offs in by_doc.values():
        assert sorted(offs) == list(range(len(offs)))


@pytest.mark.spark
def test_missing_media_ref_emits_nothing(spark, weights):
    docs = [
        {
            "doc_id": "d1",
            "spans": [
                {"kind": "text", "text": "<p>hi</p>", "media_ref": "", "offset": 0},
                {"kind": "media", "text": "", "media_ref": "missing", "offset": 1},
            ],
        }
    ]
    from table_recognition_spark.fixtures.generate import make_corpus

    _, media, _ = make_corpus(1, 1, seed=1)
    docs_df, media_df = corpus_to_spark(spark, docs, media)
    out = extract(docs_df, media_df, weights)
    rows = out.collect()
    assert len(rows) == 1
    spans = [s.asDict() for s in rows[0]["spans"]]
    assert _spans_tuples(spans) == [("main_text", "hi", "", 0)]


@pytest.mark.spark
def test_flat_equals_exploded_nested(spark, tiny_corpus, weights):
    """extract_flat uses a window row_number; extract uses
    collect_list/array_sort — the two paths must agree row-for-row."""
    from pyspark.sql import functions as F

    docs, media, _ = tiny_corpus
    docs_df, media_df = corpus_to_spark(spark, docs, media)
    flat = {
        (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
        for r in extract_flat(docs_df, media_df, weights).collect()
    }
    nested = {
        (r["doc_id"], s["offset"], s["kind"], s["text"], s["media_ref"])
        for r in extract(docs_df, media_df, weights).collect()
        for s in r["spans"]
    }
    assert flat == nested
