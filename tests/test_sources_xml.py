"""PAGE-XML / cTDaR ingestion: codec, round-trips, pipeline equivalence,
GT repair and split loader."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from table_recognition_spark.operators.dataset_ops import (
    filter_split,
    repair_gt_rows,
)
from table_recognition_spark.sources.pagexml import (
    coords_string_to_points,
    gt_cells_to_ctdar_xml,
    ocr_lines_to_page_xml,
    parse_ctdar_xml,
    parse_ctdar_xml_col,
    parse_page_xml,
    parse_page_xml_col,
    points_to_coords_string,
    serialize_page_xml_col,
)


def test_coords_codec_reference_examples():
    # the docstring examples from reference graph/utils.py:15-53
    assert coords_string_to_points("1,1 2,2 3,3 4,4") == [
        (1, 1), (2, 2), (3, 3), (4, 4)]
    assert points_to_coords_string([(1, 1), (2, 2)]) == "1,1 2,2"
    s = "10,20 30,40 50,60"
    assert points_to_coords_string(coords_string_to_points(s)) == s


def _fixture_media(n=6, seed=11):
    from table_recognition_spark.fixtures.generate import make_corpus

    _, media, gt = make_corpus(0, n, seed=seed)
    return media, gt


def test_page_xml_python_roundtrip():
    media, _ = _fixture_media()
    for m in media:
        xml = ocr_lines_to_page_xml(m["ocr_lines"])
        parsed = parse_page_xml(xml)
        assert len(parsed) == len(m["ocr_lines"])
        for got, exp in zip(parsed, m["ocr_lines"]):
            assert got["line_id"] == exp["line_id"]
            assert got["text"] == exp["text"]
            assert got["points"] == [(p["x"], p["y"]) for p in exp["points"]]


def test_ctdar_xml_python_roundtrip():
    _, gt = _fixture_media()
    for g in gt:
        xml = gt_cells_to_ctdar_xml(g["cells"])
        parsed = parse_ctdar_xml(xml)
        assert len(parsed) == len(g["cells"])
        for got, exp in zip(parsed, g["cells"]):
            for k in ("type", "start_row", "end_row", "start_col",
                      "end_col"):
                assert got[k] == exp[k]
            assert got["points"] == [(p["x"], p["y"]) for p in exp["points"]]


@pytest.mark.spark
def test_page_xml_spark_roundtrip(spark):
    from table_recognition_spark.fixtures.generate import (
        corpus_to_spark, make_corpus,
    )

    _, media, _ = make_corpus(0, 8, seed=12)
    _, media_df = corpus_to_spark(spark, [], media)
    xml_df = media_df.select(
        "media_ref", "image", "width", "height",
        serialize_page_xml_col(F.col("ocr_lines")).alias("page_xml"),
    )
    back = xml_df.select(
        "media_ref", "image", "width", "height",
        parse_page_xml_col(F.col("page_xml")).alias("ocr_lines"),
    )
    orig = {r["media_ref"]: r["ocr_lines"]
            for r in media_df.select("media_ref", "ocr_lines").collect()}
    got = {r["media_ref"]: r["ocr_lines"]
           for r in back.select("media_ref", "ocr_lines").collect()}
    assert got == orig


@pytest.mark.spark
def test_page_xml_arrow_table_parse_equals_pandas_col(spark):
    """The Arrow-native table parse (scale path: flat-buffer assembly,
    no per-point python) is result-identical to the pandas-UDF column
    transform AND to the original nested column."""
    from table_recognition_spark.fixtures.generate import (
        corpus_to_spark, make_corpus,
    )
    from table_recognition_spark.sources.pagexml import parse_page_xml_table

    _, media, _ = make_corpus(0, 8, seed=12)
    _, media_df = corpus_to_spark(spark, [], media)
    xml_df = media_df.select(
        "media_ref", "width", "height",
        serialize_page_xml_col(F.col("ocr_lines")).alias("page_xml"),
    )
    via_table = parse_page_xml_table(xml_df, "page_xml", "ocr_lines")
    assert [f.name for f in via_table.schema.fields] == [
        "media_ref", "width", "height", "ocr_lines",
    ]
    orig = {r["media_ref"]: r["ocr_lines"]
            for r in media_df.select("media_ref", "ocr_lines").collect()}
    got = {r["media_ref"]: r["ocr_lines"]
           for r in via_table.select("media_ref", "ocr_lines").collect()}
    assert got == orig
    # empty-input batch shape survives
    assert parse_page_xml_table(xml_df.limit(0)).count() == 0


@pytest.mark.spark
def test_extraction_from_page_xml_equals_direct(spark):
    """A user holding PAGE-XML files gets span-identical output."""
    from table_recognition_spark.core import gnn
    from table_recognition_spark.fixtures.generate import (
        corpus_to_spark, make_corpus,
    )
    from table_recognition_spark.pipeline.extract import extract_flat

    docs, media, _ = make_corpus(20, 10, seed=13)
    docs_df, media_df = corpus_to_spark(spark, docs, media)
    w = gnn.load_weights("weights/g2_seed42.npz")

    xml_media = media_df.select(
        "media_ref", "image", "width", "height",
        serialize_page_xml_col(F.col("ocr_lines")).alias("page_xml"),
    )
    parsed_media = xml_media.select(
        "media_ref", "image", "width", "height",
        parse_page_xml_col(F.col("page_xml")).alias("ocr_lines"),
    )
    direct = sorted(
        map(tuple, extract_flat(docs_df, media_df, w).collect())
    )
    via_xml = sorted(
        map(tuple, extract_flat(docs_df, parsed_media, w).collect())
    )
    assert via_xml == direct


@pytest.mark.spark
def test_ctdar_spark_parse(spark):
    from table_recognition_spark.fixtures.generate import make_corpus

    _, _, gt = make_corpus(0, 5, seed=14)
    rows = [(g["media_ref"], gt_cells_to_ctdar_xml(g["cells"])) for g in gt]
    df = spark.createDataFrame(rows, "media_ref string, gt_xml string")
    parsed = df.select(
        "media_ref", parse_ctdar_xml_col(F.col("gt_xml")).alias("cells")
    )
    got = {r["media_ref"]: [c.asDict(recursive=True) for c in r["cells"]]
           for r in parsed.collect()}
    for g in gt:
        exp = [
            {
                "type": c["type"], "start_row": c["start_row"],
                "end_row": c["end_row"], "start_col": c["start_col"],
                "end_col": c["end_col"],
                "points": [{"x": p["x"], "y": p["y"]} for p in c["points"]],
            }
            for c in g["cells"]
        ]
        assert got[g["media_ref"]] == exp


def _cell(type_, sr, er, sc=0, ec=0):
    return {"type": type_, "start_row": sr, "end_row": er,
            "start_col": sc, "end_col": ec,
            "points": [{"x": 0, "y": 0}, {"x": 1, "y": 1}]}


@pytest.mark.spark
def test_repair_gt_rows(spark):
    from table_recognition_spark.fixtures.generate import GT_SCHEMA

    def mk(cells):
        return [
            (c["type"], c["start_row"], c["end_row"], c["start_col"],
             c["end_col"], [(p["x"], p["y"]) for p in c["points"]])
            for c in cells
        ]

    rows = [
        # header reaches row 3, data starts at row 1 → shift data by 2
        ("t1", mk([_cell("header", 0, 3), _cell("data", 1, 2),
                   _cell("data", 4, 5)])),
        # already consistent → untouched
        ("t2", mk([_cell("header", 0, 1), _cell("data", 2, 3)])),
        # only headers → untouched (reference early-return)
        ("t3", mk([_cell("header", 0, 5)])),
        # only data → untouched
        ("t4", mk([_cell("data", 7, 9)])),
    ]
    gt_df = spark.createDataFrame(rows, GT_SCHEMA)
    out = {r["media_ref"]: [(c["type"], c["start_row"], c["end_row"])
                            for c in r["cells"]]
           for r in repair_gt_rows(gt_df).collect()}
    # reference semantics: diff = header_max - data_min = 3 - 1 = 2
    assert out["t1"] == [("header", 0, 3), ("data", 3, 4), ("data", 6, 7)]
    assert out["t2"] == [("header", 0, 1), ("data", 2, 3)]
    assert out["t3"] == [("header", 0, 5)]
    assert out["t4"] == [("data", 7, 9)]


def test_repair_matches_reference_transcription():
    """Property: the HOF plan equals a direct transcription of
    Table.fix_table on random tables."""
    rng = np.random.default_rng(5)

    def reference_fix(cells):
        cells = [dict(c) for c in cells]
        hm = [c["end_row"] for c in cells if c["type"] == "header"]
        dm = [c["start_row"] for c in cells if c["type"] == "data"]
        if not hm or not dm:
            return cells
        hm, dm = max(hm), min(dm)
        if not hm <= dm:
            diff = hm - dm
            for c in cells:
                if c["type"] == "data":
                    c["start_row"] += diff
                    c["end_row"] += diff
        return cells

    from table_recognition_spark.session import get_spark
    from table_recognition_spark.fixtures.generate import GT_SCHEMA

    spark = get_spark("t", parallelism=2)
    tables = []
    for t in range(25):
        n = int(rng.integers(1, 8))
        cells = []
        for _ in range(n):
            typ = ["header", "data", "header_mark"][int(rng.integers(0, 3))]
            sr = int(rng.integers(0, 6))
            cells.append(_cell(typ, sr, sr + int(rng.integers(0, 3))))
        tables.append((f"t{t}", cells))
    rows = [
        (ref, [(c["type"], c["start_row"], c["end_row"], c["start_col"],
                c["end_col"], [(p["x"], p["y"]) for p in c["points"]])
               for c in cells])
        for ref, cells in tables
    ]
    gt_df = spark.createDataFrame(rows, GT_SCHEMA)
    got = {r["media_ref"]: [(c["type"], c["start_row"], c["end_row"])
                            for c in r["cells"]]
           for r in repair_gt_rows(gt_df).collect()}
    for ref, cells in tables:
        exp = [(c["type"], c["start_row"], c["end_row"])
               for c in reference_fix(cells)]
        assert got[ref] == exp, ref


@pytest.mark.spark
def test_filter_split(spark):
    df = spark.createDataFrame(
        [(f"doc_{i}", i) for i in range(20)], "doc_id string, v int"
    )
    assert filter_split(df, ["doc_3", "doc_7"]).count() == 2
    split_df = spark.createDataFrame([("doc_1",), ("doc_2",), ("doc_99",)],
                                     "doc_id string")
    got = sorted(r["doc_id"] for r in filter_split(df, split_df).collect())
    assert got == ["doc_1", "doc_2"]


@pytest.mark.spark
def test_missing_media_report(spark):
    """F2 observability: dangling media_refs are reported exactly; docs
    whose refs all resolve produce no rows; the extraction inner-join
    drop and the report partition the media spans."""
    import pandas as pd

    from table_recognition_spark.operators.dataset_ops import (
        missing_media_report,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["d1", "d2", "d3"],
                "spans": [
                    [
                        {"kind": "media", "text": "", "media_ref": "ok_1",
                         "offset": 0},
                        {"kind": "media", "text": "", "media_ref": "gone_a",
                         "offset": 1},
                    ],
                    [
                        {"kind": "text", "text": "t", "media_ref": "",
                         "offset": 0},
                    ],
                    [
                        {"kind": "media", "text": "", "media_ref": "gone_b",
                         "offset": 0},
                    ],
                ],
            }
        )
    )
    media = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["ok_1", "unused"]})
    )
    got = sorted(
        (r["doc_id"], r["media_ref"])
        for r in missing_media_report(docs, media).collect()
    )
    assert got == [("d1", "gone_a"), ("d3", "gone_b")]
