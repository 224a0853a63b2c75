"""Edge cases for the greedy sequence-packing operator: oversized docs,
empty docs, exact-boundary fills, shard independence."""

import pandas as pd
import pytest

from table_recognition_spark.operators.textstats import (
    PACK_BUDGET,
    _pack_group,
)


def _pack(n_tokens):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(n_tokens)),
            "source": ["s"] * len(n_tokens),
            "shard": [0] * len(n_tokens),
            "n_tokens": n_tokens,
        }
    )
    return _pack_group(pdf)["bin_id"].tolist()


def test_simple_fill_and_reset():
    # 200+200 fit in one 512 bin; +200 overflows -> new bin
    assert _pack([200, 200, 200]) == [0, 0, 1]


def test_exact_boundary_stays_in_bin():
    assert _pack([PACK_BUDGET - 100, 100, 1]) == [0, 0, 1]


def test_oversized_doc_gets_own_bin():
    # doc bigger than the budget occupies its bin alone; the next doc
    # always starts a fresh bin
    assert _pack([PACK_BUDGET + 50, 1, 1]) == [0, 1, 1]


def test_leading_empty_doc_does_not_split():
    # an empty doc leaves the bin empty (fill 0), so a following
    # oversized doc still lands in the same bin
    assert _pack([0, PACK_BUDGET + 10, 5]) == [0, 0, 1]


def test_unsorted_input_is_packed_in_doc_id_order():
    pdf = pd.DataFrame(
        {
            "doc_id": [2, 0, 1],
            "source": ["s"] * 3,
            "shard": [0] * 3,
            "n_tokens": [200, 400, 400],
        }
    )
    out = _pack_group(pdf)
    # packed in doc_id order (400, 400, 200) -> bins 0, 1, 2;
    # input order (200, 400, 400) would have produced (1, 2, 0)
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["bin_id"].tolist() == [0, 1, 2]


@pytest.mark.spark
def test_shards_pack_independently(spark):
    from pyspark.sql import functions as F

    from table_recognition_spark.operators.textstats import pack_sequences

    out = pack_sequences(spark, "/root/testdata/sf0.001")
    # every (source, shard) group starts at bin 0 and bins are contiguous
    per = (
        out.groupBy("source", "shard")
        .agg(
            F.min("bin_id").alias("lo"),
            F.max("bin_id").alias("hi"),
            F.countDistinct("bin_id").alias("n"),
        )
        .collect()
    )
    assert per and all(r["lo"] == 0 and r["n"] == r["hi"] + 1 for r in per)
    # a bin only exceeds the budget if it holds an oversized doc
    bad = (
        out.groupBy("source", "shard", "bin_id")
        .agg(
            F.sum("n_tokens").alias("fill"),
            F.max("n_tokens").alias("biggest"),
        )
        .filter(
            (F.col("fill") > PACK_BUDGET) & (F.col("biggest") <= PACK_BUDGET)
        )
        .count()
    )
    assert bad == 0
