"""Mirror of the driver's correctness gate: every queries() entry with an
oracle must match DuckDB exactly (columns, row count, values) at sf0.001
(sf0.01 is the driver's scale; 0.001 keeps the suite fast — the documents
and embeddings tables are identical at both scales)."""

import pytest

import __spark_entry__ as E
from table_recognition_spark.queries.compare import compare

SF = "/root/testdata/sf0.001"

_QUERIES = E.queries()
_ORACLES = E.oracle_sql()


@pytest.mark.spark
@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_duckdb(spark, name):
    ok, detail = compare(_QUERIES[name](spark, SF), _ORACLES[name], SF)
    assert ok, f"{name}: {detail}"


@pytest.mark.spark
def test_oracle_keys_subset_of_queries():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.spark
def test_rows_only_queries_run(spark):
    for name in sorted(set(_QUERIES) - set(_ORACLES)):
        n = _QUERIES[name](spark, SF).count()
        assert n > 0, f"{name} returned no rows"


@pytest.mark.spark
def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "offset", "kind", "text", "media_ref"}
