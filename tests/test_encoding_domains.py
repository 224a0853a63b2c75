"""Pin the integer-packing domain assumptions the encoded-argmin /
encoded-minimum patterns rely on (ADVICE round 5): the encodings are
exact only while the low field stays under its base and the product
stays under 2^63. These checks read the parquet fixtures directly (no
Spark) so they run in milliseconds at every scale the gates use.
"""

import duckdb
import pytest

from table_recognition_spark.operators.textstats import POS_BASE

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("sf", SF_DIRS)
def test_q2_argmin_encoding_domain(sf):
    """q2 packs (cost_c, suppkey) as cost_c * 100000 + suppkey: exact
    iff every suppkey < 1e5 and the product keeps bigint headroom
    (cost_c < ~9.2e13)."""
    con = duckdb.connect()
    max_supp = con.sql(
        f"SELECT max(l_suppkey) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    assert max_supp < 100_000, max_supp
    max_cost_c = con.sql(
        "SELECT max(cast(round(l_extendedprice*100) as bigint)) "
        f"FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    assert max_cost_c * 100_000 + max_supp < 2**63, max_cost_c


@pytest.mark.parametrize("sf", SF_DIRS)
def test_winnow_pos_encoding_domain(sf):
    """Winnowing packs (hash32, pos) as hash * POS_BASE + pos: exact
    iff every token position < POS_BASE and the worst-case product
    (2^32-1) * POS_BASE + POS_BASE stays under 2^63."""
    assert (2**32 - 1) * POS_BASE + POS_BASE < 2**63
    con = duckdb.connect()
    max_toks = con.sql(
        "SELECT max(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) "
        f"FROM read_parquet('{sf}/documents.parquet')"
    ).fetchone()[0]
    assert max_toks < POS_BASE, max_toks
