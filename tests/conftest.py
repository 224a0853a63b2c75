import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from table_recognition_spark.core import gnn  # noqa: E402
from table_recognition_spark.fixtures.generate import make_corpus  # noqa: E402

WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "weights",
    "g2_seed42.npz",
)


@pytest.fixture(scope="session")
def spark():
    from table_recognition_spark.session import get_spark

    s = get_spark("tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def weights():
    if os.path.exists(WEIGHTS_PATH):
        return gnn.load_weights(WEIGHTS_PATH)
    return gnn.init_weights(42)


@pytest.fixture(scope="session")
def tiny_corpus():
    return make_corpus(8, 5, seed=42)


@pytest.fixture(scope="session")
def small_corpus():
    return make_corpus(50, 40, seed=42, skew_doc=True)
