"""True-IVF ANN operator: deterministic k-means coarse quantizer,
broadcast centroids, nprobe cluster probing, exact in-cluster rank."""

import numpy as np
import pytest

from table_recognition_spark.operators import similarity as S

SF = "/root/testdata/sf0.01"  # committed-expected-parquet scale


def test_kmeans_deterministic_and_partitions():
    rng = np.random.default_rng(5)
    x = (rng.normal(size=(200, 8)) * 1000).astype(np.int64)
    a = S._ivf_train_centroids(x)
    b = S._ivf_train_centroids(x)
    assert np.array_equal(a, b)
    assert a.shape == (S.IVF_CLUSTERS, 8)
    # centroids are means of real members: all within the data hull
    assert a.min() >= x.min() and a.max() <= x.max()


def test_kmeans_fewer_points_than_clusters():
    x = np.arange(12, dtype=np.int64).reshape(3, 4)
    c = S._ivf_train_centroids(x)
    assert c.shape == (3, 4)


@pytest.mark.spark
@pytest.mark.slow
def test_ivf_recall_vs_exact(spark):
    """The IVF top-k must recover most of the exact top-k while probing
    only IVF_PROBE/IVF_CLUSTERS of the corpus — the accuracy/cost knob
    a production ANN deployment tunes. Random unit vectors (this
    fixture) are the worst case for a coarse quantizer; measured 0.68
    at nprobe=6."""
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in S.sim_ivf_topk(spark, SF).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in S.sim_bruteforce_topk(spark, SF).collect()
    }
    assert len(exact) == S.N_QUERIES * S.TOP_K
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.6, recall
    # deterministic end-to-end (this is what makes the committed
    # expected-parquet oracle sound)
    again = {
        (r["query_id"], r["vec_id"])
        for r in S.sim_ivf_topk(spark, SF).collect()
    }
    assert ivf == again
