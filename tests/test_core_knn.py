import numpy as np

from table_recognition_spark.core.knn import knn_edges


def test_reflexive_removed_and_bidirectional():
    # 3 boxes on a line; K=4 but n=3 → everyone connects to everyone
    b = np.array([[0, 0, 10, 10], [20, 0, 30, 10], [40, 0, 50, 10]])
    e = knn_edges(b)
    assert (e[:, 0] != e[:, 1]).all()
    pairs = set(map(tuple, e.tolist()))
    for s, d in list(pairs):
        assert (d, s) in pairs  # both directions (k_nearest_neighbors.py:22-25)


def test_canonical_order_and_dedup():
    b = np.array([[0, 0, 10, 10], [20, 0, 30, 10], [40, 0, 50, 10], [60, 0, 70, 10]])
    e = knn_edges(b)
    lst = list(map(tuple, e.tolist()))
    assert lst == sorted(set(lst))  # sorted by (src, dst), unique


def test_tie_break_by_neighbor_id():
    # node 0 equidistant (gap 5) from nodes 1,2,3,4 → K=4 keeps self + 3
    # smallest ids among the ties: 1, 2, 3
    b = np.array(
        [
            [20, 20, 30, 30],  # 0 center
            [20, 0, 30, 15],  # 1 above, gap 5
            [20, 35, 30, 50],  # 2 below, gap 5
            [0, 20, 15, 30],  # 3 left, gap 5
            [35, 20, 50, 30],  # 4 right, gap 5
        ]
    )
    e = knn_edges(b)
    from_0 = {d for s, d in e.tolist() if s == 0}
    # 4 is only connected to 0 via 4's own query (4→0 both directions adds 0↔4)
    # but node 0's own K selection must have chosen 1,2,3
    assert {1, 2, 3} <= from_0


def test_single_node_graph():
    b = np.array([[0, 0, 5, 5]])
    e = knn_edges(b)
    assert e.shape == (0, 2)
