import numpy as np

from table_recognition_spark.core.assemble import assemble_cells
from table_recognition_spark.core.labels import (
    edge_type,
    label_graph,
    majority_type,
)


def test_edge_type_truth_table():
    # quirk preserved: row-subset ⇒ vertical, col-subset ⇒ horizontal
    # (output.py:107-126, SURVEY.md §2.10.7)
    same = (0, 0, 1, 1)
    assert edge_type(same, same) == "cell"
    assert edge_type((0, 0, 1, 1), (0, 2, 1, 1)) == "vertical"  # row subset
    assert edge_type((0, 0, 1, 1), (1, 1, 1, 2)) == "horizontal"  # col subset
    assert edge_type((0, 0, 0, 0), (1, 1, 1, 1)) == "no-relationship"
    assert edge_type(None, (0, 0, 0, 0)) == "no-relationship"


def test_majority_type_duplicate_key_quirk():
    # "header_empty" effective priority 0 (last-wins in output.py:142)
    assert majority_type(["header_empty", "data"]) == "data"
    assert majority_type(["header_empty", "data_mark"]) == "header_empty"
    assert majority_type(["header", "data_empty"]) == "header"


def test_label_graph_no_gt_means_data():
    nb = np.array([[0, 0, 10, 10]])
    nl, el = label_graph(
        nb, np.empty((0, 2), dtype=np.int64), np.empty((0, 4)), [], np.empty((0, 4))
    )
    assert nl.tolist() == [1]  # data (output.py:54-56)


def test_label_graph_grid():
    # two GT cells side by side in one row; lines centered in each
    cells = np.array([[0, 0, 50, 30], [50, 0, 100, 30]])
    grid = np.array([[0, 0, 0, 0], [0, 0, 1, 1]])
    types = ["header", "header"]
    nodes = np.array([[10, 10, 40, 20], [60, 10, 90, 20]])
    edges = np.array([[0, 1]])
    nl, el = label_graph(nodes, edges, cells, types, grid)
    assert nl.tolist() == [0, 0]
    # quirk §2.10.7: equal row ranges ARE subsets of each other → "vertical"
    # even for same-row neighbours (rule inversion preserved verbatim)
    assert el.tolist() == [2]


def test_assemble_cells_components_and_order():
    b = np.array(
        [
            [0, 0, 10, 10],  # 0 top-left
            [0, 12, 10, 20],  # 1 directly below 0 (same cell, 2nd line)
            [50, 0, 60, 10],  # 2 top-right
            [0, 50, 10, 60],  # 3 bottom-left, isolated
        ]
    )
    texts = ["a", "b", "c", "d"]
    edges = np.array([[0, 1], [1, 0], [0, 2]])
    cls = np.array([0, 0, 3])  # only 0↔1 is a 'cell' edge
    cells = assemble_cells(edges, cls, b, texts)
    assert cells == ["a\nb", "c", "d"]


def test_assemble_singletons_orderered_by_ymin_xmin():
    b = np.array([[50, 0, 60, 10], [0, 0, 10, 10], [0, 30, 10, 40]])
    texts = ["right", "left", "low"]
    cells = assemble_cells(
        np.empty((0, 2), dtype=np.int64), np.empty(0, dtype=np.int64), b, texts
    )
    assert cells == ["left", "right", "low"]
