import numpy as np

from table_recognition_spark.core.bbox import (
    bbox_centers,
    polygons_to_bboxes,
    rect_iou,
    rect_min_distance,
    rects_intersect,
)


def test_polygon_to_bbox_and_truncating_center():
    # node.py:24-37: bbox from polygon extremes; center int-truncated
    polys = [[(3, 7), (10, 7), (10, 12), (3, 12)]]
    b = polygons_to_bboxes(polys)
    assert b.tolist() == [[3, 7, 10, 12]]
    c = bbox_centers(b)
    # int(3 + (10-3)/2) = int(6.5) = 6 ; int(7 + 5/2) = 9
    assert c.tolist() == [[6, 9]]


def test_rect_min_distance_overlap_and_gap():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[5, 5, 15, 15], [20, 0, 30, 10], [20, 20, 30, 30]])
    d = rect_min_distance(a, b)[0]
    assert d[0] == 0.0  # overlapping
    assert d[1] == 10.0  # pure x gap
    assert np.isclose(d[2], np.hypot(10, 10))  # corner gap


def test_rect_iou_exact():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]])
    iou = rect_iou(a, b)[0]
    assert np.isclose(iou[0], 1.0)
    assert np.isclose(iou[1], 50.0 / 150.0)
    assert iou[2] == 0.0


def test_rects_intersect_closed_intervals():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[10, 10, 20, 20], [11, 0, 20, 10]])
    hit = rects_intersect(a, b)[0]
    assert hit[0]  # touching counts (closed)
    assert not hit[1]
