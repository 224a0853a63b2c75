import numpy as np

from table_recognition_spark.core.geometry import edge_features, node_features


def test_node_features_normalized():
    b = np.array([[10, 20, 30, 40]])
    f = node_features(b, 100, 200)
    # center = (20, 30); w=20 h=20
    assert np.allclose(f, [[0.2, 0.15, 0.2, 0.1]])


def _feat(b, w=100, h=100):
    e = np.array([[0, 1]])
    return edge_features(e, b, w, h)[0]


def test_distance_and_midpoint():
    b = np.array([[0, 0, 20, 20], [40, 0, 60, 20]])
    f = _feat(b)
    # centers (10,10), (50,10) normalized (.1,.1) (.5,.1)
    assert np.isclose(f[0], 0.4, atol=1e-6)
    assert np.isclose(f[1], 0.3, atol=1e-6)
    assert np.isclose(f[2], 0.1, atol=1e-6)


def test_orientation_snap_horizontal():
    # perfectly horizontal pair → atan(0)=0 < 5 → snapped to 180
    b = np.array([[0, 0, 20, 20], [40, 0, 60, 20]])
    assert _feat(b)[3] == 180.0


def test_orientation_vertical_flip():
    # node1 directly above node2: centers (10,10),(10,50)
    # right node = node2 (tie on x → node2), y_dist=40, x_dist=0
    # atan(40/eps)≈90; right lower → 90+(90-90)=90
    b = np.array([[0, 0, 20, 20], [0, 40, 20, 60]])
    f = _feat(b)
    assert np.isclose(f[3], 90.0, atol=1e-4)


def test_orientation_diagonal_flipped():
    # centers (10,10) and (50,50): right node lower → 180-45=135
    b = np.array([[0, 0, 20, 20], [40, 40, 60, 60]])
    f = _feat(b)
    assert np.isclose(f[3], 135.0, atol=1e-4)


def test_overlaps_no_occluder():
    # vertically stacked, same x range → x_overlap = width/min_width = 1
    b = np.array([[0, 0, 20, 10], [0, 30, 20, 40]])
    f = _feat(b)
    assert np.isclose(f[4], 1.0)  # x overlap normalized
    assert f[5] == 0.0  # no y overlap


def test_overlap_with_occluder_subtraction():
    # two stacked boxes with a third box occluding the middle of the gap
    # x range [0,20]; occluder covers x 5..15 → remaining pixels {0..4, 16..20}
    # last-first = 20-0 = 20 → normalized by min width 20 → 1.0 (the
    # reference's last-minus-first rule ignores interior holes)
    b = np.array([[0, 0, 20, 10], [0, 30, 20, 40], [5, 12, 15, 28]])
    f = edge_features(np.array([[0, 1]]), b, 100, 100)[0]
    assert np.isclose(f[4], 1.0)


def test_overlap_fully_occluded_is_zero():
    b = np.array([[0, 0, 20, 10], [0, 30, 20, 40], [0, 12, 20, 28]])
    f = edge_features(np.array([[0, 1]]), b, 100, 100)[0]
    assert f[4] == 0.0


def test_overlap_edge_occluder_trims_range():
    # occluder covers x 0..10 of the [0,20] range → remaining {11..20}
    # → last-first = 9 → 9/20
    b = np.array([[0, 0, 20, 10], [0, 30, 20, 40], [0, 12, 10, 28]])
    f = edge_features(np.array([[0, 1]]), b, 100, 100)[0]
    assert np.isclose(f[4], 9.0 / 20.0)


def test_empty_edges():
    b = np.array([[0, 0, 20, 20]])
    f = edge_features(np.empty((0, 2), dtype=np.int64), b, 100, 100)
    assert f.shape == (0, 6)


class TestPolygonVisibilityJ6:
    """J6 canonical respec (reference geometry_graph_colorer.py:171-228,
    dead code — call commented at :159). Scenario truth is geometric:
    a third bbox blocks iff its boundary cuts the hull interior."""

    def _see(self, bboxes, a=0, b=1):
        import numpy as np

        from table_recognition_spark.core.geometry import (
            polygons_see_each_other,
        )

        return polygons_see_each_other(np.array(bboxes, dtype=float), a, b)

    def test_no_third_node_sees(self):
        assert self._see([[0, 0, 10, 10], [30, 0, 40, 10]])

    def test_blocker_between(self):
        assert not self._see(
            [[0, 0, 10, 10], [30, 0, 40, 10], [15, 2, 25, 8]]
        )

    def test_blocker_outside_hull(self):
        assert self._see(
            [[0, 0, 10, 10], [30, 0, 40, 10], [15, 50, 25, 60]]
        )

    def test_touching_boundary_does_not_cut(self):
        # shares the hull's top edge y=0..(-5) → only tangent contact
        assert self._see(
            [[0, 0, 10, 10], [30, 0, 40, 10], [15, -5, 25, 0]]
        )

    def test_containing_rect_does_not_cut(self):
        # reference split() semantics: a bbox swallowing the whole hull
        # leaves no boundary inside it
        assert self._see(
            [[0, 0, 10, 10], [30, 0, 40, 10], [-100, -100, 100, 100]]
        )

    def test_rect_inside_hull_cuts(self):
        # diagonal pair → hull interior covers the middle; a small box
        # fully inside the hull splits it
        assert not self._see(
            [[0, 0, 10, 10], [30, 30, 40, 40], [18, 18, 22, 22]]
        )

    def test_diagonal_corridor_clear(self):
        # same diagonal pair; a box near the far corner is outside the
        # hull (hull is the convex envelope of the two rects)
        assert self._see(
            [[0, 0, 10, 10], [30, 30, 40, 40], [32, 2, 38, 8]]
        )

    def test_feature_column(self):
        import numpy as np

        from table_recognition_spark.core.geometry import (
            edge_visibility_features,
        )

        bboxes = np.array(
            [[0, 0, 10, 10], [30, 0, 40, 10], [15, 2, 25, 8],
             [15, 50, 25, 60]],
            dtype=float,
        )
        edges = np.array([[0, 1], [0, 3], [2, 3]])
        feats = edge_visibility_features(bboxes, edges)
        assert feats.dtype == np.float32
        assert feats.tolist() == [0.0, 1.0, 1.0]
