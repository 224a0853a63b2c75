"""G1 SimpleModel (numpy GATConv respec): vectorized forward vs a
per-node loop transcription, determinism, shapes, valid distributions."""

import numpy as np

from table_recognition_spark.core import simple_model as G1


def _loop_gat(prefix, w, x, edge_index, edge_attr):
    """Per-node transcription of the frozen GATConv spec (slow, obvious)."""
    n = len(x)
    h = x @ w[prefix + ".lin.w"]
    mean_e = (
        edge_attr.mean(axis=0)
        if len(edge_index)
        else np.zeros(edge_attr.shape[1], dtype=np.float32)
    )
    # build incoming-edge lists incl. one self-loop each
    incoming = {i: [] for i in range(n)}
    for k in range(len(edge_index)):
        s, d = int(edge_index[k][0]), int(edge_index[k][1])
        incoming[d].append((s, edge_attr[k]))
    for i in range(n):
        incoming[i].append((i, mean_e))
    out = np.zeros_like(h)
    for i in range(n):
        logits, hs = [], []
        for s, e in incoming[i]:
            he = e.astype(np.float32) @ w[prefix + ".lin_edge.w"]
            z = (
                float(h[s] @ w[prefix + ".att_src.w"][:, 0])
                + float(h[i] @ w[prefix + ".att_dst.w"][:, 0])
                + float(he @ w[prefix + ".att_edge.w"][:, 0])
            )
            z = z if z > 0 else G1.NEG_SLOPE * z
            logits.append(z)
            hs.append(h[s])
        logits = np.array(logits)
        a = np.exp(logits - logits.max())
        a = a / a.sum()
        out[i] = sum(ai * hi for ai, hi in zip(a, hs))
    b = w.get(prefix + ".lin.b")
    return out + b if b is not None else out


def _random_graph(rng, n, e):
    x = rng.normal(size=(n, 4)).astype(np.float32)
    edge_index = np.stack(
        [rng.integers(0, n, size=e), rng.integers(0, n, size=e)], axis=1
    ).astype(np.int64)
    edge_attr = rng.normal(size=(e, 6)).astype(np.float32)
    return x, edge_index, edge_attr


def test_gat_conv_matches_loop_transcription():
    rng = np.random.default_rng(3)
    w = G1.init_weights(7)
    for _ in range(5):
        n, e = int(rng.integers(2, 12)), int(rng.integers(1, 30))
        x, ei, ea = _random_graph(rng, n, e)
        got = G1._gat_conv("gat1", w, x, ei, ea)
        exp = _loop_gat("gat1", w, x, ei, ea)
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_forward_shapes_and_distributions():
    rng = np.random.default_rng(4)
    w = G1.init_weights(42)
    x, ei, ea = _random_graph(rng, 9, 20)
    nodes, edges = G1.forward(x, ei, ea, w)
    assert nodes.shape == (9, 2) and edges.shape == (20, 4)
    np.testing.assert_allclose(np.exp(nodes).sum(axis=1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.exp(edges).sum(axis=1), 1.0, rtol=1e-5)
    # deterministic
    n2, e2 = G1.forward(x, ei, ea, w)
    assert np.array_equal(nodes, n2) and np.array_equal(edges, e2)


def test_forward_edgeless_graph():
    w = G1.init_weights(42)
    x = np.zeros((3, 4), dtype=np.float32)
    ei = np.empty((0, 2), dtype=np.int64)
    ea = np.empty((0, 6), dtype=np.float32)
    nodes, edges = G1.forward(x, ei, ea, w)
    assert nodes.shape == (3, 2) and len(edges) == 0
