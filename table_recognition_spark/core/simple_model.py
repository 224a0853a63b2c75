"""G1 "SimpleModel" as pure numpy — canonical respec.

Reference: /root/reference/table_recognition/models/simple_model.py:7-36 —
GATConv(4→16, edge_dim=6) → edge MLP([x_src ‖ e ‖ x_dst]: 38→16→16→8→4)
→ GATConv(16→2, edge_dim=4), log_softmax on both heads. The reference
never configures this model (config uses NodeEdgeMLPEnding, SURVEY G1),
ships no weights, and torch/PyG are absent here, so this is a canonical
single-head GATConv respec with the same layer shapes and a fixed seeded
init — frozen semantics below, pinned by a per-node loop transcription
in tests:

- GATConv (PyG v2 semantics, heads=1): h = x·W; self-loops added for
  every node with edge features set to the mean edge feature
  (fill_value='mean'); per edge (s→t):
  logit = LeakyReLU_0.2(a_src·h_s + a_dst·h_t + a_edge·(e·W_e));
  α = softmax over each target's incoming edges; out_t = Σ α·h_s + bias.
- Dropout layers are eval-mode (identity); inference is deterministic.
"""

from __future__ import annotations

import numpy as np

from .gnn import _log_softmax

NEG_SLOPE = 0.2

# (name, fan_in, fan_out) for every parameter matrix
_G1_SHAPES = [
    ("gat1.lin", 4, 16),
    ("gat1.lin_edge", 6, 16),
    ("gat1.att_src", 16, 1),
    ("gat1.att_dst", 16, 1),
    ("gat1.att_edge", 16, 1),
    ("edge.0", 16 + 6 + 16, 16),
    ("edge.1", 16, 16),
    ("edge.2", 16, 8),
    ("edge.3", 8, 4),
    ("gat2.lin", 16, 2),
    ("gat2.lin_edge", 4, 2),
    ("gat2.att_src", 2, 1),
    ("gat2.att_dst", 2, 1),
    ("gat2.att_edge", 2, 1),
]
_G1_BIASES = {"gat1.lin": 16, "edge.0": 16, "edge.1": 16, "edge.2": 8,
              "edge.3": 4, "gat2.lin": 2}


def init_weights(seed: int = 42) -> dict:
    """Xavier-uniform float32, zero biases (same convention as G2)."""
    rng = np.random.default_rng(seed)
    w = {}
    for name, fan_in, fan_out in _G1_SHAPES:
        limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
        w[name + ".w"] = rng.uniform(
            -limit, limit, size=(fan_in, fan_out)
        ).astype(np.float32)
    for name, dim in _G1_BIASES.items():
        w[name + ".b"] = np.zeros(dim, dtype=np.float32)
    return w


def _leaky_relu(z):
    return np.where(z > 0, z, NEG_SLOPE * z)


def _gat_conv(prefix, w, x, edge_index, edge_attr):
    """Single-head GATConv forward per the frozen spec above.

    x: (N, in); edge_index: (E, 2) rows (src, dst); edge_attr: (E, d).
    Returns (N, out)."""
    n = len(x)
    h = x @ w[prefix + ".lin.w"]  # (N, out)
    if edge_index.size:
        src = edge_index[:, 0].astype(np.int64)
        dst = edge_index[:, 1].astype(np.int64)
        mean_e = edge_attr.mean(axis=0)
    else:
        src = np.empty(0, dtype=np.int64)
        dst = np.empty(0, dtype=np.int64)
        mean_e = np.zeros(edge_attr.shape[1], dtype=np.float32)
    # self-loops for every node, edge feature = mean of real edges
    loop = np.arange(n, dtype=np.int64)
    src_all = np.concatenate([src, loop])
    dst_all = np.concatenate([dst, loop])
    e_all = np.concatenate(
        [edge_attr.reshape(-1, edge_attr.shape[1]),
         np.tile(mean_e, (n, 1))],
        axis=0,
    ).astype(np.float32)
    he = e_all @ w[prefix + ".lin_edge.w"]  # (E+N, out)

    logit = (
        (h @ w[prefix + ".att_src.w"])[src_all, 0]
        + (h @ w[prefix + ".att_dst.w"])[dst_all, 0]
        + (he @ w[prefix + ".att_edge.w"])[:, 0]
    )
    logit = _leaky_relu(logit)
    # softmax per destination node (max-subtracted for stability)
    mx = np.full(n, -np.inf, dtype=logit.dtype)
    np.maximum.at(mx, dst_all, logit)
    ex = np.exp(logit - mx[dst_all])
    denom = np.zeros(n, dtype=ex.dtype)
    np.add.at(denom, dst_all, ex)
    alpha = ex / denom[dst_all]
    out = np.zeros_like(h)
    np.add.at(out, dst_all, alpha[:, None] * h[src_all])
    b = w.get(prefix + ".lin.b")
    return out + b if b is not None else out


def _edge_mlp(w, x):
    h = x @ w["edge.0.w"] + w["edge.0.b"]
    np.maximum(h, 0.0, out=h)  # ReLU (Dropout = identity in eval)
    h = h @ w["edge.1.w"] + w["edge.1.b"]
    np.maximum(h, 0.0, out=h)
    h = h @ w["edge.2.w"] + w["edge.2.b"]
    np.maximum(h, 0.0, out=h)
    return h @ w["edge.3.w"] + w["edge.3.b"]


def forward(x, edge_index, edge_attr, weights):
    """SimpleModel forward: (node_log_probs (N,2), edge_log_probs (E,4))."""
    x = np.asarray(x, dtype=np.float32)
    e = np.asarray(edge_attr, dtype=np.float32)
    if e.ndim != 2:  # ambiguous empty reshape guard
        e = e.reshape(len(edge_index), 6)
    x1 = _gat_conv("gat1", weights, x, edge_index, e)
    if edge_index.size:
        src = edge_index[:, 0].astype(np.int64)
        dst = edge_index[:, 1].astype(np.int64)
        e2 = _edge_mlp(
            weights, np.concatenate([x1[src], e, x1[dst]], axis=1)
        )
    else:
        e2 = np.zeros((0, 4), dtype=np.float32)
    x2 = _gat_conv("gat2", weights, x1, edge_index, e2)
    return _log_softmax(x2), _log_softmax(e2) if len(e2) else e2
