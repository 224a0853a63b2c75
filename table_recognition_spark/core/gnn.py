"""G2 message-passing GNN ("NodeEdgeMLPEnding") as pure numpy.

Architecture mirrors /root/reference/table_recognition/models/
node_edge_mlp_ending.py:9-113 exactly:

- 4 MetaLayers. Layer 1: node 4→16, edge 6→16, hidden 32, no residual.
  Layers 2-4: 16→16 both, hidden 64, residual on both sub-models.
- EdgeSubModel (:68-84): e' = MLP([x[src] ‖ x[dst] ‖ e]) (+ e if residual)
- NodeSubModel (:87-113): m = MLP1([x[dst] ‖ e']); agg = scatter_mean(m, src);
  x' = MLP2([x ‖ agg]) (+ x if residual). Note the reference aggregates the
  *destination* node's message at the *source* index (row) — preserved.
- Heads (:29-41): node Linear(16,16)-ReLU-Dropout-Linear(16,2);
  edge Linear(16,16)-ReLU-Dropout-Linear(16,4). Dropout is eval-mode
  (identity) — inference is deterministic.
- log_softmax on both (:65); decode = argmax (train.py:202), class order
  {0: cell, 1: horizontal, 2: vertical, 3: no-relationship} and
  {0: header, 1: data} per output.py:10-26.

Weights: the reference ships no trained checkpoint and no inference entry
point (SURVEY.md §2.10.10), so the canonical artifact is a fixed seeded
Xavier-uniform float32 initialization (weights/g2_seed42.npz), shared by
the single-node oracle and the Spark kernel.
"""

from __future__ import annotations

import io

import numpy as np

EDGE_CLASS_CELL = 0
EDGE_CLASSES = ["cell", "horizontal", "vertical", "no-relationship"]
NODE_CLASSES = ["header", "data"]

# (in_node, in_edge, hidden, out_node, out_edge, residual) per MetaLayer,
# node_edge_mlp_ending.py:12-26
LAYER_SPECS = [
    (4, 6, 32, 16, 16, False),
    (16, 16, 64, 16, 16, True),
    (16, 16, 64, 16, 16, True),
    (16, 16, 64, 16, 16, True),
]


def _linear_shapes():
    """Ordered list of (name, fan_in, fan_out) for every Linear layer."""
    shapes = []
    for i, (n_in, e_in, hid, n_out, e_out, _res) in enumerate(LAYER_SPECS, 1):
        shapes.append((f"l{i}.edge.0", 2 * n_in + e_in, hid))
        shapes.append((f"l{i}.edge.1", hid, e_out))
        shapes.append((f"l{i}.node1.0", n_in + e_out, hid))
        shapes.append((f"l{i}.node1.1", hid, n_out))
        shapes.append((f"l{i}.node2.0", n_in + n_out, hid))
        shapes.append((f"l{i}.node2.1", hid, n_out))
    shapes.append(("head.node.0", 16, 16))
    shapes.append(("head.node.1", 16, 2))
    shapes.append(("head.edge.0", 16, 16))
    shapes.append(("head.edge.1", 16, 4))
    return shapes


def init_weights(seed: int = 42) -> dict:
    """Xavier-uniform float32 weights, zero biases (FIXTURES.md §4)."""
    rng = np.random.default_rng(seed)
    w = {}
    for name, fan_in, fan_out in _linear_shapes():
        limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
        w[name + ".w"] = rng.uniform(
            -limit, limit, size=(fan_in, fan_out)
        ).astype(np.float32)
        w[name + ".b"] = np.zeros(fan_out, dtype=np.float32)
    return w


def save_weights(weights: dict, path: str) -> None:
    np.savez(path, **weights)


def load_weights(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


_RAW_MAGIC = b"TRW2"


def weights_to_bytes(weights: dict) -> bytes:
    """Serialize a weights dict for the wire (task closures, broadcasts,
    checkpoint fingerprints). Raw layout — magic, little-endian u64
    header length, JSON header [{n,d,s,o}...], concatenated C-order
    array bytes — instead of npz: parsing 59 MB of npz (zip members,
    CRCs, one alloc per array) cost ~0.6 s in EVERY python worker's
    first visual task, while ``weights_from_bytes`` on this layout is
    ~zero-copy (np.frombuffer views over the payload). Deterministic
    (sorted keys) so checkpoint fingerprints stay stable."""
    import json

    header, blobs, off = [], [], 0
    for k in sorted(weights):
        a = np.ascontiguousarray(weights[k])
        b = a.tobytes()
        header.append(
            {"n": k, "d": a.dtype.str, "s": list(a.shape), "o": off}
        )
        blobs.append(b)
        off += len(b)
    hj = json.dumps(header, sort_keys=True).encode()
    return (
        _RAW_MAGIC + len(hj).to_bytes(8, "little") + hj + b"".join(blobs)
    )


def weights_from_bytes(data: bytes) -> dict:
    """Inverse of :func:`weights_to_bytes`. Arrays are read-only
    zero-copy views over ``data`` (forward passes never mutate weights).
    Legacy npz payloads (pre-round-5 checkpoints) still parse."""
    import json

    if data[:4] == _RAW_MAGIC:
        hl = int.from_bytes(data[4:12], "little")
        header = json.loads(bytes(data[12 : 12 + hl]))
        base = 12 + hl
        out = {}
        for h in header:
            n = 1
            for dim in h["s"]:
                n *= dim
            out[h["n"]] = np.frombuffer(
                data, dtype=np.dtype(h["d"]), count=n, offset=base + h["o"]
            ).reshape(h["s"])
        return out
    with np.load(io.BytesIO(data)) as z:  # legacy npz payloads
        return {k: z[k] for k in z.files}


def _mlp2(w, prefix, x):
    """Linear → ReLU → Linear (every MLP in the model has this shape)."""
    h = x @ w[prefix + ".0.w"] + w[prefix + ".0.b"]
    np.maximum(h, 0.0, out=h)
    return h @ w[prefix + ".1.w"] + w[prefix + ".1.b"]


def _scatter_mean(values, index, n):
    """Mean of ``values`` rows grouped by ``index``; zero for empty groups
    (torch_scatter.scatter_mean semantics with dim_size=n)."""
    sums = np.zeros((n, values.shape[1]), dtype=values.dtype)
    np.add.at(sums, index, values)
    counts = np.bincount(index, minlength=n).astype(values.dtype)
    counts = np.maximum(counts, 1.0)
    return sums / counts[:, None]


def _log_softmax(z):
    m = z.max(axis=1, keepdims=True)
    e = np.exp(z - m)
    return (z - m) - np.log(e.sum(axis=1, keepdims=True))


def forward(
    x: np.ndarray, edge_index: np.ndarray, edge_attr: np.ndarray, weights: dict
):
    """Full forward pass.

    x: (N, 4) float32; edge_index: (E, 2) int; edge_attr: (E, 6) float32.
    Returns (node_log_probs (N,2), edge_log_probs (E,4)).
    """
    x = np.asarray(x, dtype=np.float32)
    e = np.asarray(edge_attr, dtype=np.float32)
    if edge_index.size:
        row = edge_index[:, 0]
        col = edge_index[:, 1]
    else:
        row = np.empty(0, dtype=np.int64)
        col = np.empty(0, dtype=np.int64)
    n = len(x)

    for i, (_ni, _ei, _hid, _no, _eo, residual) in enumerate(LAYER_SPECS, 1):
        # edge model first (PyG MetaLayer order)
        e_new = _mlp2(
            weights, f"l{i}.edge", np.concatenate([x[row], x[col], e], axis=1)
        )
        if residual:
            e_new = e_new + e
        e = e_new
        # node model
        m = _mlp2(weights, f"l{i}.node1", np.concatenate([x[col], e], axis=1))
        agg = _scatter_mean(m, row, n)
        x_new = _mlp2(weights, f"l{i}.node2", np.concatenate([x, agg], axis=1))
        if residual:
            x_new = x_new + x
        x = x_new

    node_logits = _mlp2(weights, "head.node", x)
    edge_logits = _mlp2(weights, "head.edge", e)
    return _log_softmax(node_logits), _log_softmax(edge_logits)


def decode(node_log_probs: np.ndarray, edge_log_probs: np.ndarray):
    """argmax decode (train.py:104-107,202)."""
    node_cls = (
        node_log_probs.argmax(axis=1)
        if len(node_log_probs)
        else np.empty(0, dtype=np.int64)
    )
    edge_cls = (
        edge_log_probs.argmax(axis=1)
        if len(edge_log_probs)
        else np.empty(0, dtype=np.int64)
    )
    return node_cls, edge_cls
