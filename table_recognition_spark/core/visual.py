"""G3 visual model ("VisualNodeEdgeMLPEnding") as pure numpy.

Architecture mirrors /root/reference/table_recognition/models/
node_edge_mlp_ending_visual.py:12-119 (the reference's configured default
model, config.ini:44) with the image path of graph.py:172-212:

- node crops: bbox ± 20 px (clamped), resized to 10×10 (graph.py:177-189)
- edge crops: union bbox of both endpoints ± 20 px, resized to 16×16
  (graph.py:191-212)
- node CNN (:48-55): DWSep(3→64) → DWSep(64→64) → MaxPool2 →
  DWSep(64→128) → Conv3×3(128→256, no padding) → global avg → 256-d
- edge CNN (:57-65): DWSep(3→128) → DWSep(128→128) → MaxPool2 →
  DWSep(128→256) → MaxPool2 → Conv3×3(no padding) → global avg → 256-d
  (quirk preserved: there is NO nonlinearity between the conv blocks)
- joins (:67-68): node Linear(4+256 → 256), edge Linear(6+256 → 256)
- 4 MetaLayers (:16-30): 256→512→1024→512→256, hidden = in_features,
  NO residuals (unlike G2)
- heads (:32-44): Linear(256,256)-ReLU-Dropout-Linear(256,{2,4})

Canonical deviations, frozen here (documented — the reference's tensor
plumbing is quirky): crops are resized with standard half-pixel-center
bilinear interpolation (the reference routes a full-crop box through
torchvision RoIAlign with transposed H/W axes — a consistent pixel
permutation, not semantics we preserve); grayscale fixture images are
replicated to 3 channels; pixel values stay in [0, 255] float32 (the
reference applies no normalization).

Weights: fixed seeded Xavier-uniform float32 (weights/g3_seed42.npz),
shared by oracle and executors — the reference ships no checkpoint.
"""

from __future__ import annotations

import numpy as np

from .bbox import bbox_centers  # noqa: F401  (re-export convenience)
from .gnn import _log_softmax, _mlp2, _scatter_mean

NODE_CROP = 10
EDGE_CROP = 16
CROP_PAD = 20  # graph.py:176,191

# (in_node, in_edge, hidden, out_node, out_edge, residual)
VISUAL_LAYER_SPECS = [
    (256, 256, 256, 512, 512, False),
    (512, 512, 512, 1024, 1024, False),
    (1024, 1024, 1024, 512, 512, False),
    (512, 512, 512, 256, 256, False),
]

# CNN specs: list of ops. ("dw", in_ch), ("pw", in_ch, out_ch),
# ("conv", in_ch, out_ch) [3x3 no pad], ("pool",), ("avg",)
NODE_CNN = [
    ("dw", 3), ("pw", 3, 64),
    ("dw", 64), ("pw", 64, 64),
    ("pool",),
    ("dw", 64), ("pw", 64, 128),
    ("conv", 128, 256),
    ("avg",),
]
EDGE_CNN = [
    ("dw", 3), ("pw", 3, 128),
    ("dw", 128), ("pw", 128, 128),
    ("pool",),
    ("dw", 128), ("pw", 128, 256),
    ("pool",),
    ("conv", 256, 256),
    ("avg",),
]


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W) float → (out_h, out_w), half-pixel centers."""
    h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return (
        a * (1 - wy) * (1 - wx)
        + b * (1 - wy) * wx
        + c * wy * (1 - wx)
        + d * wy * wx
    )


def crop_regions(image: np.ndarray, bboxes: np.ndarray, edges: np.ndarray):
    """Image + bboxes/edges → (node_crops (N,3,10,10), edge_crops
    (E,3,16,16)) float32 in [0,255]. Accepts (H, W) grayscale
    (replicated to 3 channels) or (H, W, 3) color (e.g.
    ``jpeg_decode_rgb`` output — per-channel bilinear resize, matching
    the reference's 3-channel ``cv2.imread`` crops, graph.py:174)."""
    color = image.ndim == 3
    h, w = image.shape[:2]
    img = image.astype(np.float32)

    def crop(x0, y0, x1, y1, dim):
        x0 = max(int(x0) - CROP_PAD, 0)
        x1 = min(int(x1) + CROP_PAD, w)
        y0 = max(int(y0) - CROP_PAD, 0)
        y1 = min(int(y1) + CROP_PAD, h)
        region = img[y0:y1, x0:x1]
        if region.size == 0:
            region = np.zeros(
                (1, 1, 3) if color else (1, 1), dtype=np.float32
            )
        if color:
            return np.stack(
                [
                    bilinear_resize(region[..., c], dim, dim)
                    for c in range(3)
                ]
            ).astype(np.float32)
        r = bilinear_resize(region, dim, dim).astype(np.float32)
        return np.broadcast_to(r, (3, dim, dim))

    node_crops = np.stack(
        [crop(b[0], b[1], b[2], b[3], NODE_CROP) for b in bboxes]
    ).astype(np.float32)
    if len(edges):
        eb = np.stack(
            [
                (
                    min(bboxes[s][0], bboxes[d][0]),
                    min(bboxes[s][1], bboxes[d][1]),
                    max(bboxes[s][2], bboxes[d][2]),
                    max(bboxes[s][3], bboxes[d][3]),
                )
                for s, d in edges
            ]
        )
        edge_crops = np.stack(
            [crop(b[0], b[1], b[2], b[3], EDGE_CROP) for b in eb]
        ).astype(np.float32)
    else:
        edge_crops = np.zeros((0, 3, EDGE_CROP, EDGE_CROP), dtype=np.float32)
    return node_crops, edge_crops


# ------------------------------------------------------------- conv ops
def _im2col(x, k=3, pad=0):
    """(B, C, H, W) → (B, H'·W', C·k·k) with H' = H+2p-k+1."""
    b, c, h, w = x.shape
    if pad:
        x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    ho, wo = h + 2 * pad - k + 1, w + 2 * pad - k + 1
    s = x.strides
    windows = np.lib.stride_tricks.as_strided(
        x,
        shape=(b, c, ho, wo, k, k),
        strides=(s[0], s[1], s[2], s[3], s[2], s[3]),
        writeable=False,
    )
    return (
        windows.transpose(0, 2, 3, 1, 4, 5).reshape(b, ho * wo, c * k * k),
        ho,
        wo,
    )


def conv2d(x, w, bias, pad=0):
    """standard conv: w (out_c, in_c, k, k)."""
    out_c, in_c, k, _ = w.shape
    cols, ho, wo = _im2col(x, k, pad)
    out = cols @ w.reshape(out_c, in_c * k * k).T + bias
    return out.transpose(0, 2, 1).reshape(len(x), out_c, ho, wo)


def depthwise_conv2d(x, w, bias):
    """w (C, k, k), padding 1 (same size) — torch Conv2d(groups=C, p=1).

    Computed as k² shifted multiply-adds on contiguous slices: 2-4×
    faster than the earlier einsum over a 6-D strided window view
    (einsum can't vectorize the non-contiguous walk; measured 294 →
    74 ms on a (150,128,16,16) batch). Equivalent up to float32
    summation order (~4e-6); the Spark kernel and the no-Spark oracle
    share this code, so span parity is unaffected."""
    b, c, h, w_ = x.shape
    k = w.shape[1]
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = np.zeros((b, c, h, w_), dtype=np.float32)
    for i in range(k):
        for j in range(k):
            out += xp[:, :, i : i + h, j : j + w_] * w[:, i, j][
                None, :, None, None
            ]
    return out + bias[None, :, None, None]


def maxpool2(x):
    b, c, h, w = x.shape
    return x[:, :, : h // 2 * 2, : w // 2 * 2].reshape(
        b, c, h // 2, 2, w // 2, 2
    ).max(axis=(3, 5))


def _cnn_forward(x, weights, prefix, spec):
    i = 0
    for op in spec:
        if op[0] == "dw":
            x = depthwise_conv2d(
                x, weights[f"{prefix}.{i}.w"], weights[f"{prefix}.{i}.b"]
            )
            i += 1
        elif op[0] == "pw":
            x = conv2d(
                x,
                weights[f"{prefix}.{i}.w"],
                weights[f"{prefix}.{i}.b"],
                pad=0,
            )
            i += 1
        elif op[0] == "conv":
            x = conv2d(
                x,
                weights[f"{prefix}.{i}.w"],
                weights[f"{prefix}.{i}.b"],
                pad=0,
            )
            i += 1
        elif op[0] == "pool":
            x = maxpool2(x)
        elif op[0] == "avg":
            x = x.mean(axis=(2, 3))
    return x.astype(np.float32)


# ------------------------------------------------------------- weights
def _shapes():
    shapes = []

    def cnn_shapes(prefix, spec):
        i = 0
        for op in spec:
            if op[0] == "dw":
                shapes.append((f"{prefix}.{i}", "dw", op[1]))
                i += 1
            elif op[0] in ("pw", "conv"):
                k = 1 if op[0] == "pw" else 3
                shapes.append((f"{prefix}.{i}", "conv", (op[2], op[1], k)))
                i += 1

    cnn_shapes("g3.node_cnn", NODE_CNN)
    cnn_shapes("g3.edge_cnn", EDGE_CNN)
    shapes.append(("g3.node_join", "lin", (4 + 256, 256)))
    shapes.append(("g3.edge_join", "lin", (6 + 256, 256)))
    for i, (n_in, e_in, hid, n_out, e_out, _r) in enumerate(
        VISUAL_LAYER_SPECS, 1
    ):
        shapes.append((f"g3.l{i}.edge.0", "lin", (2 * n_in + e_in, hid)))
        shapes.append((f"g3.l{i}.edge.1", "lin", (hid, e_out)))
        shapes.append((f"g3.l{i}.node1.0", "lin", (n_in + e_out, hid)))
        shapes.append((f"g3.l{i}.node1.1", "lin", (hid, n_out)))
        shapes.append((f"g3.l{i}.node2.0", "lin", (n_in + n_out, hid)))
        shapes.append((f"g3.l{i}.node2.1", "lin", (hid, n_out)))
    shapes.append(("g3.head.node.0", "lin", (256, 256)))
    shapes.append(("g3.head.node.1", "lin", (256, 2)))
    shapes.append(("g3.head.edge.0", "lin", (256, 256)))
    shapes.append(("g3.head.edge.1", "lin", (256, 4)))
    return shapes


def init_weights(seed: int = 42) -> dict:
    rng = np.random.default_rng(seed)
    w = {}
    for name, kind, dims in _shapes():
        if kind == "lin":
            fan_in, fan_out = dims
            lim = float(np.sqrt(6.0 / (fan_in + fan_out)))
            w[name + ".w"] = rng.uniform(-lim, lim, (fan_in, fan_out)).astype(
                np.float32
            )
            w[name + ".b"] = np.zeros(fan_out, dtype=np.float32)
        elif kind == "dw":
            c = dims
            lim = float(np.sqrt(6.0 / (9 + 9)))
            w[name + ".w"] = rng.uniform(-lim, lim, (c, 3, 3)).astype(
                np.float32
            )
            w[name + ".b"] = np.zeros(c, dtype=np.float32)
        else:  # conv
            out_c, in_c, k = dims
            fan_in, fan_out = in_c * k * k, out_c * k * k
            lim = float(np.sqrt(6.0 / (fan_in + fan_out)))
            w[name + ".w"] = rng.uniform(
                -lim, lim, (out_c, in_c, k, k)
            ).astype(np.float32)
            w[name + ".b"] = np.zeros(out_c, dtype=np.float32)
    return w


_DEFAULT_WEIGHTS: dict | None = None


def default_weights() -> dict:
    """G3 weights resolution shared by the Spark kernel and the no-Spark
    oracle (so parity holds by construction): the committed trained
    artifact (``weights/g3_trained_seed42.npz`` — numpy-backprop-trained
    by core/visual_train.py) when present, else the frozen seeded init.

    Cached module-level after the first load: the 59 MB npz costs ~1.2 s
    to decompress, and every visual-query invocation resolves weights
    driver-side — callers treat the returned dict as immutable (training
    code inits its own)."""
    global _DEFAULT_WEIGHTS
    if _DEFAULT_WEIGHTS is not None:
        return _DEFAULT_WEIGHTS
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "weights",
        "g3_trained_seed42.npz",
    )
    if os.path.exists(path):
        data = np.load(path)
        _DEFAULT_WEIGHTS = {k: data[k] for k in data.files}
    else:  # pragma: no cover - artifact is committed
        _DEFAULT_WEIGHTS = init_weights(42)
    return _DEFAULT_WEIGHTS


def _linear(w, name, x):
    return x @ w[name + ".w"] + w[name + ".b"]


def forward(
    x_geo: np.ndarray,
    edge_index: np.ndarray,
    edge_attr: np.ndarray,
    node_crops: np.ndarray,
    edge_crops: np.ndarray,
    weights: dict,
    node_feats: np.ndarray | None = None,
    edge_feats: np.ndarray | None = None,
):
    """Full G3 forward. Returns (node_log_probs (N,2), edge_log_probs (E,4)).

    ``node_feats``/``edge_feats``: precomputed CNN features (256-d per
    crop) — when given, the crop arguments are ignored and the CNN stage
    is skipped. This is the cross-image fusion seam: a task holding many
    images runs ONE batched CNN over all their crops (bit-identical to
    per-image, GEMM rows are independent) and feeds the slices here."""
    x_geo = np.asarray(x_geo, dtype=np.float32)
    e_geo = np.asarray(edge_attr, dtype=np.float32)
    if edge_index.size:
        row, col = edge_index[:, 0], edge_index[:, 1]
    else:
        row = col = np.empty(0, dtype=np.int64)
    n = len(x_geo)

    if node_feats is not None:
        nv = node_feats
    else:
        nv = _cnn_forward(node_crops, weights, "g3.node_cnn", NODE_CNN)
    if edge_feats is not None:
        ev = edge_feats
    elif len(edge_crops):
        ev = _cnn_forward(edge_crops, weights, "g3.edge_cnn", EDGE_CNN)
    else:
        ev = np.zeros((0, 256), dtype=np.float32)

    x = _linear(w=weights, name="g3.node_join",
                x=np.concatenate([x_geo, nv], axis=1)).astype(np.float32)
    e = _linear(w=weights, name="g3.edge_join",
                x=np.concatenate([e_geo, ev], axis=1)).astype(np.float32)

    for i, (_ni, _ei, _hid, _no, _eo, residual) in enumerate(
        VISUAL_LAYER_SPECS, 1
    ):
        e_new = _mlp2(
            weights, f"g3.l{i}.edge", np.concatenate([x[row], x[col], e], axis=1)
        )
        if residual:  # pragma: no cover - all False in G3
            e_new = e_new + e
        e = e_new
        m = _mlp2(weights, f"g3.l{i}.node1", np.concatenate([x[col], e], axis=1))
        agg = _scatter_mean(m, row, n)
        x_new = _mlp2(weights, f"g3.l{i}.node2", np.concatenate([x, agg], axis=1))
        if residual:  # pragma: no cover
            x_new = x_new + x
        x = x_new

    node_logits = _mlp2(weights, "g3.head.node", x)
    edge_logits = _mlp2(weights, "g3.head.edge", e)
    return _log_softmax(node_logits), _log_softmax(edge_logits)
