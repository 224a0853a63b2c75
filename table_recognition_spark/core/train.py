"""Offline training for the G2 kernel — pure numpy backprop.

The reference trains with torch/PyG (train.py:36-173); torch is not in
this environment, and training is a one-off offline step anyway
(SURVEY.md §2.8 G5: the deployed pipeline ships fixed weights). This
module hand-rolls the exact backward pass of ``gnn.forward`` so we can
produce a *meaningful* weights artifact: trained on seeded synthetic
grid tables with ground-truth edge labels derived by the reference's own
labeling rules (core/labels.py).

Faithful to the reference where it matters:
- loss = NLL on **edges only** — the node loss is commented out in the
  reference (train.py:158); the node head therefore keeps its seeded
  initialization, exactly like the reference's checkpoint would.
- Adam, lr 3e-4 (config.ini:35).
- best-valid-accuracy checkpointing (train.py:144-147).
Deliberately NOT reproduced: the gradient-accumulation step-without-
backward quirk (train.py:161-166, SURVEY.md §2.8 G5) — a training-only
artifact with no bearing on inference semantics.
"""

from __future__ import annotations

import numpy as np

from . import gnn, knn, labels
from .bbox import polygons_to_bboxes
from .geometry import edge_features, node_features


# ---------------------------------------------------------------- autodiff
def _mlp2_fwd(w, prefix, x):
    h = x @ w[prefix + ".0.w"] + w[prefix + ".0.b"]
    r = np.maximum(h, 0.0)
    out = r @ w[prefix + ".1.w"] + w[prefix + ".1.b"]
    return out, (x, h, r)


def _mlp2_bwd(w, g, prefix, dout, cache):
    x, h, r = cache
    g[prefix + ".1.w"] += r.T @ dout
    g[prefix + ".1.b"] += dout.sum(axis=0)
    dr = dout @ w[prefix + ".1.w"].T
    dh = dr * (h > 0)
    g[prefix + ".0.w"] += x.T @ dh
    g[prefix + ".0.b"] += dh.sum(axis=0)
    return dh @ w[prefix + ".0.w"].T


def forward_cached(x, edge_index, edge_attr, w):
    """gnn.forward with every intermediate cached for backward."""
    row = edge_index[:, 0] if len(edge_index) else np.empty(0, dtype=np.int64)
    col = edge_index[:, 1] if len(edge_index) else np.empty(0, dtype=np.int64)
    n = len(x)
    caches = []
    e = edge_attr
    for i, (_ni, _ei, _hid, _no, _eo, residual) in enumerate(
        gnn.LAYER_SPECS, 1
    ):
        e_in = np.concatenate([x[row], x[col], e], axis=1)
        e_new, ce = _mlp2_fwd(w, f"l{i}.edge", e_in)
        if residual:
            e_new = e_new + e
        m_in = np.concatenate([x[col], e_new], axis=1)
        m, cm = _mlp2_fwd(w, f"l{i}.node1", m_in)
        counts = np.bincount(row, minlength=n).astype(m.dtype)
        denom = np.maximum(counts, 1.0)
        agg = np.zeros((n, m.shape[1]), dtype=m.dtype)
        np.add.at(agg, row, m)
        agg = agg / denom[:, None]
        n_in = np.concatenate([x, agg], axis=1)
        x_new, cn = _mlp2_fwd(w, f"l{i}.node2", n_in)
        if residual:
            x_new = x_new + x
        caches.append((x, e, ce, cm, cn, denom, residual))
        x, e = x_new, e_new
    edge_logits, ch = _mlp2_fwd(w, "head.edge", e)
    return edge_logits, (caches, row, col, n, ch)


def backward(dlogits, w, state):
    """Gradients of edge-NLL wrt every weight (edge head + MetaLayers)."""
    caches, row, col, n, ch = state
    g = {k: np.zeros_like(v) for k, v in w.items()}
    de = _mlp2_bwd(w, g, "head.edge", dlogits, ch)
    # the final node features feed nothing under edge-only loss
    dt = de.dtype
    dx_out = np.zeros((n, 16), dtype=dt)
    for i in range(len(gnn.LAYER_SPECS), 0, -1):
        x_in, e_in_prev, ce, cm, cn, denom, residual = caches[i - 1]
        # --- node submodel backward (x_new = mlp2([x, agg]) (+x)) ---
        dn_in = _mlp2_bwd(w, g, f"l{i}.node2", dx_out, cn)
        dx_cur = dn_in[:, : x_in.shape[1]].astype(dt)
        dagg = dn_in[:, x_in.shape[1] :]
        if residual:
            dx_cur = dx_cur + dx_out
        dm = (dagg / denom[:, None])[row] if len(row) else np.zeros((0, dagg.shape[1]))
        dm_in = _mlp2_bwd(w, g, f"l{i}.node1", dm.astype(dt), cm)
        # m_in = [x[col], e_new]
        if len(col):
            np.add.at(dx_cur, col, dm_in[:, : x_in.shape[1]])
        de_total = de + dm_in[:, x_in.shape[1] :]
        # --- edge submodel backward (e_new = mlp_e([x[row],x[col],e]) (+e)) ---
        de_in = _mlp2_bwd(w, g, f"l{i}.edge", de_total.astype(dt), ce)
        d = x_in.shape[1]
        if len(row):
            np.add.at(dx_cur, row, de_in[:, :d])
            np.add.at(dx_cur, col, de_in[:, d : 2 * d])
        de_prev = de_in[:, 2 * d :]
        if residual:
            de_prev = de_prev + de_total
        dx_out = dx_cur
        de = de_prev.astype(dt)
    return g


def nll_grad(edge_logits, y):
    """Mean NLL over edges; returns (loss, dlogits)."""
    m = edge_logits.max(axis=1, keepdims=True)
    ez = np.exp(edge_logits - m)
    p = ez / ez.sum(axis=1, keepdims=True)
    n = len(y)
    loss = -np.log(np.maximum(p[np.arange(n), y], 1e-12)).mean()
    d = p.copy()
    d[np.arange(n), y] -= 1.0
    return loss, (d / n).astype(np.float32)


class Adam:
    def __init__(self, weights, lr=3e-4, b1=0.9, b2=0.999, eps=1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.m = {k: np.zeros_like(v) for k, v in weights.items()}
        self.v = {k: np.zeros_like(v) for k, v in weights.items()}
        self.t = 0

    def step(self, w, g):
        self.t += 1
        for k in w:
            if not np.any(g[k]):
                continue
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g[k]
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g[k] ** 2
            mh = self.m[k] / (1 - self.b1**self.t)
            vh = self.v[k] / (1 - self.b2**self.t)
            w[k] = (w[k] - self.lr * mh / (np.sqrt(vh) + self.eps)).astype(
                np.float32
            )


# ---------------------------------------------------------------- data
def graph_from_media(m, g, strategy: str = "knn"):
    """fixture media+gt row → (x, edge_index, edge_attr, edge_labels)."""
    from .visibility import visibility_edges

    lines = sorted(m["ocr_lines"], key=lambda d: d["line_id"])
    if not lines:
        return None
    polys = [[(p["x"], p["y"]) for p in ln["points"]] for ln in lines]
    nb = polygons_to_bboxes(polys)
    edges = (
        knn.knn_edges(nb)
        if strategy == "knn"
        else visibility_edges(nb, m["width"], m["height"])
    )
    if len(edges) == 0:
        return None
    x = node_features(nb, m["width"], m["height"])
    ea = edge_features(edges, nb, m["width"], m["height"])
    cells = g["cells"]
    if not cells:
        return None
    cb = polygons_to_bboxes(
        [[(p["x"], p["y"]) for p in c["points"]] for c in cells]
    )
    grid = np.array(
        [[c["start_row"], c["end_row"], c["start_col"], c["end_col"]]
         for c in cells]
    )
    _, ey = labels.label_graph(nb, edges, cb, [c["type"] for c in cells], grid)
    return x, edges, ea, ey


def train(
    n_train_imgs: int = 400,
    n_valid_imgs: int = 80,
    epochs: int = 30,
    batch_graphs: int = 8,
    lr: float = 3e-4,
    seed: int = 42,
    strategy: str = "knn",
    verbose: bool = False,
):
    """Train on seeded synthetic grids; returns (best_weights, history)."""
    from ..fixtures.generate import make_corpus

    _, media_t, gt_t = make_corpus(0, n_train_imgs, seed=seed)
    _, media_v, gt_v = make_corpus(0, n_valid_imgs, seed=seed + 1)
    train_g = [
        t
        for t in (
            graph_from_media(m, g, strategy)
            for m, g in zip(media_t, gt_t)
        )
        if t is not None
    ]
    valid_g = [
        t
        for t in (
            graph_from_media(m, g, strategy)
            for m, g in zip(media_v, gt_v)
        )
        if t is not None
    ]

    w = gnn.init_weights(seed)
    opt = Adam(w, lr=lr)
    rng = np.random.default_rng(seed)
    best_acc, best_w, history = -1.0, dict(w), []

    def valid_acc(weights):
        hit = tot = 0
        for x, e, ea, y in valid_g:
            _, elp = gnn.forward(x, e, ea, weights)
            hit += int((elp.argmax(axis=1) == y).sum())
            tot += len(y)
        return hit / max(tot, 1)

    for epoch in range(epochs):
        order = rng.permutation(len(train_g))
        losses = []
        for start in range(0, len(order), batch_graphs):
            g_acc = None
            for j in order[start : start + batch_graphs]:
                x, e, ea, y = train_g[j]
                logits, state = forward_cached(x, e, ea, w)
                loss, dlg = nll_grad(logits, y)
                grads = backward(dlg, w, state)
                losses.append(loss)
                if g_acc is None:
                    g_acc = grads
                else:
                    for k in g_acc:
                        g_acc[k] += grads[k]
            opt.step(w, g_acc)
        acc = valid_acc(w)
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "valid_edge_acc": acc})
        if verbose:
            print(history[-1])
        if acc > best_acc:
            best_acc, best_w = acc, {k: v.copy() for k, v in w.items()}
    return best_w, history
