"""Offline training for the G3 visual kernel — pure numpy backprop.

The reference's *configured default* is the visual model (config.ini:44
model_name = NodeEdgeMLPEndingVisual) trained by train.py with
torch/PyG; torch is absent here, so this module hand-rolls the exact
backward pass of ``visual.forward`` — through both crop CNNs
(depthwise/pointwise/3×3 conv, maxpool, global avg; NO inter-block
nonlinearity, preserving the reference quirk), the geometry/visual join
linears, the 4 non-residual MetaLayers, and the edge head — so the
committed G3 artifact is trained the same way the reference trains it:

- loss = NLL on **edges only** (node loss commented out in the
  reference, train.py:158), so the node head keeps its seeded init;
- Adam, lr 3e-4 (config.ini:35), best-valid-accuracy checkpointing
  (train.py:144-147);
- training data = the same seeded synthetic grid corpus the G2 artifact
  was trained on, with crops cut from the rendered table images by the
  same ``visual.crop_regions`` the inference path uses.

Like ``train.py`` (G2), dropout in the heads is not reproduced (the
identity at eval; a training-only regularizer) and the
gradient-accumulation quirk is deliberately skipped (SURVEY.md §2.8 G5).

All ops are dtype-generic so the float64 central-difference gradient
check (tests/test_visual_train.py) runs on the real model.
"""

from __future__ import annotations

import numpy as np

from . import knn, labels, visual
from .bbox import polygons_to_bboxes
from .geometry import edge_features, node_features
from .train import Adam, _mlp2_bwd, _mlp2_fwd, nll_grad

# ----------------------------------------------------------- CNN autodiff


def _dw_fwd(x, k, b):
    B, C, H, W = x.shape
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = np.zeros((B, C, H, W), dtype=x.dtype)
    for i in range(3):
        for j in range(3):
            out += xp[:, :, i : i + H, j : j + W] * k[:, i, j][
                None, :, None, None
            ]
    return out + b[None, :, None, None], xp


def _dw_bwd(dout, xp, k):
    B, C, H, W = dout.shape
    dk = np.zeros_like(k)
    dxp = np.zeros_like(xp)
    for i in range(3):
        for j in range(3):
            dk[:, i, j] = (dout * xp[:, :, i : i + H, j : j + W]).sum(
                axis=(0, 2, 3)
            )
            dxp[:, :, i : i + H, j : j + W] += dout * k[:, i, j][
                None, :, None, None
            ]
    return dk, dout.sum(axis=(0, 2, 3)), dxp[:, :, 1:-1, 1:-1]


def _conv_fwd(x, w, b):
    out_c, _in_c, k, _ = w.shape
    cols, ho, wo = visual._im2col(x, k, pad=0)
    cols = np.ascontiguousarray(cols)
    out = cols @ w.reshape(out_c, -1).T + b
    return (
        out.transpose(0, 2, 1).reshape(len(x), out_c, ho, wo),
        (cols, x.shape, ho, wo),
    )


def _conv_bwd(dout, cache, w):
    cols, xshape, ho, wo = cache
    B, out_c = dout.shape[:2]
    in_c, k = w.shape[1], w.shape[2]
    d2 = dout.reshape(B, out_c, ho * wo).transpose(0, 2, 1)  # (B, P, out_c)
    dw = np.einsum("bpo,bpk->ok", d2, cols).reshape(w.shape)
    db = dout.sum(axis=(0, 2, 3))
    dcols = d2 @ w.reshape(out_c, -1)  # (B, P, C·k²)
    dc = dcols.reshape(B, ho, wo, in_c, k, k)
    dx = np.zeros(xshape, dtype=dout.dtype)
    for i in range(k):
        for j in range(k):
            dx[:, :, i : i + ho, j : j + wo] += dc[:, :, :, :, i, j].transpose(
                0, 3, 1, 2
            )
    return dw, db, dx


def _pool_fwd(x):
    B, C, H, W = x.shape
    h2, w2 = H // 2, W // 2
    xr = x[:, :, : h2 * 2, : w2 * 2].reshape(B, C, h2, 2, w2, 2)
    win = np.ascontiguousarray(xr.transpose(0, 1, 2, 4, 3, 5)).reshape(
        B, C, h2, w2, 4
    )
    idx = win.argmax(axis=-1)
    out = np.take_along_axis(win, idx[..., None], axis=-1)[..., 0]
    return out, (idx, x.shape)


def _pool_bwd(dout, cache):
    idx, xshape = cache
    B, C, H, W = xshape
    h2, w2 = H // 2, W // 2
    dwin = np.zeros((B, C, h2, w2, 4), dtype=dout.dtype)
    np.put_along_axis(dwin, idx[..., None], dout[..., None], axis=-1)
    dxr = dwin.reshape(B, C, h2, w2, 2, 2).transpose(0, 1, 2, 4, 3, 5)
    dx = np.zeros(xshape, dtype=dout.dtype)
    dx[:, :, : h2 * 2, : w2 * 2] = dxr.reshape(B, C, h2 * 2, w2 * 2)
    return dx


def _cnn_fwd_cached(x, w, prefix, spec):
    caches = []
    i = 0
    for op in spec:
        if op[0] == "dw":
            name = f"{prefix}.{i}"
            x, xp = _dw_fwd(x, w[name + ".w"], w[name + ".b"])
            caches.append(("dw", name, xp))
            i += 1
        elif op[0] in ("pw", "conv"):
            name = f"{prefix}.{i}"
            x, c = _conv_fwd(x, w[name + ".w"], w[name + ".b"])
            caches.append(("conv", name, c))
            i += 1
        elif op[0] == "pool":
            x, c = _pool_fwd(x)
            caches.append(("pool", None, c))
        elif op[0] == "avg":
            caches.append(("avg", None, x.shape))
            x = x.mean(axis=(2, 3))
    return x, caches


def _cnn_bwd(dout, w, g, caches):
    dx = dout
    for kind, name, c in reversed(caches):
        if kind == "avg":
            shape = c
            dx = np.broadcast_to(
                dx[:, :, None, None] / (shape[2] * shape[3]), shape
            ).astype(dout.dtype)
        elif kind == "pool":
            dx = _pool_bwd(dx, c)
        elif kind == "conv":
            dw, db, dx = _conv_bwd(dx, c, w[name + ".w"])
            g[name + ".w"] += dw
            g[name + ".b"] += db
        elif kind == "dw":
            dk, db, dx = _dw_bwd(dx, c, w[name + ".w"])
            g[name + ".w"] += dk
            g[name + ".b"] += db
    return dx


# --------------------------------------------------------- model autodiff


def forward_cached(x_geo, edge_index, edge_attr, node_crops, edge_crops, w):
    """visual.forward with every intermediate cached; returns raw edge
    logits (pre-log-softmax) + state for :func:`backward`."""
    dt = w["g3.node_join.w"].dtype
    x_geo = np.asarray(x_geo, dtype=dt)
    e_geo = np.asarray(edge_attr, dtype=dt)
    node_crops = np.asarray(node_crops, dtype=dt)
    edge_crops = np.asarray(edge_crops, dtype=dt)
    row = edge_index[:, 0]
    col = edge_index[:, 1]
    n = len(x_geo)

    nv, cn_cnn = _cnn_fwd_cached(node_crops, w, "g3.node_cnn", visual.NODE_CNN)
    ev, ce_cnn = _cnn_fwd_cached(edge_crops, w, "g3.edge_cnn", visual.EDGE_CNN)

    nj_in = np.concatenate([x_geo, nv], axis=1)
    x = nj_in @ w["g3.node_join.w"] + w["g3.node_join.b"]
    ej_in = np.concatenate([e_geo, ev], axis=1)
    e = ej_in @ w["g3.edge_join.w"] + w["g3.edge_join.b"]

    caches = []
    for i in range(1, len(visual.VISUAL_LAYER_SPECS) + 1):
        e_in = np.concatenate([x[row], x[col], e], axis=1)
        e_new, ce = _mlp2_fwd(w, f"g3.l{i}.edge", e_in)
        m_in = np.concatenate([x[col], e_new], axis=1)
        m, cm = _mlp2_fwd(w, f"g3.l{i}.node1", m_in)
        counts = np.bincount(row, minlength=n).astype(m.dtype)
        denom = np.maximum(counts, 1.0)
        agg = np.zeros((n, m.shape[1]), dtype=m.dtype)
        np.add.at(agg, row, m)
        agg = agg / denom[:, None]
        n_in = np.concatenate([x, agg], axis=1)
        x_new, cnode = _mlp2_fwd(w, f"g3.l{i}.node2", n_in)
        caches.append((x.shape[1], ce, cm, cnode, denom))
        x, e = x_new, e_new
    edge_logits, ch = _mlp2_fwd(w, "g3.head.edge", e)
    state = (caches, row, col, n, ch, cn_cnn, ce_cnn, nj_in, ej_in)
    return edge_logits, state


def backward(dlogits, w, state):
    """Gradients of the edge-NLL wrt every G3 weight (edge head,
    MetaLayers, joins, both CNNs; node head untouched — edges-only
    loss, like the reference)."""
    caches, row, col, n, ch, cn_cnn, ce_cnn, nj_in, ej_in = state
    g = {k: np.zeros_like(v) for k, v in w.items()}
    de = _mlp2_bwd(w, g, "g3.head.edge", dlogits, ch)
    dt = de.dtype
    dx_out = np.zeros((n, visual.VISUAL_LAYER_SPECS[-1][3]), dtype=dt)
    for i in range(len(visual.VISUAL_LAYER_SPECS), 0, -1):
        d_x, ce, cm, cnode, denom = caches[i - 1]
        dn_in = _mlp2_bwd(w, g, f"g3.l{i}.node2", dx_out, cnode)
        dx_cur = dn_in[:, :d_x].copy()
        dagg = dn_in[:, d_x:]
        dm = (dagg / denom[:, None])[row]
        dm_in = _mlp2_bwd(w, g, f"g3.l{i}.node1", dm.astype(dt), cm)
        np.add.at(dx_cur, col, dm_in[:, :d_x])
        de_total = de + dm_in[:, d_x:]
        de_in = _mlp2_bwd(w, g, f"g3.l{i}.edge", de_total.astype(dt), ce)
        np.add.at(dx_cur, row, de_in[:, :d_x])
        np.add.at(dx_cur, col, de_in[:, d_x : 2 * d_x])
        de = de_in[:, 2 * d_x :].astype(dt)
        dx_out = dx_cur
    # joins
    g["g3.node_join.w"] += nj_in.T @ dx_out
    g["g3.node_join.b"] += dx_out.sum(axis=0)
    dnj = dx_out @ w["g3.node_join.w"].T
    g["g3.edge_join.w"] += ej_in.T @ de
    g["g3.edge_join.b"] += de.sum(axis=0)
    dej = de @ w["g3.edge_join.w"].T
    # CNNs (geometry features are inputs; their grads are discarded)
    _cnn_bwd(dnj[:, 4:], w, g, cn_cnn)
    _cnn_bwd(dej[:, 6:], w, g, ce_cnn)
    return g


# ---------------------------------------------------------------- data


def graph_from_media_visual(m, gt, strategy: str = "knn"):
    """fixture media+gt row → (x, edges, edge_attr, node_crops,
    edge_crops, edge_labels); crops cut by the same visual.crop_regions
    the inference kernel uses."""
    from ..fixtures.generate import png_decode_gray8

    lines = sorted(m["ocr_lines"], key=lambda d: d["line_id"])
    if not lines:
        return None
    polys = [[(p["x"], p["y"]) for p in ln["points"]] for ln in lines]
    nb = polygons_to_bboxes(polys)
    if strategy == "knn":
        edges = knn.knn_edges(nb)
    else:
        from .visibility import visibility_edges

        edges = visibility_edges(nb, m["width"], m["height"])
    if len(edges) == 0:
        return None
    x = node_features(nb, m["width"], m["height"])
    ea = edge_features(edges, nb, m["width"], m["height"])
    gray = png_decode_gray8(m["image"])
    ncrops, ecrops = visual.crop_regions(gray, nb, edges)
    cells = gt["cells"]
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
    return x, edges, ea, ncrops, ecrops, ey


def train_visual(
    n_train_imgs: int = 120,
    n_valid_imgs: int = 32,
    epochs: int = 10,
    batch_graphs: int = 8,
    lr: float = 3e-4,
    seed: int = 42,
    strategy: str = "knn",
    verbose: bool = False,
):
    """Train G3 on seeded synthetic grids; returns (best_weights,
    history). Smaller corpus/epochs than G2's trainer — each G3 step
    backprops two CNNs (~3× the forward's ~1.5 GMAC), and the edge-
    classification task saturates on this synthetic corpus well before
    G2's 30 epochs."""
    from ..fixtures.generate import make_corpus

    _, media_t, gt_t = make_corpus(0, n_train_imgs, seed=seed)
    _, media_v, gt_v = make_corpus(0, n_valid_imgs, seed=seed + 1)
    train_g = [
        t
        for t in (
            graph_from_media_visual(m, g, strategy)
            for m, g in zip(media_t, gt_t)
        )
        if t is not None
    ]
    valid_g = [
        t
        for t in (
            graph_from_media_visual(m, g, strategy)
            for m, g in zip(media_v, gt_v)
        )
        if t is not None
    ]

    w = visual.init_weights(seed)
    opt = Adam(w, lr=lr)
    rng = np.random.default_rng(seed)
    best_acc, best_w, history = -1.0, dict(w), []

    def valid_acc(weights):
        hit = tot = 0
        for x, e, ea, nc, ec, y in valid_g:
            _, elp = visual.forward(x, e, ea, nc, ec, weights)
            hit += int((elp.argmax(axis=1) == y).sum())
            tot += len(y)
        return hit / max(tot, 1)

    for epoch in range(epochs):
        order = rng.permutation(len(train_g))
        losses = []
        for start in range(0, len(order), batch_graphs):
            g_acc = None
            for j in order[start : start + batch_graphs]:
                x, e, ea, nc, ec, y = train_g[j]
                logits, state = forward_cached(x, e, ea, nc, ec, w)
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
        history.append(
            {"epoch": epoch, "loss": float(np.mean(losses)),
             "valid_edge_acc": acc}
        )
        if verbose:
            print(history[-1], flush=True)
        if acc > best_acc:
            best_acc, best_w = acc, {k: v.copy() for k, v in w.items()}
    return best_w, history
