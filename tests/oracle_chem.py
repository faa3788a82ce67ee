"""Independent numpy oracle for the chem reference models (eval mode).

Implements the exact math of /root/reference/chem/model.py with explicit
python loops and dense ops — deliberately the *opposite* implementation style
from the framework's vectorized segment ops — so parity tests cross-check
two independent derivations of the same spec against real checkpoint weights.
Self-loops are materialized explicitly here (bond type 4, dir 0), matching
the reference literally; the framework handles them analytically.
"""

import numpy as np

EPS_BN = 1e-5


def _lin(sd, name, x):
    return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]


def _edge_emb(sd, prefix, ea):
    return (
        sd[f"{prefix}.edge_embedding1.weight"][ea[:, 0]]
        + sd[f"{prefix}.edge_embedding2.weight"][ea[:, 1]]
    )


def _with_self_loops(N, edge_index, edge_attr):
    loops = np.stack([np.arange(N), np.arange(N)])
    ei = np.concatenate([edge_index, loops], axis=1)
    sl = np.zeros((N, 2), edge_attr.dtype)
    sl[:, 0] = 4
    ea = np.concatenate([edge_attr, sl], axis=0)
    return ei, ea


def _scatter_rows(msgs, targets, N, dim):
    out = np.zeros((N, dim), np.float32)
    for k in range(msgs.shape[0]):
        out[targets[k]] += msgs[k]
    return out


def gin_conv(sd, p, h, edge_index, edge_attr):
    N = h.shape[0]
    ei, ea = _with_self_loops(N, edge_index, edge_attr)
    e = _edge_emb(sd, p, ea)
    msgs = h[ei[1]] + e
    aggr = _scatter_rows(msgs, ei[0], N, h.shape[1])
    z = np.maximum(_lin(sd, f"{p}.mlp.0", aggr), 0.0)
    return _lin(sd, f"{p}.mlp.2", z)


def gcn_conv(sd, p, h, edge_index, edge_attr):
    N = h.shape[0]
    ei, ea = _with_self_loops(N, edge_index, edge_attr)
    e = _edge_emb(sd, p, ea)
    deg = np.zeros(N)
    for r in ei[0]:
        deg[r] += 1.0
    dis = np.where(deg > 0, deg ** -0.5, 0.0)
    norm = dis[ei[0]] * dis[ei[1]]
    x = _lin(sd, f"{p}.linear", h)
    msgs = norm[:, None] * (x[ei[1]] + e)
    return _scatter_rows(msgs, ei[0], N, h.shape[1])


def gat_conv(sd, p, h, edge_index, edge_attr, heads=2, slope=0.2):
    N, D = h.shape
    ei, ea = _with_self_loops(N, edge_index, edge_attr)
    e = _edge_emb(sd, p, ea).reshape(-1, heads, D)
    att = sd[f"{p}.att"]  # [1, H, 2D]
    x = _lin(sd, f"{p}.weight_linear", h).reshape(N, heads, D)
    x_i, x_j = x[ei[0]], x[ei[1]] + e
    alpha = (np.concatenate([x_i, x_j], axis=-1) * att).sum(-1)  # [E,H]
    alpha = np.where(alpha >= 0, alpha, slope * alpha)
    # per-receiver softmax
    out = np.zeros((N, heads, D), np.float32)
    for i in range(N):
        sel = np.where(ei[0] == i)[0]
        if len(sel) == 0:
            continue
        a = alpha[sel]  # [k, H]
        a = np.exp(a - a.max(0))
        a = a / a.sum(0)
        out[i] = (a[..., None] * x_j[sel]).sum(0)
    return out.mean(1) + sd[f"{p}.bias"]


def sage_conv(sd, p, h, edge_index, edge_attr):
    N = h.shape[0]
    ei, ea = _with_self_loops(N, edge_index, edge_attr)
    e = _edge_emb(sd, p, ea)
    x = _lin(sd, f"{p}.linear", h)
    msgs = x[ei[1]] + e
    s = _scatter_rows(msgs, ei[0], N, h.shape[1])
    cnt = np.zeros(N)
    for r in ei[0]:
        cnt[r] += 1
    mean = s / np.maximum(cnt, 1)[:, None]
    nrm = np.sqrt((mean ** 2).sum(-1, keepdims=True))
    return mean / np.maximum(nrm, 1e-12)


_CONVS = {"gin": gin_conv, "gcn": gcn_conv, "gat": gat_conv,
          "graphsage": sage_conv}


def bn_eval(sd, p, h):
    rm, rv = sd[f"{p}.running_mean"], sd[f"{p}.running_var"]
    w, b = sd[f"{p}.weight"], sd[f"{p}.bias"]
    return (h - rm) / np.sqrt(rv + EPS_BN) * w + b


def trunk_forward(sd, gnn_type, x, edge_index, edge_attr,
                  num_layer=5, jk="last"):
    """chem/model.py:255-290, eval mode (dropout = identity)."""
    h = (
        sd["x_embedding1.weight"][x[:, 0]]
        + sd["x_embedding2.weight"][x[:, 1]]
    ).astype(np.float32)
    h_list = [h]
    for layer in range(num_layer):
        h = _CONVS[gnn_type](sd, f"gnns.{layer}", h_list[-1],
                             edge_index, edge_attr)
        h = bn_eval(sd, f"batch_norms.{layer}", h)
        if layer != num_layer - 1:
            h = np.maximum(h, 0.0)
        h_list.append(h)
    if jk == "last":
        return h_list[-1]
    if jk == "concat":
        return np.concatenate(h_list, axis=1)
    stack = np.stack(h_list, 0)
    return stack.max(0) if jk == "max" else stack.sum(0)


def random_molecule(rng, n_atoms):
    """Random chain-plus-chords molecule-like graph with both-direction
    edge pairs (the reference's storage convention, chem/loader.py:81-96)."""
    bonds = [(i, i + 1) for i in range(n_atoms - 1)]
    extra = max(0, n_atoms // 3 - 1)
    for _ in range(extra):
        a, b = rng.integers(0, n_atoms, 2)
        if a != b and (a, b) not in bonds and (b, a) not in bonds:
            bonds.append((int(a), int(b)))
    ei, ea = [], []
    for a, b in bonds:
        t, d = int(rng.integers(0, 4)), int(rng.integers(0, 3))
        ei += [(a, b), (b, a)]
        ea += [(t, d), (t, d)]
    x = np.stack([
        rng.integers(0, 119, n_atoms),
        rng.integers(0, 3, n_atoms),
    ], axis=1).astype(np.int64)
    edge_index = np.array(ei, np.int64).T if ei else np.zeros((2, 0), np.int64)
    edge_attr = np.array(ea, np.int64) if ea else np.zeros((0, 2), np.int64)
    return x, edge_index, edge_attr
