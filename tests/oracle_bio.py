"""Independent numpy oracle for the bio reference models (eval mode),
implementing /root/reference/bio/model.py literally: materialized self-loop
edges (one-hot at dim 7), Linear(9) edge encoder, loop-based scatter."""

import numpy as np

EPS_BN = 1e-5


def _lin(sd, name, x):
    return x @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]


def _with_self_loops(N, edge_index, edge_attr):
    loops = np.stack([np.arange(N), np.arange(N)])
    ei = np.concatenate([edge_index, loops], axis=1)
    sl = np.zeros((N, 9), np.float32)
    sl[:, 7] = 1.0
    ea = np.concatenate([edge_attr, sl], axis=0)
    return ei, ea


def _scatter(msgs, targets, N, dim):
    out = np.zeros((N, dim), np.float32)
    for k in range(msgs.shape[0]):
        out[targets[k]] += msgs[k]
    return out


def _maybe_embed(sd, p, h):
    key = f"{p}.input_node_embeddings.weight"
    if key in sd:
        return sd[key][h[:, 0].astype(np.int64)]
    return h


def gin_conv(sd, p, h, edge_index, edge_attr, mask=None, train_stats=None):
    N = h.shape[0]
    ei, ea = _with_self_loops(N, edge_index, edge_attr)
    e = _lin(sd, f"{p}.edge_encoder", ea)
    h = _maybe_embed(sd, p, h)
    msgs = np.concatenate([h[ei[1]], e], axis=1)
    aggr = _scatter(msgs, ei[0], N, msgs.shape[1])
    z = _lin(sd, f"{p}.mlp.0", aggr)
    rm, rv = sd[f"{p}.mlp.1.running_mean"], sd[f"{p}.mlp.1.running_var"]
    z = (z - rm) / np.sqrt(rv + EPS_BN) * sd[f"{p}.mlp.1.weight"] + sd[
        f"{p}.mlp.1.bias"
    ]
    z = np.maximum(z, 0.0)
    return _lin(sd, f"{p}.mlp.3", z)


def gcn_conv(sd, p, h, edge_index, edge_attr):
    N = h.shape[0]
    ei, ea = _with_self_loops(N, edge_index, edge_attr)
    e = _lin(sd, f"{p}.edge_encoder", ea)
    h = _maybe_embed(sd, p, h)
    deg = np.zeros(N)
    for r in ei[0]:
        deg[r] += 1.0
    dis = np.where(deg > 0, deg ** -0.5, 0.0)
    norm = dis[ei[0]] * dis[ei[1]]
    x = _lin(sd, f"{p}.linear", h)
    return _scatter(norm[:, None] * (x[ei[1]] + e), ei[0], N, x.shape[1])


def gat_conv(sd, p, h, edge_index, edge_attr, heads=2, slope=0.2):
    N = h.shape[0]
    ei, ea = _with_self_loops(N, edge_index, edge_attr)
    h = _maybe_embed(sd, p, h)
    D = sd[f"{p}.att"].shape[-1] // 2
    e = _lin(sd, f"{p}.edge_encoder", ea).reshape(-1, heads, D)
    att = sd[f"{p}.att"]
    x = _lin(sd, f"{p}.weight_linear", h).reshape(N, heads, D)
    x_i, x_j = x[ei[0]], x[ei[1]] + e
    alpha = (np.concatenate([x_i, x_j], axis=-1) * att).sum(-1)
    alpha = np.where(alpha >= 0, alpha, slope * alpha)
    out = np.zeros((N, heads, D), np.float32)
    for i in range(N):
        sel = np.where(ei[0] == i)[0]
        if len(sel) == 0:
            continue
        a = alpha[sel]
        a = np.exp(a - a.max(0))
        a = a / a.sum(0)
        out[i] = (a[..., None] * x_j[sel]).sum(0)
    return out.mean(1) + sd[f"{p}.bias"]


def sage_conv(sd, p, h, edge_index, edge_attr):
    N = h.shape[0]
    ei, ea = _with_self_loops(N, edge_index, edge_attr)
    e = _lin(sd, f"{p}.edge_encoder", ea)
    h = _maybe_embed(sd, p, h)
    x = _lin(sd, f"{p}.linear", h)
    s = _scatter(x[ei[1]] + e, ei[0], N, x.shape[1])
    cnt = np.zeros(N)
    for r in ei[0]:
        cnt[r] += 1
    mean = s / np.maximum(cnt, 1)[:, None]
    nrm = np.sqrt((mean ** 2).sum(-1, keepdims=True))
    return mean / np.maximum(nrm, 1e-12)


_CONVS = {"gin": gin_conv, "gcn": gcn_conv, "gat": gat_conv,
          "graphsage": sage_conv}


def trunk_forward(sd, gnn_type, x, edge_index, edge_attr,
                  num_layer=5, jk="last"):
    """bio/model.py:273-290, eval mode."""
    h_list = [x.astype(np.float32)]
    for layer in range(num_layer):
        h = _CONVS[gnn_type](sd, f"gnns.{layer}", h_list[-1],
                             edge_index, edge_attr)
        if layer != num_layer - 1:
            h = np.maximum(h, 0.0)
        h_list.append(h)
    if jk == "last":
        return h_list[-1]
    return sum(h_list[1:])
