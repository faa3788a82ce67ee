"""Checkpoint-anchored parity: our packed/masked JAX trunk must reproduce the
reference's per-node activations (loop-based numpy oracle) on the released
``model_architecture`` checkpoints — SURVEY.md §6 correctness target."""

import numpy as np
import pytest

import jax

from pretrain_gnns_tpu.compat import import_params
from pretrain_gnns_tpu.compat.torch_reader import load_torch_checkpoint
from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.models.chem import GNN, GNNGraphPred

import oracle_chem as oracle

CKPT = "/root/reference/chem/model_architecture"


def _pack(mols, max_nodes=64, max_edges=160):
    gs = [
        G.Graph(node_feat=x, edge_index=ei, edge_feat=ea)
        for (x, ei, ea) in mols
    ]
    return G.pack_graphs(gs, max_nodes, max_edges, max_graphs=len(gs))


def _random_batch(rng, sizes=(9, 14, 4)):
    return [oracle.random_molecule(rng, n) for n in sizes]


def _check_trunk(sd, gnn_type, rng, jk="last", atol=2e-4):
    mols = _random_batch(rng)
    packed = _pack(mols)
    variables = import_params.trunk_from_torch(sd)
    model = GNN(num_layer=5, emb_dim=300, jk=jk, gnn_type=gnn_type)
    out = np.asarray(
        model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            packed, train=False,
        )
    )
    off = 0
    for x, ei, ea in mols:
        ref = oracle.trunk_forward(sd, gnn_type, x, ei, ea, jk=jk)
        got = out[off: off + x.shape[0]]
        np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-4)
        off += x.shape[0]


@pytest.mark.parametrize(
    "fname,gnn_type",
    [
        ("gcn_contextpred.pth", "gcn"),
        ("gat_contextpred.pth", "gat"),
        ("graphsage_contextpred.pth", "graphsage"),
        ("gcn_supervised.pth", "gcn"),
    ],
)
def test_released_checkpoint_parity(fname, gnn_type, rng):
    sd = load_torch_checkpoint(f"{CKPT}/{fname}")
    _check_trunk(sd, gnn_type, rng)


@pytest.mark.parametrize("jk", ["last", "concat", "max", "sum"])
def test_gin_roundtrip_parity(jk, rng):
    """No GIN checkpoints survive in the snapshot
    (/root/reference/.MISSING_LARGE_BLOBS), so: init our GIN, export to the
    reference key layout, randomize BN stats, and check both directions."""
    model = GNN(num_layer=5, emb_dim=32, jk=jk, gnn_type="gin")
    packed = _pack(_random_batch(rng))
    variables = model.init(jax.random.PRNGKey(0), packed, train=False)
    # randomize running stats so BN eval is non-trivial
    stats = {}
    for bn, st in variables["batch_stats"].items():
        m = np.asarray(st["mean"])
        v = np.asarray(st["var"])
        stats[bn] = {
            "mean": m + rng.normal(size=m.shape).astype(np.float32) * 0.1,
            "var": v * rng.uniform(0.5, 1.5, size=v.shape).astype(np.float32),
        }
    variables = {"params": variables["params"], "batch_stats": stats}
    sd = import_params.trunk_to_torch(variables)
    # reimport must round-trip exactly
    re = import_params.trunk_from_torch(sd)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(re),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p1))
    _check_trunk_with_model(sd, model, packed, rng, jk)


def _check_trunk_with_model(sd, model, packed, rng, jk, atol=1e-4):
    variables = import_params.trunk_from_torch(sd)
    out = np.asarray(model.apply(variables, packed, train=False))
    # reconstruct per-graph slices from masks
    node_graph = np.asarray(packed.node_graph)
    node_mask = np.asarray(packed.node_mask)
    x_all = np.asarray(packed.node_feat)
    snd = np.asarray(packed.senders)
    rcv = np.asarray(packed.receivers)
    ea_all = np.asarray(packed.edge_feat)
    emask = np.asarray(packed.edge_mask)
    for gid in range(int(node_graph[node_mask].max()) + 1):
        nidx = np.where(node_mask & (node_graph == gid))[0]
        lo, hi = nidx.min(), nidx.max() + 1
        esel = np.where(emask & (rcv >= lo) & (rcv < hi))[0]
        ei = np.stack([rcv[esel] - lo, snd[esel] - lo])
        ref = oracle.trunk_forward(
            sd, model.gnn_type, x_all[lo:hi], ei, ea_all[esel], jk=jk
        )
        np.testing.assert_allclose(out[lo:hi], ref, atol=atol, rtol=1e-4)


def test_graphpred_head_mean_pool(rng):
    sd = load_torch_checkpoint(f"{CKPT}/gcn_contextpred.pth")
    mols = _random_batch(rng)
    packed = _pack(mols)
    model = GNNGraphPred(num_layer=5, emb_dim=300, num_tasks=12,
                         gnn_type="gcn")
    variables = model.init(jax.random.PRNGKey(1), packed, train=False)
    variables = import_params.graphpred_variables_with_trunk(
        variables, import_params.trunk_from_torch(sd)
    )
    logits = np.asarray(model.apply(variables, packed, train=False))
    assert logits.shape == (3, 12)
    # oracle: mean-pool node reps then linear
    W = np.asarray(variables["params"]["graph_pred_linear"]["kernel"])
    b = np.asarray(variables["params"]["graph_pred_linear"]["bias"])
    off = 0
    for i, (x, ei, ea) in enumerate(mols):
        rep = oracle.trunk_forward(sd, "gcn", x, ei, ea)
        ref = rep.mean(0) @ W + b
        np.testing.assert_allclose(logits[i], ref, atol=2e-4, rtol=1e-4)
        off += x.shape[0]


@pytest.mark.parametrize("pooling", ["sum", "max", "attention", "set2set2"])
def test_graphpred_other_pools_run(pooling, rng):
    packed = _pack(_random_batch(rng))
    model = GNNGraphPred(num_layer=2, emb_dim=16, num_tasks=3,
                         graph_pooling=pooling, gnn_type="gin")
    variables = model.init(jax.random.PRNGKey(2), packed, train=False)
    out = np.asarray(model.apply(variables, packed, train=False))
    assert out.shape == (3, 3) and np.isfinite(out).all()
