"""Bio profile tests: checkpoint parity vs released bio model_architecture
weights, MaskEdge transform, bio objectives, and bio fine-tune end-to-end."""

import numpy as np
import pytest

import jax

from pretrain_gnns_tpu.compat import import_params
from pretrain_gnns_tpu.compat.torch_reader import load_torch_checkpoint
from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data import splitters, transforms
from pretrain_gnns_tpu.data.synthetic import bio_dataset, random_ego_network
from pretrain_gnns_tpu.models import bio as bio_models
from pretrain_gnns_tpu.train import finetune, pretrain

import oracle_bio

CKPT = "/root/reference/bio/model_architecture"


def _ego_graphs(rng, sizes=(20, 33)):
    gs = []
    for n in sizes:
        x, ei, ea, center = random_ego_network(rng, n)
        gs.append(G.Graph(x, ei, ea))
    return gs


def _pack(gs, max_nodes=128, max_edges=512):
    return G.pack_graphs(gs, max_nodes, max_edges, len(gs))


@pytest.mark.parametrize(
    "fname,gnn_type",
    [
        ("gcn_masking.pth", "gcn"),
        ("gat_masking.pth", "gat"),
        ("graphsage_masking.pth", "graphsage"),
        ("gcn_supervised_masking.pth", "gcn"),
    ],
)
def test_bio_checkpoint_parity(fname, gnn_type, rng):
    sd = load_torch_checkpoint(f"{CKPT}/{fname}")
    gs = _ego_graphs(rng)
    packed = _pack(gs)
    variables = import_params.trunk_from_torch(sd)
    model = bio_models.GNN(num_layer=5, emb_dim=300, gnn_type=gnn_type)
    out = np.asarray(
        model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            packed, train=False,
        )
    )
    off = 0
    for g in gs:
        ref = oracle_bio.trunk_forward(
            sd, gnn_type, g.node_feat, g.edge_index, g.edge_feat
        )
        np.testing.assert_allclose(
            out[off: off + g.num_nodes], ref, atol=2e-4, rtol=1e-4
        )
        off += g.num_nodes


def test_bio_gin_roundtrip_parity(rng):
    """No bio GIN checkpoints in the snapshot; export/import our own."""
    gs = _ego_graphs(rng)
    packed = _pack(gs)
    model = bio_models.GNN(num_layer=2, emb_dim=16, gnn_type="gin")
    variables = model.init(jax.random.PRNGKey(0), packed, train=False)
    stats = {}
    for conv, st in variables["batch_stats"].items():
        bn = st["mlp_1"]
        stats[conv] = {"mlp_1": {
            "mean": np.asarray(bn["mean"])
            + rng.normal(size=bn["mean"].shape).astype(np.float32) * 0.1,
            "var": np.asarray(bn["var"])
            * rng.uniform(0.5, 1.5, bn["var"].shape).astype(np.float32),
        }}
    variables = {"params": variables["params"], "batch_stats": stats}
    sd = import_params.trunk_to_torch(variables)
    assert "gnns.0.input_node_embeddings.weight" in sd
    assert "gnns.0.mlp.1.running_mean" in sd
    out = np.asarray(
        model.apply(import_params.trunk_from_torch(sd), packed, train=False)
    )
    off = 0
    for g in gs:
        ref = oracle_bio.trunk_forward(
            sd, "gin", g.node_feat, g.edge_index, g.edge_feat, num_layer=2
        )
        np.testing.assert_allclose(
            out[off: off + g.num_nodes], ref, atol=1e-4, rtol=1e-4
        )
        off += g.num_nodes


def test_mask_edge_transform(rng):
    x, ei, ea, _ = random_ego_network(rng, 25)
    g = G.Graph(x, ei, ea)
    out = transforms.MaskEdge(0.15)(g, rng)
    idx = out.extras["masked_edge_idx"][0]
    labels = out.extras["mask_edge_label"][0]
    assert np.all(idx % 2 == 0)  # first-direction only
    assert len(idx) == int(g.num_edges // 2 * 0.15 + 1)
    np.testing.assert_array_equal(labels, g.edge_feat[idx])
    mask_feat = np.zeros(9, np.float32)
    mask_feat[8] = 1
    for i in idx:
        np.testing.assert_array_equal(out.edge_feat[i], mask_feat)
        np.testing.assert_array_equal(out.edge_feat[i + 1], mask_feat)


def test_bio_context_transform(rng):
    graphs = bio_dataset(4, seed=7, mean_nodes=30)
    t = transforms.BioExtractSubstructureContextPair(l1=1, center=True)
    pair = t(graphs[0], rng)
    assert pair is not None
    # substruct is the whole graph
    assert pair.substruct.num_nodes == graphs[0].num_nodes
    # overlap covers the whole context
    ov = pair.context.extras["overlap_context_substruct_idx"][0]
    assert sorted(ov.tolist()) == list(range(pair.context.num_nodes))


@pytest.mark.parametrize("objective", ["masking", "edgepred", "infomax"])
def test_bio_pretrain_objectives(objective):
    graphs = bio_dataset(48, seed=3, mean_nodes=25)
    cfg = pretrain.PretrainConfig(
        objective=objective, domain="bio", num_layer=2, emb_dim=16,
        batch_size=16, epochs=2,
    )
    res = pretrain.run_pretrain(cfg, graphs, log=None)
    h = res["history"]
    assert all(np.isfinite(r["loss"]) for r in h)
    assert h[-1]["loss"] < h[0]["loss"]


def test_bio_contextpred_objective():
    graphs = bio_dataset(48, seed=3, mean_nodes=25)
    cfg = pretrain.PretrainConfig(
        objective="contextpred", domain="bio", num_layer=2, emb_dim=16,
        batch_size=16, epochs=2, mode="cbow",
    )
    # bio context loader needs the bio transform
    loader = pretrain.build_loader(cfg, graphs)
    sub, ctx = next(iter(loader))
    assert "center_substruct_idx" in sub.extras
    res = pretrain.run_pretrain(cfg, graphs, log=None)
    assert np.isfinite(res["history"][-1]["loss"])


def test_bio_finetune_species_split_e2e():
    graphs = bio_dataset(120, seed=9, mean_nodes=20)
    species = np.array(
        [g.extras["species_id"][0][0] for g in graphs]
    )
    tv, te = splitters.species_split(species)
    val_n = int(0.15 * len(tv))
    train = [graphs[i] for i in tv[val_n:]]
    val = [graphs[i] for i in tv[:val_n]]
    test = [graphs[i] for i in te]
    cfg = finetune.FinetuneConfig(
        domain="bio", num_tasks=40, num_layer=2, emb_dim=16,
        batch_size=16, epochs=3, dropout_ratio=0.1,
    )
    res = finetune.run_finetune(cfg, train, val, test, log=None)
    assert np.isfinite(res["test_auc"])
    assert res["curves"]["train_loss"][-1] < res["curves"]["train_loss"][0]
