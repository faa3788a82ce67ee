"""Device-side (fused) attribute masking: the on-device sampler must match
the reference's per-graph random.sample semantics, and the fused loss must
equal the host-transform objective when both see the same masked set."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data import transforms
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.objectives.masking import (
    FusedMaskingObjective, MaskingObjective, sample_masked_nodes,
)


def _packed(n=12, max_nodes=256, max_edges=768, seed=3):
    graphs, _ = molecule_dataset(n, num_tasks=1, seed=seed, mean_atoms=14)
    return graphs, G.pack_graphs(graphs, max_nodes, max_edges, n,
                                 np_out=True)


def test_sample_masked_nodes_counts_and_support():
    """Per graph: exactly int(n*rate)+1 distinct valid nodes, never padded
    rows; every valid node is reachable across keys."""
    graphs, packed = _packed()
    rate = 0.15
    nper = np.array([g.num_nodes for g in graphs])
    want = (nper * rate).astype(int) + 1

    freq = np.zeros(packed.node_feat.shape[0])
    for k in range(30):
        masked = np.asarray(sample_masked_nodes(
            jax.random.PRNGKey(k), jnp.asarray(packed.node_graph),
            jnp.asarray(packed.node_mask), packed.max_graphs, rate,
        ))
        assert not masked[~np.asarray(packed.node_mask)].any()
        got = np.bincount(np.asarray(packed.node_graph)[masked],
                          minlength=len(graphs))
        np.testing.assert_array_equal(got, want)
        freq += masked
    # uniformity (coarse): every valid node selected at least once in 30
    # draws is too strict for large graphs; instead check support spread
    valid = np.asarray(packed.node_mask)
    assert (freq[valid] > 0).mean() > 0.5


@pytest.mark.parametrize("mask_edge", [False, True])
def test_fused_loss_matches_host_path(mask_edge):
    """Same masked atoms => identical loss/metrics between the fused
    (on-device) objective and the host-transform objective."""
    graphs, clean = _packed()
    rate = 0.15

    # host path: MaskAtom with known indices per graph
    rng = np.random.default_rng(7)
    t = transforms.MaskAtom(119, 5, rate, mask_edge)
    transformed = [t(g, rng) for g in graphs]
    n_masked_tot = sum(
        len(g.extras["masked_atom_indices"][0]) for g in transformed
    )
    extra_pad = {
        "masked_atom_indices": n_masked_tot + 8,
        "mask_node_label": n_masked_tot + 8,
        "connected_edge_indices": 768 // 2,
        "mask_edge_label": 768 // 2,
    }
    host_packed = G.pack_graphs(transformed, 256, 768, len(graphs),
                                extra_pad=extra_pad, np_out=True)

    # the same masked set as a bool array over the clean pack's rows
    idx = np.asarray(host_packed.extras["masked_atom_indices"])
    idx_mask = np.asarray(host_packed.extras["masked_atom_indices_mask"])
    masked = np.zeros(clean.node_feat.shape[0], bool)
    masked[idx[idx_mask]] = True

    kw = dict(num_layer=2, emb_dim=16, mask_edge=mask_edge)
    fused = FusedMaskingObjective(mask_rate=rate, **kw)
    host = MaskingObjective(**kw)
    variables = fused.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        clean, train=False,
    )

    loss_f, met_f = fused.apply(variables, clean, train=False,
                                masked_override=jnp.asarray(masked))
    loss_h, met_h = host.apply(variables, host_packed, train=False)
    np.testing.assert_allclose(float(loss_f), float(loss_h), rtol=1e-5)
    for k in met_h:
        np.testing.assert_allclose(float(met_f[k]), float(met_h[k]),
                                   rtol=1e-5, err_msg=k)


def test_run_pretrain_device_transform():
    """End-to-end: transform_device='device' trains through the fused
    objective on clean flat-packed batches."""
    from pretrain_gnns_tpu.train import pretrain

    graphs, _ = molecule_dataset(48, num_tasks=1, seed=9, mean_atoms=12)
    cfg = pretrain.PretrainConfig(
        objective="masking", num_layer=2, emb_dim=16, batch_size=16,
        epochs=2, mask_edge=True, packing="standard",
        transform_device="device", scan_steps=2,
    )
    res = pretrain.run_pretrain(cfg, graphs, log=None)
    assert len(res["history"]) == 2
    assert np.isfinite(res["history"][-1]["loss"])
    assert "acc_node" in res["history"][-1]
