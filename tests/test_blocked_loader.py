"""Blocked PackedLoader: coverage, invariants, and an end-to-end masking
pretrain step through the Pallas (interpret) backend."""

import numpy as np

from pretrain_gnns_tpu.data.packing import PackedLoader, block_layout
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.ops import spmm


def test_blocked_loader_covers_dataset():
    graphs, _ = molecule_dataset(100, seed=8, mean_atoms=14)
    blocks = block_layout(graphs, 16, block_nodes=64, block_edges=256)
    loader = PackedLoader(graphs, 16, blocks=blocks, shuffle=True, seed=1)
    total = 0
    for b in loader:
        assert b.block_nodes == blocks[1] and b.block_edges == blocks[2]
        total += int(b.graph_mask.sum())
        # per-block endpoint containment
        for blk in range(blocks[0]):
            sl = slice(blk * blocks[2], (blk + 1) * blocks[2])
            m = b.edge_mask[sl]
            if m.any():
                r = b.receivers[sl][m]
                assert r.min() >= blk * blocks[1]
                assert r.max() < (blk + 1) * blocks[1]
    assert total == 100


def test_blocked_masking_pretrain_with_pallas_backend():
    from pretrain_gnns_tpu.train import pretrain

    graphs, _ = molecule_dataset(64, seed=9, mean_atoms=12)
    cfg = pretrain.PretrainConfig(
        objective="masking", num_layer=2, emb_dim=16, batch_size=16,
        epochs=1, mask_edge=True, packing="blocked",
    )
    blocked = pretrain.build_loader(cfg, graphs)
    import jax

    model = pretrain.build_objective(cfg)
    batch = next(iter(blocked))
    assert batch.block_nodes > 0  # blocked (Pallas) layout active
    spmm.set_backend("pallas")
    try:
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        (loss, metrics), _ = model.apply(
            variables, batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert np.isfinite(float(loss))
    finally:
        spmm.set_backend("xla")
