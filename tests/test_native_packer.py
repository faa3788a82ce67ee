"""Native C++ packer: must build, match the python pack_graphs output
bit-for-bit, and be faster than the per-graph python path."""

import time

import numpy as np
import pytest

from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data.flat import FlatGraphs, FlatLoader
from pretrain_gnns_tpu.data.packing import PackedLoader
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.native import load as load_native


def test_native_library_builds():
    lib = load_native()
    assert lib is not None, "g++ build of libpacker.so failed"


def test_flat_pack_matches_pack_graphs(rng):
    graphs, _ = molecule_dataset(40, num_tasks=3, seed=2)
    flat = FlatGraphs.from_graphs(graphs)
    ids = rng.permutation(40)[:16]
    got = flat.pack(ids, 512, 1280, 16)
    ref = G.pack_graphs([graphs[i] for i in ids], 512, 1280, 16,
                        np_out=True)
    np.testing.assert_array_equal(got.node_feat, ref.node_feat)
    np.testing.assert_array_equal(got.edge_feat, ref.edge_feat)
    np.testing.assert_array_equal(got.senders, ref.senders)
    np.testing.assert_array_equal(got.receivers, ref.receivers)
    np.testing.assert_array_equal(got.node_graph, ref.node_graph)
    np.testing.assert_array_equal(got.node_mask, ref.node_mask)
    np.testing.assert_array_equal(got.edge_mask, ref.edge_mask)
    np.testing.assert_array_equal(got.y, ref.y)


def test_flat_pack_float_features(rng):
    """bio graphs: float edge features, dtype-agnostic byte copy."""
    from pretrain_gnns_tpu.data.synthetic import bio_dataset

    graphs = bio_dataset(10, seed=1, mean_nodes=20)
    for g in graphs:
        g.extras.clear()
    flat = FlatGraphs.from_graphs(graphs)
    got = flat.pack(np.arange(6), 512, 2048, 6)
    ref = G.pack_graphs(graphs[:6], 512, 2048, 6, np_out=True)
    np.testing.assert_array_equal(got.edge_feat, ref.edge_feat)
    np.testing.assert_array_equal(got.node_feat, ref.node_feat)


def test_flat_loader_covers_dataset(rng):
    graphs, _ = molecule_dataset(70, num_tasks=1, seed=3)
    flat = FlatGraphs.from_graphs(graphs)
    loader = FlatLoader(flat, 16, 512, 1280, shuffle=True, seed=0)
    total = sum(int(b.graph_mask.sum()) for b in loader)
    assert total == 70


def test_native_faster_than_python():
    graphs, _ = molecule_dataset(512, num_tasks=1, seed=4)
    flat = FlatGraphs.from_graphs(graphs)
    ids = np.arange(256)

    def best(f, reps=3, iters=10):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                f()
            b = min(b, time.perf_counter() - t0)
        return b

    sel = [graphs[i] for i in ids]
    t_native = best(lambda: flat.pack(ids, 8192, 20480, 256))
    t_python = best(
        lambda: G.pack_graphs(sel, 8192, 20480, 256, np_out=True)
    )
    # best-of-N so background load can't flip the comparison
    assert t_native < t_python, (t_native, t_python)


def test_overflow_raises(rng):
    graphs, _ = molecule_dataset(8, seed=5)
    flat = FlatGraphs.from_graphs(graphs)
    with pytest.raises(ValueError):
        flat.pack(np.arange(8), 16, 64, 8)


def test_flat_pack_blocked_matches(rng):
    """Blocked (Pallas) layout through the C++ packer must equal the python
    pack_graphs_blocked bit-for-bit (same first-fit)."""
    graphs, _ = molecule_dataset(32, num_tasks=2, seed=6)
    flat = FlatGraphs.from_graphs(graphs)
    ids = np.arange(24)
    blocks = (8, 128, 384)
    got = flat.pack(ids, 0, 0, 24, blocks=blocks)
    ref = G.pack_graphs_blocked([graphs[i] for i in ids], *blocks, 24,
                                np_out=True)
    for f in ("node_feat", "edge_feat", "senders", "receivers",
              "node_graph", "node_mask", "edge_mask", "graph_mask", "y"):
        np.testing.assert_array_equal(getattr(got, f), getattr(ref, f),
                                      err_msg=f)
    assert got.block_nodes == 128 and got.block_edges == 384


def test_flat_extras_bio_center(rng):
    """Per-graph NODE_IDX extras (bio center_node_idx) ride the flat path
    with python-side offsetting."""
    from pretrain_gnns_tpu.data.synthetic import bio_dataset

    graphs = bio_dataset(8, seed=2, mean_nodes=15)
    for g in graphs:
        g.extras = {"center_node_idx": g.extras["center_node_idx"]}
    flat = FlatGraphs.from_graphs(graphs)
    ids = np.array([3, 0, 5, 1])
    got = flat.pack(ids, 256, 1024, 4, extra_pad={"center_node_idx": 4})
    ref = G.pack_graphs([graphs[i] for i in ids], 256, 1024, 4,
                        extra_pad={"center_node_idx": 4}, np_out=True)
    np.testing.assert_array_equal(got.extras["center_node_idx"],
                                  ref.extras["center_node_idx"])
    np.testing.assert_array_equal(got.extras["center_node_idx_mask"],
                                  ref.extras["center_node_idx_mask"])


def test_make_loader_picks_flat_path():
    from pretrain_gnns_tpu.data.packing import make_loader

    graphs, _ = molecule_dataset(40, num_tasks=1, seed=7)
    ldr = make_loader(graphs, 16, shuffle=False)
    assert isinstance(ldr, FlatLoader)
    total = sum(int(b.graph_mask.sum()) for b in ldr)
    assert total == 40
    assert ldr.last_epoch_stats["graphs"] == 40

    ldr2 = make_loader(graphs, 16, shuffle=False,
                       transform=lambda g, rng: g)
    assert isinstance(ldr2, PackedLoader)


def test_flat_loader_blocked_equals_packed_loader():
    """FlatLoader and PackedLoader produce identical batch streams for the
    same seed in the blocked layout (interchangeability contract)."""
    graphs, _ = molecule_dataset(50, num_tasks=1, seed=8)
    blocks = (8, 128, 384)
    flat = FlatGraphs.from_graphs(graphs)
    fl = FlatLoader(flat, 16, shuffle=True, seed=5, blocks=blocks)
    pl = PackedLoader(graphs, 16, shuffle=True, seed=5, blocks=blocks)
    for a, b in zip(fl, pl):
        np.testing.assert_array_equal(a.senders, b.senders)
        np.testing.assert_array_equal(a.node_feat, b.node_feat)
        np.testing.assert_array_equal(a.graph_mask, b.graph_mask)


def test_prefetch_preserves_stream_and_raises():
    from pretrain_gnns_tpu.data.prefetch import chunked, prefetch

    assert list(prefetch(range(10), depth=2)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom(), depth=1)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)

    assert list(chunked(iter(range(7)), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
