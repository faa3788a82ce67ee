"""Epoch iteration: shuffle, batch, and pack host graphs into static shapes.

Replaces the reference's torch ``DataLoader`` + collate machinery
(chem/dataloader.py, chem/batch.py). Batches are ``batch_size`` graphs in
shuffled order (matching reference epoch semantics,
chem/pretrain_masking.py:124); each batch is packed into fixed
``(max_nodes, max_edges, batch_size)`` buffers sized once per dataset so XLA
compiles exactly one shape. A batch whose graphs overflow the buffers drops
trailing graphs into the next batch (rare when buffers are sized from the
dataset's own statistics via :func:`buffer_sizes`).
"""

from __future__ import annotations

import math
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from pretrain_gnns_tpu.core.graphs import (
    Graph, PackedGraphs, pack_graphs, pack_graphs_blocked,
)


def choose_blocks(graphs, batch_size: int, packing: str = "auto"):
    """Resolve the ``packing`` knob to a block layout (or None = standard
    padded packing). "auto" uses the block-diagonal layout whenever an
    accelerator is present (it feeds the Pallas kernels; on CPU the XLA
    path is equally correct but blocked padding buys nothing)."""
    if packing == "standard":
        return None
    if packing == "blocked":
        return block_layout(graphs, batch_size, block_nodes=128,
                            block_edges=384)
    if packing != "auto":
        raise ValueError(packing)
    import jax

    try:
        on_accel = jax.default_backend() != "cpu"
    except Exception:
        on_accel = False
    return (block_layout(graphs, batch_size, block_nodes=128,
                         block_edges=384) if on_accel else None)


def block_layout(
    graphs: Sequence[Graph],
    batch_size: int,
    block_nodes: int = 256,
    block_edges: int = 768,
    slack: float = 1.3,
) -> Tuple[int, int, int]:
    """(n_blocks, block_nodes, block_edges) for the block-diagonal layout
    consumed by the Pallas SpMM kernel; capacities grow to fit the largest
    single graph."""
    n = np.array([g.num_nodes for g in graphs])
    e = np.array([g.num_edges for g in graphs])
    block_nodes = max(block_nodes, int(n.max()))
    block_edges = max(block_edges, int(e.max()))
    block_nodes = (block_nodes + 7) // 8 * 8
    block_edges = (block_edges + 127) // 128 * 128
    n_blocks = max(
        int(math.ceil(n.mean() * batch_size * slack / block_nodes)),
        int(math.ceil(e.mean() * batch_size * slack / block_edges)),
        1,
    )
    # round up to a multiple of the kernel's grid-grouping factor so each
    # Pallas grid step can process a full group of blocks (padded blocks
    # are all-zero and cost one masked matmul each)
    n_blocks = (n_blocks + 7) // 8 * 8
    return n_blocks, block_nodes, block_edges


def buffer_sizes(
    graphs: Sequence[Graph],
    batch_size: int,
    slack: float = 1.15,
    multiple: int = 128,
) -> Tuple[int, int]:
    """Choose (max_nodes, max_edges): enough for an average batch plus
    slack, never less than the single largest graph, rounded up to a
    lane-friendly multiple."""
    n = np.array([g.num_nodes for g in graphs])
    e = np.array([g.num_edges for g in graphs])
    max_nodes = max(
        int(n.mean() * batch_size * slack), int(n.max()) + 1
    )
    max_edges = max(
        int(e.mean() * batch_size * slack) + max_nodes // 8,
        int(e.max()) + 1,
    )
    r = lambda v: int(math.ceil(v / multiple) * multiple)
    return r(max_nodes), r(max_edges)


def make_loader(
    graphs: Sequence[Graph],
    batch_size: int,
    max_nodes: Optional[int] = None,
    max_edges: Optional[int] = None,
    shuffle: bool = True,
    drop_last: bool = False,
    seed: int = 0,
    transform=None,
    extra_pad=None,
    blocks: Optional[Tuple[int, int, int]] = None,
    post_transform=None,
):
    """Loader factory: transform-free datasets with flat-compatible extras
    get the zero-copy ``FlatLoader`` (C++ packer hot path); anything else
    falls back to the per-graph ``PackedLoader``. Both expose the same
    iteration semantics (seeded shuffle, early flush, drop_last,
    ``last_epoch_stats``)."""
    if transform is None:
        from pretrain_gnns_tpu.data.flat import FlatGraphs, FlatLoader

        try:
            flat = FlatGraphs.from_graphs(list(graphs))
        except (ValueError, IndexError):
            flat = None
        if flat is not None:
            if blocks is None and (max_nodes is None or max_edges is None):
                mn, me = buffer_sizes(list(graphs), batch_size)
                max_nodes = max_nodes or mn
                max_edges = max_edges or me
            return FlatLoader(
                flat, batch_size, max_nodes or 0, max_edges or 0,
                shuffle=shuffle, seed=seed, drop_last=drop_last,
                blocks=blocks, extra_pad=extra_pad,
                post_transform=post_transform,
            )
    return PackedLoader(
        graphs, batch_size, max_nodes, max_edges, shuffle=shuffle,
        drop_last=drop_last, seed=seed, transform=transform,
        extra_pad=extra_pad, blocks=blocks, post_transform=post_transform,
    )


class PackedLoader:
    """Iterable over packed batches.

    Args:
      graphs: host dataset.
      batch_size: graph slots per batch (static).
      max_nodes/max_edges: static buffer sizes (default: buffer_sizes()).
      shuffle: reshuffle each epoch (seeded; epoch advances the stream).
      drop_last: drop the final partial batch (train) or keep it (eval).
      transform: per-graph callable applied at iteration time (the L1 SSL
        transforms — MaskAtom etc. — run here, like reference DataLoader
        workers applying dataset.transform per __getitem__).
      extra_pad: forwarded to pack_graphs for transform-emitted fields.
    """

    def __init__(
        self,
        graphs: Sequence[Graph],
        batch_size: int,
        max_nodes: Optional[int] = None,
        max_edges: Optional[int] = None,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 0,
        transform: Optional[Callable[[Graph, np.random.Generator], Graph]] = None,
        extra_pad=None,
        blocks: Optional[Tuple[int, int, int]] = None,
        post_transform=None,
    ):
        self.graphs = list(graphs)
        self.post_transform = post_transform
        self.batch_size = batch_size
        self.blocks = blocks
        if blocks is not None:
            n_blocks, bn, be = blocks
            max_nodes, max_edges = n_blocks * bn, n_blocks * be
        elif max_nodes is None or max_edges is None:
            mn, me = buffer_sizes(self.graphs, batch_size)
            max_nodes = max_nodes or mn
            max_edges = max_edges or me
        self.max_nodes, self.max_edges = max_nodes, max_edges
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.transform = transform
        self.extra_pad = extra_pad
        self._epoch = 0
        # realized packing telemetry for the last completed epoch
        # (graphs_per_batch < batch_size signals early flushes from
        # undersized buffers — see buffer_sizes/choose_blocks)
        self.last_epoch_stats: dict = {}

    def __len__(self) -> int:
        n = len(self.graphs)
        return n // self.batch_size if self.drop_last else math.ceil(
            n / self.batch_size
        )

    def __iter__(self) -> Iterator[PackedGraphs]:
        order = np.arange(len(self.graphs))
        rng = np.random.default_rng((self.seed, self._epoch))
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1

        def _pack(batch: List[Graph]) -> PackedGraphs:
            if self.blocks is not None:
                n_blocks, bn, be = self.blocks
                out = pack_graphs_blocked(
                    batch, n_blocks, bn, be, self.batch_size,
                    extra_pad=self.extra_pad, np_out=True,
                )
            else:
                out = pack_graphs(
                    batch,
                    self.max_nodes,
                    self.max_edges,
                    self.batch_size,
                    extra_pad=self.extra_pad,
                    np_out=True,  # host-side; jit transfers per step
                )
            if self.post_transform is not None:
                out = self.post_transform(out, rng)
            return out

        def fits(g: Graph, fills) -> bool:
            if self.blocks is None:
                return (
                    n_nodes + g.num_nodes <= self.max_nodes
                    and n_edges + g.num_edges <= self.max_edges
                )
            # blocked: simulate the packer's first-fit (fragmentation-aware)
            n_blocks, bn, be = self.blocks
            for b in range(n_blocks):
                if (
                    fills[b][0] + g.num_nodes <= bn
                    and fills[b][1] + g.num_edges <= be
                ):
                    fills[b] = (
                        fills[b][0] + g.num_nodes,
                        fills[b][1] + g.num_edges,
                    )
                    return True
            return False

        def new_fills():
            return (
                [(0, 0) for _ in range(self.blocks[0])]
                if self.blocks is not None
                else None
            )

        batch: List[Graph] = []
        n_nodes = n_edges = 0
        n_batches = n_graphs = tot_edges = 0
        fills = new_fills()
        for idx in order:
            g = self.graphs[idx]
            if self.transform is not None:
                g = self.transform(g, rng)
            if batch and not fits(g, fills):
                yield _pack(batch)  # buffer overflow: flush early
                n_batches += 1
                n_graphs += len(batch)
                tot_edges += n_edges
                batch, n_nodes, n_edges = [], 0, 0
                fills = new_fills()
                fits(g, fills)
            elif not batch:
                fits(g, fills)  # seed the fill simulation
            batch.append(g)
            n_nodes += g.num_nodes
            n_edges += g.num_edges
            if len(batch) == self.batch_size:
                yield _pack(batch)
                n_batches += 1
                n_graphs += len(batch)
                tot_edges += n_edges
                batch, n_nodes, n_edges = [], 0, 0
                fills = new_fills()
        if batch and not self.drop_last:
            yield _pack(batch)
            n_batches += 1
            n_graphs += len(batch)
            tot_edges += n_edges
        self.last_epoch_stats = {
            "batches": n_batches, "graphs": n_graphs, "edges": tot_edges,
            "graphs_per_batch": n_graphs / max(n_batches, 1),
        }
