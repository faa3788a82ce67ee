"""Loader for context-prediction: packs (substructure, context) graph pairs.

Replaces ``DataLoaderSubstructContext`` + ``BatchSubstructContext``
(chem/dataloader.py:25-41, chem/batch.py:124-228): the transform yields two
independent mini-graphs per sample; each stream is packed into its own
static-shape :class:`PackedGraphs`, aligned by graph slot. Samples whose
context or overlap is empty are skipped (chem/batch.py:167-169).
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from pretrain_gnns_tpu.core.graphs import Graph, PackedGraphs, pack_graphs
from pretrain_gnns_tpu.data.transforms import (
    ExtractSubstructureContextPair, SubstructContextPair,
)


class ContextPairLoader:
    def __init__(
        self,
        graphs: Sequence[Graph],
        batch_size: int,
        transform: ExtractSubstructureContextPair,
        max_nodes: int,
        max_edges: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.transform = transform
        self.max_nodes, self.max_edges = max_nodes, max_edges
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __iter__(self) -> Iterator[Tuple[PackedGraphs, PackedGraphs]]:
        order = np.arange(len(self.graphs))
        rng = np.random.default_rng((self.seed, self._epoch))
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1

        subs: List[Graph] = []
        ctxs: List[Graph] = []
        n_s = e_s = n_c = e_c = 0

        def flush():
            sub_packed = pack_graphs(
                subs, self.max_nodes, self.max_edges, self.batch_size,
                extra_pad={"center_substruct_idx": self.batch_size},
                np_out=True,
            )
            ctx_packed = pack_graphs(
                ctxs, self.max_nodes, self.max_edges, self.batch_size,
                extra_pad={
                    "overlap_context_substruct_idx": self.max_nodes,
                },
                np_out=True,
            )
            return sub_packed, ctx_packed

        for idx in order:
            pair = self.transform(self.graphs[idx], rng)
            if pair is None:
                continue
            s, c = pair.substruct, pair.context
            if subs and (
                n_s + s.num_nodes > self.max_nodes
                or e_s + s.num_edges > self.max_edges
                or n_c + c.num_nodes > self.max_nodes
                or e_c + c.num_edges > self.max_edges
            ):
                yield flush()
                subs, ctxs = [], []
                n_s = e_s = n_c = e_c = 0
            subs.append(s)
            ctxs.append(c)
            n_s += s.num_nodes
            e_s += s.num_edges
            n_c += c.num_nodes
            e_c += c.num_edges
            if len(subs) == self.batch_size:
                yield flush()
                subs, ctxs = [], []
                n_s = e_s = n_c = e_c = 0
        if subs and not self.drop_last:
            yield flush()
