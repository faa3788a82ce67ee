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


class PresampledContextLoader:
    """Fast context-prediction pipeline: the per-sample CSR-BFS transform
    (the CPU hot loop SURVEY.md §3.3 warns about — one python BFS + two
    induced subgraphs per sample per epoch) runs ONCE per (graph, variant)
    at construction; epochs then cycle variants (``epoch % variants``) and
    the pair batches are packed by the C++ flat packer like every other
    fast-path objective.

    Documented deviation from the reference: the reference redraws the
    root per epoch, so over E epochs a graph sees up to E distinct
    contexts; here it sees ``variants`` (default 8) distinct contexts,
    each reused ~E/variants times (epoch-shuffled batch composition still
    differs every epoch). Distribution per draw is identical.

    Measured effect (r5, VERDICT weak #6): 24-epoch cbow training on the
    bench config, variants=8 vs exact per-epoch host resampling
    (``transform_device="host"``) — loss 1.374 vs 1.386, sign-accuracy
    0.559 vs 0.550 at epoch 24, with the curves interleaved throughout
    (within run-to-run noise): the cycling deviation costs nothing
    measurable on the objective's trajectory.

    Yields (substruct PackedGraphs, context PackedGraphs) aligned by graph
    slot, same as :class:`ContextPairLoader`."""

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
        variants: int = 8,
    ):
        from pretrain_gnns_tpu.data.flat import FlatGraphs

        self.batch_size = batch_size
        self.max_nodes, self.max_edges = max_nodes, max_edges
        self.shuffle, self.seed, self.drop_last = shuffle, seed, drop_last
        self.variants = variants
        self._epoch = 0
        self.last_epoch_stats: dict = {}

        rng = np.random.default_rng((seed, 727272))
        self._sub: List = []      # per variant: FlatGraphs of substructs
        self._ctx: List = []      # per variant: FlatGraphs of contexts
        self._ov_flat: List = []  # per variant: ragged overlap indices
        self._ov_off: List = []
        self._eff_n: List = []    # per variant: max(sub_n, ctx_n) per pair
        self._eff_e: List = []
        for _ in range(variants):
            subs: List[Graph] = []
            ctxs: List[Graph] = []
            ovs: List[np.ndarray] = []
            for g in graphs:
                pair = transform(g, rng)
                if pair is None:
                    continue
                s, c = pair.substruct, pair.context
                ovs.append(np.asarray(
                    c.extras.pop("overlap_context_substruct_idx")[0],
                    np.int64,
                ))
                subs.append(s)
                ctxs.append(c)
            if not subs:
                raise ValueError("no valid context pairs in dataset")
            self._sub.append(FlatGraphs.from_graphs(subs))
            self._ctx.append(FlatGraphs.from_graphs(ctxs))
            self._ov_flat.append(np.concatenate(ovs))
            self._ov_off.append(np.concatenate(
                [[0], np.cumsum([len(o) for o in ovs])]
            ).astype(np.int64))
            sn = np.diff(self._sub[-1].node_off)
            se = np.diff(self._sub[-1].edge_off)
            cn = np.diff(self._ctx[-1].node_off)
            ce = np.diff(self._ctx[-1].edge_off)
            # conservative joint capacity: a batch fitting the max of the
            # two streams fits both (one planner pass instead of two)
            self._eff_n.append(np.maximum(sn, cn))
            self._eff_e.append(np.maximum(se, ce))

    def __len__(self) -> int:
        n = min(len(f) for f in self._sub)
        return n // self.batch_size if self.drop_last else math.ceil(
            n / self.batch_size
        )

    def _overlap_padded(self, v: int, ids: np.ndarray,
                        ctx_starts: np.ndarray, pad_len: int):
        """Ragged per-graph overlap indices -> padded slot-space array +
        mask, offset by each graph's packed context start (np.repeat
        trick; shared by the host and device loaders)."""
        off = self._ov_off[v]
        lens = off[ids + 1] - off[ids]
        tot = int(lens.sum())
        within = np.arange(tot) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        src = np.repeat(off[ids], lens) + within
        vals = self._ov_flat[v][src] + np.repeat(ctx_starts, lens)
        pad = np.zeros(pad_len, np.int32)
        pad[:tot] = vals
        m = np.zeros(pad_len, bool)
        m[:tot] = True
        return pad, m

    def _batch(self, v: int, ids: np.ndarray
               ) -> Tuple[PackedGraphs, PackedGraphs]:
        sub = self._sub[v].pack(
            ids, self.max_nodes, self.max_edges, self.batch_size,
            extra_pad={"center_substruct_idx": self.batch_size},
        )
        ctx = self._ctx[v].pack(
            ids, self.max_nodes, self.max_edges, self.batch_size,
        )
        cn = np.diff(self._ctx[v].node_off)[ids]
        cur = np.concatenate([[0], np.cumsum(cn)[:-1]])
        pad, m = self._overlap_padded(v, ids, cur, self.max_nodes)
        extras = dict(ctx.extras or {})
        extras["overlap_context_substruct_idx"] = pad
        extras["overlap_context_substruct_idx_mask"] = m
        return sub, ctx.replace(extras=extras)

    def _iter_ids(self) -> Iterator[Tuple[int, np.ndarray]]:
        """Greedy capacity walk over one epoch: yields (variant, graph
        ids) per batch and updates ``last_epoch_stats``."""
        v = self._epoch % self.variants
        rng = np.random.default_rng((self.seed, self._epoch))
        self._epoch += 1
        n = len(self._sub[v])
        order = np.arange(n)
        if self.shuffle:
            rng.shuffle(order)

        eff_n, eff_e = self._eff_n[v], self._eff_e[v]
        se = np.diff(self._sub[v].edge_off)
        ce = np.diff(self._ctx[v].edge_off)
        batch: List[int] = []
        fn = fe = 0
        n_batches = n_graphs = n_edges = 0

        def flush(ids):
            nonlocal n_batches, n_graphs, n_edges
            ids = np.asarray(ids, np.int64)
            n_batches += 1
            n_graphs += len(ids)
            n_edges += int(se[ids].sum() + ce[ids].sum())
            return v, ids

        for gi in order:
            nn, ne = int(eff_n[gi]), int(eff_e[gi])
            if batch and (fn + nn > self.max_nodes
                          or fe + ne > self.max_edges):
                yield flush(batch)
                batch, fn, fe = [], 0, 0
            batch.append(int(gi))
            fn += nn
            fe += ne
            if len(batch) == self.batch_size:
                yield flush(batch)
                batch, fn, fe = [], 0, 0
        if batch and not self.drop_last:
            yield flush(batch)
        self.last_epoch_stats = {
            "batches": n_batches, "graphs": n_graphs, "edges": n_edges,
            "graphs_per_batch": n_graphs / max(n_batches, 1),
        }

    def __iter__(self) -> Iterator[Tuple[PackedGraphs, PackedGraphs]]:
        for v, ids in self._iter_ids():
            yield self._batch(v, ids)


from pretrain_gnns_tpu.data.device_pack import EpochStackMixin  # noqa: E402


class DeviceContextLoader(EpochStackMixin, PresampledContextLoader):
    """Device-resident context prediction: every variant's presampled
    (substruct, context) datasets live in HBM as chunked resident arrays
    (data/device_pack.py layout), concatenated variant-major so ONE jit
    signature covers all variants (the per-variant chunk base rides the
    descriptor's gather plan). Iteration yields ~KB descriptors; the pair
    batches materialize inside the jitted step via ``prepare_pure`` —
    same architecture as ``DeviceBatchLoader``, extended to two aligned
    streams plus the center/overlap index extras.

    HBM cost: ``variants`` copies of (substruct + context) ≈
    ``variants * 0.5-1.5x`` the source dataset; lower ``variants`` to
    trade context diversity for memory."""

    def __init__(self, *args, blocked: bool = False, **kw):
        from pretrain_gnns_tpu.data.device_pack import (
            CHUNK, build_device_flat,
        )
        import jax.numpy as jnp

        super().__init__(*args, **kw)
        ceil8 = lambda a: -(-np.asarray(a) // CHUNK) * CHUNK
        self.max_nodes = int(ceil8(self.max_nodes))
        self.max_edges = int(ceil8(self.max_edges))
        self.blocked = blocked

        self._aux_s, self._aux_c = [], []
        self._base = []  # per variant: (sub_n, sub_e, ctx_n, ctx_e) rows
        cat_s_n, cat_s_e, cat_c_n, cat_c_e = [], [], [], []
        bn_s = be_s = bn_c = be_c = 0
        self._center_local = []
        for v in range(self.variants):
            ds, ax_s = build_device_flat(self._sub[v], as_numpy=True)
            dc, ax_c = build_device_flat(self._ctx[v], as_numpy=True)
            self._aux_s.append(ax_s)
            self._aux_c.append(ax_c)
            self._base.append((bn_s, be_s, bn_c, be_c))
            cat_s_n.append(ds["node8"])
            cat_s_e.append(ds["edge8"])
            cat_c_n.append(dc["node8"])
            cat_c_e.append(dc["edge8"])
            bn_s += ds["node8"].shape[0]
            be_s += ds["edge8"].shape[0]
            bn_c += dc["node8"].shape[0]
            be_c += dc["edge8"].shape[0]
            self._center_local.append(np.asarray(
                self._sub[v].extras["center_substruct_idx"][0]
            ).reshape(-1).astype(np.int64))
            # chunk-aligned capacity accounting for the planner walk
            self._eff_n[v] = np.maximum(ceil8(ax_s["lens_n8"]),
                                        ceil8(ax_c["lens_n8"]))
            self._eff_e[v] = np.maximum(ceil8(ax_s["lens_e8"]),
                                        ceil8(ax_c["lens_e8"]))
        self.dev = {
            "s_node8": jnp.asarray(np.concatenate(cat_s_n)),
            "s_edge8": jnp.asarray(np.concatenate(cat_s_e)),
            "c_node8": jnp.asarray(np.concatenate(cat_c_n)),
            "c_edge8": jnp.asarray(np.concatenate(cat_c_e)),
        }

        # per-stream buffer layouts: substructs and contexts have very
        # different size distributions, so each stream gets its own
        # (block) geometry — and the blocked layout feeds the Pallas SpMM
        if blocked:
            def layout(auxes, lens_key_n, lens_key_e):
                n = np.concatenate([a[lens_key_n] for a in auxes])
                e = np.concatenate([a[lens_key_e] for a in auxes])
                bn = max(128, int(ceil8(n.max(initial=1))))
                # 384 floor kept deliberately: a 128-edge floor measured
                # SLOWER for chem contexts (4.9 -> 4.1 M e2e) despite the
                # smaller buffers — the [384, 128] one-hot tiles beat
                # [128, 128] ones at these shapes
                be = max(384, int(-(-int(e.max(initial=1)) // 128) * 128))
                import math as _m

                nb = max(
                    int(_m.ceil(n.mean() * self.batch_size * 1.3 / bn)),
                    int(_m.ceil(e.mean() * self.batch_size * 1.3 / be)),
                    1,
                )
                return bn, be, (nb + 7) // 8 * 8

            # INDEPENDENT block counts per stream: contexts (annuli) are
            # much smaller than substructs (k-hop balls), and a shared
            # count left the context buffers ~10% utilized — the context
            # trunk was mostly processing padding
            self.bn_s, self.be_s, self.nb_s = layout(
                self._aux_s, "lens_n8", "lens_e8"
            )
            self.bn_c, self.be_c, self.nb_c = layout(
                self._aux_c, "lens_n8", "lens_e8"
            )
            self.mn_s = self.nb_s * self.bn_s
            self.me_s = self.nb_s * self.be_s
            self.mn_c = self.nb_c * self.bn_c
            self.me_c = self.nb_c * self.be_c
        else:
            self.mn_s = self.mn_c = self.max_nodes
            self.me_s = self.me_c = self.max_edges

    # the jitted side --------------------------------------------------
    def prepare_pure(self, dev, desc):
        import jax.numpy as jnp

        from pretrain_gnns_tpu.data.device_pack import materialize

        def stream(prefix, n8, e8, aux, mn, me, bn, be):
            d = {k[2:]: v for k, v in desc.items()
                 if k.startswith(prefix)}
            d["gid"] = desc["gid"]
            d["gmask"] = desc["gmask"]
            return materialize(
                {"node8": n8, "edge8": e8}, d, mn, me,
                fn=aux["fn"], fe=aux["fe"], with_y=False,
                block_nodes=bn, block_edges=be,
                node_dtype=aux["node_dtype"],
                edge_dtype=aux["edge_dtype"],
            )

        bks = (self.bn_s, self.be_s) if self.blocked else (0, 0)
        bkc = (self.bn_c, self.be_c) if self.blocked else (0, 0)
        sub = stream("s_", dev["s_node8"], dev["s_edge8"], self._aux_s[0],
                     self.mn_s, self.me_s, *bks)
        ctx = stream("c_", dev["c_node8"], dev["c_edge8"], self._aux_c[0],
                     self.mn_c, self.me_c, *bkc)
        sub = sub.replace(extras={
            "center_substruct_idx": desc["center_slots"],
        })
        ctx = ctx.replace(extras={
            "overlap_context_substruct_idx": desc["overlap_slots"],
            "overlap_context_substruct_idx_mask": desc["overlap_mask"],
        })
        return (sub, ctx)

    def prepare(self, desc):
        return self.prepare_pure(self.dev, desc)

    # host-side descriptors -------------------------------------------
    def _descriptor(self, v: int, ids: np.ndarray,
                    placement=None) -> dict:
        from pretrain_gnns_tpu.data.device_pack import stream_descriptor

        G = self.batch_size
        bn_s, be_s, bn_c, be_c = self._base[v]

        def stream(flat, aux, base_n, base_e, mn, me, starts):
            lens_n = np.diff(flat.node_off)[ids]
            lens_e = np.diff(flat.edge_off)[ids]
            if starts is None:
                n8 = aux["lens_n8"][ids]
                e8 = aux["lens_e8"][ids]
                nstarts = np.concatenate([[0], np.cumsum(n8)[:-1]])
                estarts = np.concatenate([[0], np.cumsum(e8)[:-1]])
            else:
                nstarts, estarts = starts
            d = stream_descriptor(
                aux, lens_n, lens_e, ids, nstarts, estarts,
                mn, me, G,
                chunk_base_n=base_n, chunk_base_e=base_e,
            )
            return d, nstarts

        ps = pc = None
        if placement is not None:
            ps, pc = placement
        ds, ns_sub = stream(self._sub[v], self._aux_s[v], bn_s, be_s,
                            self.mn_s, self.me_s, ps)
        dc, ns_ctx = stream(self._ctx[v], self._aux_c[v], bn_c, be_c,
                            self.mn_c, self.me_c, pc)
        desc = {"gid": ds.pop("gid"), "gmask": ds.pop("gmask")}
        dc.pop("gid"), dc.pop("gmask")
        desc.update({f"s_{k}": a for k, a in ds.items()})
        desc.update({f"c_{k}": a for k, a in dc.items()})

        # center slot per graph slot (padding graphs -> 0, masked by gmask)
        center = np.zeros(G, np.int32)
        center[: len(ids)] = ns_sub + self._center_local[v][ids]
        desc["center_slots"] = center

        # ragged overlap indices offset into the packed context slots
        pad, m = self._overlap_padded(v, ids, ns_ctx, self.mn_c)
        desc["overlap_slots"] = pad
        desc["overlap_mask"] = m
        return desc

    def _desc_counts(self, d):
        return (int(d["gmask"].sum()),
                int(d["s_edge_mask"].sum()) + int(d["c_edge_mask"].sum()))

    def _iter_blocked(self):
        """Blocked-layout walk: each stream gets its own first-fit block
        assignment (streams are independent graphs — no cross-stream
        alignment beyond sharing the graph slot); a batch flushes when
        EITHER stream runs out of block capacity."""
        v = self._epoch % self.variants
        rng = np.random.default_rng((self.seed, self._epoch))
        self._epoch += 1
        n = len(self._sub[v])
        order = np.arange(n)
        if self.shuffle:
            rng.shuffle(order)

        ns8 = self._aux_s[v]["lens_n8"]
        es8 = self._aux_s[v]["lens_e8"]
        nc8 = self._aux_c[v]["lens_n8"]
        ec8 = self._aux_c[v]["lens_e8"]
        se = np.diff(self._sub[v].edge_off)
        ce = np.diff(self._ctx[v].edge_off)
        n_batches = n_graphs = n_edges = 0

        def new_state():
            return (np.zeros(self.nb_s, np.int64),
                    np.zeros(self.nb_s, np.int64),
                    np.zeros(self.nb_c, np.int64),
                    np.zeros(self.nb_c, np.int64))

        batch, pls = [], []
        fsn, fse, fcn, fce = new_state()

        def fit(fn, fe, bn, be, nn, ne):
            for b in range(len(fn)):
                if fn[b] + nn <= bn and fe[b] + ne <= be:
                    return b
            return -1

        def place(gi):
            bs = fit(fsn, fse, self.bn_s, self.be_s, ns8[gi], es8[gi])
            bc = fit(fcn, fce, self.bn_c, self.be_c, nc8[gi], ec8[gi])
            if bs < 0 or bc < 0:
                return False
            pls.append((
                bs * self.bn_s + fsn[bs], bs * self.be_s + fse[bs],
                bc * self.bn_c + fcn[bc], bc * self.be_c + fce[bc],
            ))
            fsn[bs] += ns8[gi]
            fse[bs] += es8[gi]
            fcn[bc] += nc8[gi]
            fce[bc] += ec8[gi]
            return True

        def flush():
            nonlocal n_batches, n_graphs, n_edges
            ids = np.asarray(batch, np.int64)
            p = np.asarray(pls, np.int64)
            n_batches += 1
            n_graphs += len(ids)
            n_edges += int(se[ids].sum() + ce[ids].sum())
            return v, ids, ((p[:, 0], p[:, 1]), (p[:, 2], p[:, 3]))

        for gi in order:
            if batch and not place(gi):
                yield flush()
                batch, pls = [], []
                fsn, fse, fcn, fce = new_state()
                if not place(gi):
                    raise ValueError("pair exceeds blocked buffers")
            elif not batch:
                if not place(gi):
                    raise ValueError("pair exceeds blocked buffers")
            batch.append(int(gi))
            if len(batch) == self.batch_size:
                yield flush()
                batch, pls = [], []
                fsn, fse, fcn, fce = new_state()
        if batch and not self.drop_last:
            yield flush()
        self.last_epoch_stats = {
            "batches": n_batches, "graphs": n_graphs, "edges": n_edges,
            "graphs_per_batch": n_graphs / max(n_batches, 1),
        }

    def __iter__(self):
        if self.blocked:
            for v, ids, placement in self._iter_blocked():
                yield self._descriptor(v, ids, placement)
        else:
            for v, ids in self._iter_ids():
                yield self._descriptor(v, ids)
