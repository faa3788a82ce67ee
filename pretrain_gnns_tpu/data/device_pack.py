"""Device-resident dataset + on-device batch materialization.

The classic input pipeline packs each batch on the host and ships ~0.5 MB
of features over PCIe/tunnel per batch — at TPU step times the transfer IS
the bottleneck (measured: 0.58 s H2D per 64-batch epoch vs 0.11 s of
device compute). TPU-native alternative: the WHOLE flat dataset lives in
HBM once (ZINC-2M ≈ 400 MB — trivial for a modern chip), and each step
receives only a tiny per-batch DESCRIPTOR (~60 KB: slot masks, segment
ids, and chunk gather plans). The packed batch is materialized inside the
jitted train step.

TPU gather shape matters: dynamic gathers of NARROW rows (2-4 ints) cost
roughly one row per cycle — ~90 K narrow gathers per batch measured ~3 ms,
dwarfing the 1.7 ms train step. So the resident arrays are stored in
8-row CHUNKS: every graph's node rows and edge rows are padded to a
multiple of 8, and node features / (edge features ++ local endpoints) of
8 consecutive rows are flattened into one 64-/128-byte chunk row. Batch
placement is 8-aligned, so a chunk never straddles graphs and
materialization is ~4 K wide-row gathers — microseconds.

The host's per-epoch work is the C++ epoch planner (greedy first-fit over
the shuffled order) + numpy descriptor assembly (np.repeat index builds,
and for masking the vectorized per-graph sampler) — fully overlapped by
the prefetch thread.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from pretrain_gnns_tpu.core.graphs import PackedGraphs
from pretrain_gnns_tpu.data.flat import FlatGraphs

CHUNK = 8


def _ceil8(a):
    return (a + CHUNK - 1) // CHUNK * CHUNK


def _scatter_runs(starts, lens):
    """positions of concatenated runs: for run i, lens[i] slots beginning
    at starts[i] (the np.repeat trick; no python loop)."""
    lens = np.asarray(lens, np.int64)
    tot = int(lens.sum())
    if not tot:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    within = np.arange(tot) - np.repeat(np.cumsum(lens) - lens, lens)
    return np.repeat(np.asarray(starts, np.int64), lens) + within, within


def build_device_flat(flat: FlatGraphs, as_numpy: bool = False):
    """Chunked resident arrays + host-side chunk offset tables.
    ``as_numpy`` skips the device upload (multi-variant loaders
    concatenate several resident trees host-side first).

    Returns (dev_tree, host_aux): dev_tree holds jnp arrays
      node8  [n_node_chunks, CHUNK*Fn] int32
      edge8  [n_edge_chunks, CHUNK*(Fe+2)] int32 (cols per row:
             edge_feat.. , send_local, recv_local)
      y      [G, T] (optional)
    host_aux holds numpy: node_chunk_off/edge_chunk_off [G] (first chunk
    row of each graph) and the 8-padded lengths."""
    import jax.numpy as jnp

    lens_n = np.diff(flat.node_off)
    lens_e = np.diff(flat.edge_off)

    def _as_int(a, what):
        """The chunk layout stores int32 rows. Integer features pass
        through; float features (bio: 0/1 indicator vectors) are stored
        as int32 and cast back at materialize time — anything genuinely
        fractional cannot ride the resident layout."""
        if np.issubdtype(a.dtype, np.integer):
            return a, None
        ai = a.astype(np.int32)
        if not np.array_equal(ai, a):
            raise ValueError(f"device dataset requires integral {what}")
        return ai, a.dtype
    node_feat, node_dtype = _as_int(flat.node_feat, "node features")
    edge_feat, edge_dtype = _as_int(flat.edge_feat, "edge features")
    fn = int(np.prod(node_feat.shape[1:], initial=1))
    fe = int(np.prod(edge_feat.shape[1:], initial=1))

    cn = _ceil8(lens_n) // CHUNK  # chunks per graph
    ce = _ceil8(lens_e) // CHUNK
    node_chunk_off = np.concatenate([[0], np.cumsum(cn)[:-1]])
    edge_chunk_off = np.concatenate([[0], np.cumsum(ce)[:-1]])

    node8 = np.zeros((int(cn.sum()) * CHUNK, fn), np.int32)
    pos, _ = _scatter_runs(node_chunk_off * CHUNK, lens_n)
    node8[pos] = node_feat.reshape(-1, fn)
    node8 = node8.reshape(-1, CHUNK * fn)

    edge8 = np.zeros((int(ce.sum()) * CHUNK, fe + 2), np.int32)
    epos, _ = _scatter_runs(edge_chunk_off * CHUNK, lens_e)
    edge8[epos, :fe] = edge_feat.reshape(-1, fe)
    edge8[epos, fe] = flat.send
    edge8[epos, fe + 1] = flat.recv
    edge8 = edge8.reshape(-1, CHUNK * (fe + 2))

    wrap = (lambda a: a) if as_numpy else jnp.asarray
    dev = {"node8": wrap(node8), "edge8": wrap(edge8)}
    if flat.y is not None:
        dev["y"] = wrap(flat.y)
    aux = {
        "node_chunk_off": node_chunk_off.astype(np.int64),
        "edge_chunk_off": edge_chunk_off.astype(np.int64),
        "lens_n8": _ceil8(lens_n).astype(np.int64),
        "lens_e8": _ceil8(lens_e).astype(np.int64),
        "fn": fn, "fe": fe,
        "node_dtype": node_dtype, "edge_dtype": edge_dtype,
    }
    return dev, aux


def materialize(
    dev: Dict[str, "np.ndarray"],
    desc: Dict[str, "np.ndarray"],
    max_nodes: int,
    max_edges: int,
    fn: int,
    fe: int,
    block_nodes: int = 0,
    block_edges: int = 0,
    with_y: bool = True,
    mask_atom_token: int = 119,
    mask_bond_token: int = 5,
    node_dtype=None,
    edge_dtype=None,
) -> PackedGraphs:
    """Jit-traceable: descriptor -> PackedGraphs. Pure wide-row gathers.
    ``node_dtype``/``edge_dtype`` restore float feature dtypes stored as
    int32 in the resident chunks (bio indicator features)."""
    import jax.numpy as jnp

    gid = desc["gid"]
    gmask = desc["gmask"]
    nvalid = desc["node_mask"]
    evalid = desc["edge_mask"]
    ngraph = desc["node_graph"]

    node_feat = jnp.take(
        dev["node8"], desc["node_chunk_rows"], axis=0
    ).reshape(max_nodes, fn)
    node_feat = jnp.where(nvalid[:, None], node_feat, 0)
    if node_dtype is not None:
        node_feat = node_feat.astype(node_dtype)

    epack = jnp.take(
        dev["edge8"], desc["edge_chunk_rows"], axis=0
    ).reshape(max_edges, fe + 2)
    edge_feat = jnp.where(evalid[:, None], epack[:, :fe], 0)
    if edge_dtype is not None:
        edge_feat = edge_feat.astype(edge_dtype)
    nbase = jnp.repeat(
        desc["edge_chunk_nbase"], CHUNK, total_repeat_length=max_edges
    )
    senders = jnp.where(evalid, nbase + epack[:, fe], 0).astype(jnp.int32)
    receivers = jnp.where(
        evalid, nbase + epack[:, fe + 1], 0
    ).astype(jnp.int32)

    y = None
    if with_y and "y" in dev:
        y = jnp.take(dev["y"], gid, axis=0) * gmask[:, None].astype(
            dev["y"].dtype
        )

    extras = {}
    if "center_node_idx" in desc:
        # bio center-node slot (padding graphs -> row 0; masked by the
        # loss via graph_mask)
        extras["center_node_idx"] = desc["center_node_idx"]
    if "negative_edges" in desc:
        extras["negative_edges"] = desc["negative_edges"]
        extras["negative_edges_mask"] = desc["negative_edges_mask"]
    if "negative_edges_blocked" in desc:
        extras["negative_edges_blocked"] = desc["negative_edges_blocked"]
        extras["negative_edges_blocked_mask"] = \
            desc["negative_edges_blocked_mask"]
    if "masked_edge_idx" in desc:
        # bio edge masking (bio/util.py:46-104): labels from the CLEAN
        # materialized features, then BOTH directions overwritten with
        # the mask indicator [0,...,0,1]
        eidx = desc["masked_edge_idx"]
        em = desc["masked_edge_idx_mask"]
        extras["masked_edge_idx"] = eidx
        extras["masked_edge_idx_mask"] = em
        extras["mask_edge_label"] = jnp.where(
            em[:, None], jnp.take(edge_feat, eidx, axis=0), 0
        )
        extras["mask_edge_label_mask"] = em
        mask_feat = jnp.zeros((fe,), edge_feat.dtype).at[-1].set(1)
        mb = desc["masked_edge_bool"] & evalid
        edge_feat = jnp.where(mb[:, None], mask_feat, edge_feat)
    if "masked_bool" in desc:
        # chem attribute masking: labels gathered from the CLEAN
        # materialized features, then tokens written via where
        masked = desc["masked_bool"] & nvalid
        slots = desc["masked_slots"]
        smask = desc["masked_slots_mask"]
        extras["masked_atom_indices"] = slots
        extras["masked_atom_indices_mask"] = smask
        extras["mask_node_label"] = jnp.where(
            smask[:, None], jnp.take(node_feat, slots, axis=0), 0
        )
        extras["mask_node_label_mask"] = smask
        token = jnp.array([mask_atom_token, 0], node_feat.dtype)
        node_feat = jnp.where(masked[:, None], token, node_feat)
        if "connected_edge_indices" in desc:
            conn = desc["connected_edge_indices"]
            cmask = desc["connected_edge_indices_mask"]
            extras["connected_edge_indices"] = conn
            extras["connected_edge_indices_mask"] = cmask
            extras["mask_edge_label"] = jnp.where(
                cmask[:, None], jnp.take(edge_feat, conn, axis=0), 0
            )
            extras["mask_edge_label_mask"] = cmask
            edge_masked = (
                jnp.take(masked, senders) | jnp.take(masked, receivers)
            ) & evalid
            etoken = jnp.array([mask_bond_token, 0], edge_feat.dtype)
            edge_feat = jnp.where(edge_masked[:, None], etoken, edge_feat)

    return PackedGraphs(
        node_feat=node_feat,
        edge_feat=edge_feat,
        senders=senders,
        receivers=receivers,
        node_graph=ngraph,
        node_mask=nvalid,
        edge_mask=evalid,
        graph_mask=gmask,
        y=y,
        extras=extras,
        block_nodes=block_nodes,
        block_edges=block_edges,
    )


def stream_descriptor(
    aux: Dict[str, np.ndarray],
    lens_n: np.ndarray,
    lens_e: np.ndarray,
    ids: np.ndarray,
    nstarts: np.ndarray,
    estarts: np.ndarray,
    max_nodes: int,
    max_edges: int,
    G: int,
    chunk_base_n: int = 0,
    chunk_base_e: int = 0,
) -> Dict[str, np.ndarray]:
    """Core :func:`materialize` descriptor for ONE resident stream:
    slot-space masks/segment-ids plus the chunk gather plan. Module-level
    so multi-stream loaders (context pairs) reuse it; ``chunk_base_*``
    offsets the gather rows into a concatenated multi-variant resident
    array."""
    k = len(ids)
    gid = np.zeros(G, np.int32)
    gid[:k] = ids
    gmask = np.zeros(G, bool)
    gmask[:k] = True

    # slot-space ids/masks (REAL lengths at chunk-aligned starts)
    node_graph = np.zeros(max_nodes, np.int32)
    node_mask = np.zeros(max_nodes, bool)
    pos, _ = _scatter_runs(nstarts, lens_n)
    node_graph[pos] = np.repeat(np.arange(k, dtype=np.int32), lens_n)
    node_mask[pos] = True
    edge_mask = np.zeros(max_edges, bool)
    epos, _ = _scatter_runs(estarts, lens_e)
    edge_mask[epos] = True

    # chunk gather plans (padding chunks gather row 0, masked out)
    cn = aux["lens_n8"][ids] // CHUNK
    ce = aux["lens_e8"][ids] // CHUNK
    node_chunk_rows = np.zeros(max_nodes // CHUNK, np.int32)
    cpos, cwithin = _scatter_runs(
        np.asarray(nstarts, np.int64) // CHUNK, cn
    )
    node_chunk_rows[cpos] = (
        np.repeat(aux["node_chunk_off"][ids] + chunk_base_n, cn) + cwithin
    )
    edge_chunk_rows = np.zeros(max_edges // CHUNK, np.int32)
    edge_chunk_nbase = np.zeros(max_edges // CHUNK, np.int32)
    cepos, cewithin = _scatter_runs(
        np.asarray(estarts, np.int64) // CHUNK, ce
    )
    edge_chunk_rows[cepos] = (
        np.repeat(aux["edge_chunk_off"][ids] + chunk_base_e, ce) + cewithin
    )
    edge_chunk_nbase[cepos] = np.repeat(
        np.asarray(nstarts, np.int64), ce
    )
    return {
        "gid": gid, "gmask": gmask,
        "node_graph": node_graph, "node_mask": node_mask,
        "edge_mask": edge_mask,
        "node_chunk_rows": node_chunk_rows,
        "edge_chunk_rows": edge_chunk_rows,
        "edge_chunk_nbase": edge_chunk_nbase,
    }


class EpochStackMixin:
    """Shared whole-epoch descriptor stacking for device-resident loaders
    (the epoch-resident trainer's input). Requires iteration yielding
    descriptor dicts, ``last_epoch_stats``, and ``_desc_counts``."""

    def _desc_counts(self, d) -> Tuple[int, int]:
        if "_stub" in d:  # non-local column in a multi-process run
            return d["_stub"]
        return int(d["gmask"].sum()), int(d["edge_mask"].sum())

    def epoch_stack(
        self, steps_cap: int = 0, n_dev: int = 1
    ) -> Optional[Dict[str, object]]:
        """One epoch's descriptors stacked into ``[steps, ...]`` (or
        ``[steps, n_dev, ...]`` for data parallelism) numpy arrays, ready
        for a single H2D transfer + one ``lax.scan`` dispatch.

        ``steps_cap`` fixes the static scan length across epochs (the
        first-fit planner's batch count can drift by ±1-2 with the
        shuffle): short epochs are padded with a replay of the first
        descriptor and masked via ``valid``; long epochs return the
        surplus in ``overflow`` (same per-step shapes, for single-step
        dispatch). Returns None when the epoch yields no full group.
        """
        descs = list(self)
        stats = dict(self.last_epoch_stats)
        if n_dev > 1:
            usable = len(descs) // n_dev * n_dev
            if usable < len(descs):
                for d in descs[usable:]:
                    g, e = self._desc_counts(d)
                    stats["graphs"] -= g
                    stats["edges"] -= e
                    stats["batches"] -= 1
                descs = descs[:usable]
        if not descs:
            return None
        steps = len(descs) // max(n_dev, 1)
        if steps_cap <= 0:
            steps_cap = steps

        def group(ds: List[Dict[str, np.ndarray]]):
            """len(ds) == n_dev -> one scan element. In a multi-process
            run (``shard_cols`` set on the loader) non-local columns are
            stubs: the element keeps only this process's columns and the
            run loop assembles the global array
            (parallel.multihost.put_col_sharded)."""
            ds = [d for d in ds if "_stub" not in d]
            if not ds:
                raise ValueError("process owns no columns in this group")
            if n_dev <= 1 and len(ds) == 1:
                return ds[0]
            return {
                k: np.stack([d[k] for d in ds]) for k in ds[0]
            }

        elems = [
            group(descs[i * max(n_dev, 1):(i + 1) * max(n_dev, 1)])
            for i in range(steps)
        ]
        overflow = elems[steps_cap:]
        elems = elems[:steps_cap]
        n_real = len(elems)
        valid = np.zeros(steps_cap, bool)
        valid[:n_real] = True
        if n_real < steps_cap:
            elems = elems + [elems[0]] * (steps_cap - n_real)
        stacked = {
            k: np.stack([e[k] for e in elems]) for k in elems[0]
        }
        stats["graphs_per_batch"] = stats["graphs"] / max(
            stats["batches"], 1
        )
        self.last_epoch_stats = stats
        return {
            "stacked": stacked, "valid": valid, "n_steps": n_real,
            "overflow": overflow, "stats": stats,
        }


class DeviceBatchLoader(EpochStackMixin):
    """Iterator yielding per-batch DESCRIPTORS (small numpy pytrees) for
    :func:`materialize`. Same iteration semantics as FlatLoader (seeded
    epoch shuffle, greedy first-fit, drop_last, last_epoch_stats), except
    that graph placements are CHUNK-aligned (capacity accounting uses the
    8-padded sizes).

    ``mask_spec`` = dict(rate, mask_edge, node_budget, edge_budget,
    atom_token, bond_token) enables the masking descriptor fields
    (sampling runs vectorized on host, labels are gathered on device).
    ``neg_spec`` = dict(budget) enables edgepred's negative-edge fields:
    per-batch vectorized rejection sampling in flat-local space (existing
    -edge membership via searchsorted over the batch's edge keys), slot
    pairs shipped in the descriptor. ``center_spec`` ships the bio
    center-node slot per graph (the GraphPred head's concat input).
    """

    def __init__(
        self,
        flat: FlatGraphs,
        batch_size: int,
        max_nodes: int = 0,
        max_edges: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        blocks: Optional[Tuple[int, int, int]] = None,
        mask_spec: Optional[dict] = None,
        neg_spec: Optional[dict] = None,
        bio_mask_spec: Optional[dict] = None,
        center_spec: bool = False,
    ):
        self.flat = flat
        self.dev, self._aux = build_device_flat(flat)
        self.bio_mask_spec = bio_mask_spec
        self._center_local = None
        if center_spec:
            self._center_local = np.asarray(
                flat.extras["center_node_idx"][0]
            ).reshape(len(flat)).astype(np.int64)
        self.batch_size = batch_size
        self.blocks = blocks
        if blocks is not None:
            n_blocks, bn, be = blocks
            if bn % CHUNK or be % CHUNK:
                raise ValueError("block sizes must be chunk multiples")
            max_nodes, max_edges = n_blocks * bn, n_blocks * be
        else:
            max_nodes = _ceil8(max_nodes)
            max_edges = _ceil8(max_edges)
        self.max_nodes, self.max_edges = max_nodes, max_edges
        self.shuffle, self.seed, self.drop_last = shuffle, seed, drop_last
        self.mask_spec = mask_spec
        self.neg_spec = neg_spec
        if neg_spec is not None:
            # contiguous views for the C++ sampler (once, not per batch)
            self._send32 = np.ascontiguousarray(flat.send, np.int32)
            self._recv32 = np.ascontiguousarray(flat.recv, np.int32)
            self._eoff64 = np.ascontiguousarray(flat.edge_off, np.int64)
        # multi-process input sharding (parallel.multihost): when set to
        # (n_dev_global, lo, hi), descriptor assembly runs ONLY for
        # batches whose epoch-stack column (batch_index % n_dev) lands on
        # this process's devices; other columns yield count-only stubs
        self.shard_cols: Optional[Tuple[int, int, int]] = None
        self._epoch = 0
        self.last_epoch_stats: Dict[str, float] = {}
        self._lens_n = np.diff(flat.node_off).astype(np.int64)
        self._lens_e = np.diff(flat.edge_off).astype(np.int64)

    def __len__(self) -> int:
        n = len(self.flat)
        return n // self.batch_size if self.drop_last else math.ceil(
            n / self.batch_size
        )

    # the jitted side --------------------------------------------------
    def prepare_pure(self, dev, desc) -> PackedGraphs:
        """Materialize with EXPLICIT resident arrays; the step factories
        pass ``loader.dev`` as a jit argument (a closure capture would bake
        the dataset into the executable as constants)."""
        bn, be = (self.blocks[1], self.blocks[2]) if self.blocks else (0, 0)
        ms = self.mask_spec or {}
        return materialize(
            dev, desc, self.max_nodes, self.max_edges,
            fn=self._aux["fn"], fe=self._aux["fe"],
            block_nodes=bn, block_edges=be,
            mask_atom_token=ms.get("atom_token", 119),
            mask_bond_token=ms.get("bond_token", 5),
            node_dtype=self._aux["node_dtype"],
            edge_dtype=self._aux["edge_dtype"],
        )

    def prepare(self, desc) -> PackedGraphs:
        """Eager convenience (tests): binds the resident arrays."""
        return self.prepare_pure(self.dev, desc)

    # host-side placement ---------------------------------------------
    def _descriptor(self, ids: np.ndarray, nstarts: np.ndarray,
                    estarts: np.ndarray,
                    rng: np.random.Generator) -> Dict[str, np.ndarray]:
        G = self.batch_size
        k = len(ids)
        lens_n = self._lens_n[ids]
        lens_e = self._lens_e[ids]
        desc = stream_descriptor(
            self._aux, lens_n, lens_e, ids, nstarts, estarts,
            self.max_nodes, self.max_edges, G,
        )
        nstart = np.full(G, self.max_nodes, np.int64)
        estart = np.full(G, self.max_edges, np.int64)
        nstart[:k] = nstarts
        estart[:k] = estarts
        if self.mask_spec is not None:
            self._add_masking(desc, desc["gid"], desc["gmask"], lens_e,
                              nstart, estart, rng)
        if self.neg_spec is not None:
            self._add_negatives(desc, ids, nstart[:k], estart[:k], rng)
        if self.bio_mask_spec is not None:
            self._add_bio_masking(desc, ids, estart[:k], rng)
        if self._center_local is not None:
            center = np.zeros(G, np.int32)
            center[:k] = nstart[:k] + self._center_local[ids]
            desc["center_node_idx"] = center
        return desc

    def _add_bio_masking(self, desc, ids, estarts, rng):
        """bio MaskEdge (bio/util.py:46-104) in flat-local bond space:
        per graph sample int(E_undirected * rate) + 1 distinct bonds;
        ship the even-slot representatives + a both-directions bool; the
        labels/feature overwrite happen on device from the CLEAN
        materialized features."""
        from pretrain_gnns_tpu.data.batch_transforms import (
            sample_per_group_np,
        )

        ms = self.bio_mask_spec
        k = len(ids)
        nbonds = self._lens_e[ids] // 2
        tot = int(nbonds.sum())
        gid_b = np.repeat(np.arange(k), nbonds)
        sel = sample_per_group_np(
            rng, gid_b, np.ones(tot, bool), k, ms["rate"]
        )
        within = np.arange(tot) - np.repeat(
            np.cumsum(nbonds) - nbonds, nbonds
        )
        slots = (
            np.repeat(estarts, nbonds) + 2 * within
        )[sel].astype(np.int32)
        budget = ms["budget"]
        if len(slots) > budget:
            raise ValueError(f"{len(slots)} masked bonds > {budget}")
        pad = np.zeros(budget, np.int32)
        pad[: len(slots)] = slots
        m = np.zeros(budget, bool)
        m[: len(slots)] = True
        mb = np.zeros(self.max_edges, bool)
        mb[slots] = True
        mb[slots + 1] = True
        desc["masked_edge_idx"] = pad
        desc["masked_edge_idx_mask"] = m
        desc["masked_edge_bool"] = mb

    def _add_negatives(self, desc, ids, nstarts, estarts, rng):
        """NegativeEdge (chem/util.py:22-52) in flat-local space: per
        graph draw 5E uniform pairs, keep the first E//2 that are not
        self-loops / existing directed edges / earlier picks. Default
        path is the C++ sampler (native/packer.cpp::sample_negatives,
        ~100 us/batch vs 2.5 ms for the vectorized numpy fallback — the
        numpy sampler was the edgepred pipeline's host gate)."""
        import ctypes

        from pretrain_gnns_tpu.native import load as load_native

        budget = self.neg_spec["budget"]
        lib = load_native()
        as_c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        if (self.blocks is not None and lib is not None
                and hasattr(lib, "sample_negatives_blocked")):
            # block-aligned layout: block_edges//2 slots per block, so
            # the edgepred scoring head rides the Pallas edge_dot kernel
            n_blocks, _, be = self.blocks
            half = be // 2
            pairs = np.zeros((n_blocks * half, 2), np.int32)
            m = np.zeros(n_blocks * half, np.uint8)
            r = lib.sample_negatives_blocked(
                as_c(self._send32), as_c(self._recv32),
                as_c(self._eoff64),
                as_c(np.ascontiguousarray(ids, np.int64)),
                ctypes.c_int64(len(ids)),
                as_c(np.ascontiguousarray(self._lens_n[ids], np.int64)),
                as_c(np.ascontiguousarray(nstarts, np.int64)),
                as_c(np.ascontiguousarray(estarts, np.int64)),
                ctypes.c_int64(be), ctypes.c_int64(n_blocks),
                ctypes.c_uint64(int(rng.integers(np.uint64(2**63)))),
                as_c(pairs), as_c(m),
            )
            if r < 0:
                raise ValueError("blocked negative sampling overflow")
            desc["negative_edges_blocked"] = pairs
            desc["negative_edges_blocked_mask"] = m.astype(bool)
            return
        if lib is not None and hasattr(lib, "sample_negatives"):
            k = len(ids)
            pairs = np.zeros((budget, 2), np.int32)
            m = np.zeros(budget, np.uint8)
            ids64 = np.ascontiguousarray(ids, np.int64)
            lens_n = np.ascontiguousarray(self._lens_n[ids], np.int64)
            nst = np.ascontiguousarray(nstarts, np.int64)
            r = lib.sample_negatives(
                as_c(self._send32), as_c(self._recv32),
                as_c(self._eoff64), as_c(ids64),
                ctypes.c_int64(k), as_c(lens_n), as_c(nst),
                ctypes.c_uint64(int(rng.integers(np.uint64(2**63)))),
                ctypes.c_int64(budget), as_c(pairs), as_c(m),
            )
            if r < 0:
                raise ValueError(f"negative edges > budget {budget}")
            desc["negative_edges"] = pairs
            desc["negative_edges_mask"] = m.astype(bool)
            return
        from pretrain_gnns_tpu.data.batch_transforms import (
            negative_candidates_np, select_negatives_np,
        )

        flat = self.flat
        k = len(ids)
        lens_n = self._lens_n[ids]
        lens_e = self._lens_e[ids]
        gi, a, b, cand_per = negative_candidates_np(rng, lens_n, lens_e)

        etot = int(lens_e.sum())
        within = np.arange(etot) - np.repeat(
            np.cumsum(lens_e) - lens_e, lens_e
        )
        erow = np.repeat(flat.edge_off[ids], lens_e) + within
        eg = np.repeat(np.arange(k), lens_e)
        M = int(lens_n.max(initial=1))
        keys_exist = (
            eg * (M * M) + flat.recv[erow].astype(np.int64) * M
            + flat.send[erow]
        )
        take = select_negatives_np(
            gi * (M * M) + a * M + b, keys_exist, k * M * M, a == b,
            cand_per, lens_e // 2, gi,
        )

        gt = gi[take]
        pairs = np.stack(
            [nstarts[gt] + a[take], nstarts[gt] + b[take]], axis=1
        ).astype(np.int32)
        budget = self.neg_spec["budget"]
        if len(pairs) > budget:
            raise ValueError(
                f"{len(pairs)} negative edges > budget {budget}"
            )
        pad = np.zeros((budget, 2), np.int32)
        pad[: len(pairs)] = pairs
        m = np.zeros(budget, bool)
        m[: len(pairs)] = True
        desc["negative_edges"] = pad
        desc["negative_edges_mask"] = m

    def _add_masking(self, desc, gid, gmask, lens_e, nstart, estart, rng):
        from pretrain_gnns_tpu.data.batch_transforms import (
            sample_masked_nodes_np,
        )

        ms = self.mask_spec
        G = len(gid)
        k = int(gmask.sum())
        masked = sample_masked_nodes_np(
            rng, desc["node_graph"], desc["node_mask"], G, ms["rate"]
        )
        slots = np.nonzero(masked)[0].astype(np.int32)
        nb = ms["node_budget"]
        if len(slots) > nb:
            raise ValueError(f"{len(slots)} masked nodes > budget {nb}")
        pad = np.zeros(nb, np.int32)
        pad[: len(slots)] = slots
        m = np.zeros(nb, bool)
        m[: len(slots)] = True
        desc["masked_bool"] = masked
        desc["masked_slots"] = pad
        desc["masked_slots_mask"] = m
        if ms.get("mask_edge"):
            # per-bond (even-slot) representatives whose endpoints hit the
            # masked set — slot endpoints reconstructed from the flat
            # local arrays with the np.repeat trick
            le = lens_e[:k].astype(np.int64)
            etot = int(le.sum())
            if etot:
                within_e = np.arange(etot) - np.repeat(
                    np.cumsum(le) - le, le
                )
                erow = np.repeat(
                    self.flat.edge_off[gid[:k]], le
                ) + within_e
                nbase = np.repeat(nstart[:k], le)
                snd = self.flat.send[erow] + nbase
                rcv = self.flat.recv[erow] + nbase
                em = masked[snd] | masked[rcv]
                eslot = np.repeat(estart[:k], le) + within_e
                conn = eslot[(within_e % 2 == 0) & em].astype(np.int32)
            else:
                conn = np.zeros(0, np.int32)
            eb = ms["edge_budget"]
            if len(conn) > eb:
                raise ValueError(f"{len(conn)} masked bonds > budget {eb}")
            cpad = np.zeros(eb, np.int32)
            cpad[: len(conn)] = conn
            cm = np.zeros(eb, bool)
            cm[: len(conn)] = True
            desc["connected_edge_indices"] = cpad
            desc["connected_edge_indices_mask"] = cm

    def _plan(self, order: np.ndarray):
        """Greedy first-fit partition of the whole (shuffled) epoch into
        batches + chunk-aligned slot placements — one C++ pass (python
        fallback). Capacity accounting uses the 8-padded sizes."""
        import ctypes

        from pretrain_gnns_tpu.native import load as load_native

        lens_n8 = self._aux["lens_n8"]
        lens_e8 = self._aux["lens_e8"]
        n = len(order)
        if self.blocks is None:
            nb, bn, be = 1, self.max_nodes, self.max_edges
        else:
            nb, bn, be = self.blocks
        out_batch = np.empty(n, np.int32)
        out_ns = np.empty(n, np.int32)
        out_es = np.empty(n, np.int32)
        order64 = np.ascontiguousarray(order, np.int64)
        lib = load_native()
        if lib is not None:
            as_c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
            r = lib.plan_epoch(
                as_c(lens_n8), as_c(lens_e8), as_c(order64),
                ctypes.c_int64(n), ctypes.c_int64(self.batch_size),
                ctypes.c_int64(nb), ctypes.c_int64(bn), ctypes.c_int64(be),
                as_c(out_batch), as_c(out_ns), as_c(out_es),
            )
            if r < 0:
                raise ValueError("graph exceeds batch buffers")
            return int(r), out_batch, out_ns, out_es
        # python fallback: same greedy walk
        fill_n = np.zeros(nb, np.int64)
        fill_e = np.zeros(nb, np.int64)
        batch = in_batch = 0
        for i, g in enumerate(order64):
            nn, ne = int(lens_n8[g]), int(lens_e8[g])
            placed = -1
            for b in range(nb):
                if fill_n[b] + nn <= bn and fill_e[b] + ne <= be:
                    placed = b
                    break
            if placed < 0:
                if in_batch == 0 or nn > bn or ne > be:
                    raise ValueError("graph exceeds batch buffers")
                batch += 1
                in_batch = 0
                fill_n[:] = 0
                fill_e[:] = 0
                placed = 0
            out_batch[i] = batch
            out_ns[i] = placed * bn + fill_n[placed]
            out_es[i] = placed * be + fill_e[placed]
            fill_n[placed] += nn
            fill_e[placed] += ne
            in_batch += 1
            if in_batch == self.batch_size:
                batch += 1
                in_batch = 0
                fill_n[:] = 0
                fill_e[:] = 0
        return batch + (1 if in_batch else 0), out_batch, out_ns, out_es

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.flat))
        ep = self._epoch
        rng = np.random.default_rng((self.seed, ep))
        if self.shuffle:
            rng.shuffle(order)
        self._epoch += 1

        n_total, bid, ns, es = self._plan(order)
        bounds = np.searchsorted(bid, np.arange(n_total + 1))
        limit = n_total
        if (self.drop_last and n_total
                and bounds[n_total] - bounds[n_total - 1]
                < self.batch_size):
            limit -= 1  # trailing partial batch

        n_batches = n_graphs = n_edges = 0
        for b in range(limit):
            sl = slice(bounds[b], bounds[b + 1])
            ids = order[sl]
            n_batches += 1
            n_graphs += len(ids)
            ne = int(self._lens_e[ids].sum())
            n_edges += ne
            if self.shard_cols is not None:
                nd, lo, hi = self.shard_cols
                if not (lo <= b % nd < hi):
                    # another process's column: counts only (global epoch
                    # stats stay exact; no descriptor work done here)
                    yield {"_stub": (len(ids), ne)}
                    continue
            # per-batch keyed rng: draws depend only on
            # (seed, epoch, batch_index), so any subset of batches can be
            # assembled independently (multi-process input sharding) with
            # draws identical to the single-process run
            brng = np.random.default_rng((self.seed, ep, b))
            yield self._descriptor(ids, ns[sl], es[sl], brng)
        self.last_epoch_stats = {
            "batches": n_batches, "graphs": n_graphs, "edges": n_edges,
            "graphs_per_batch": n_graphs / max(n_batches, 1),
        }
