"""Microbenchmark the blocked SpMM kernel variants in isolation.

Times forward and forward+backward of blocked_spmm_fused on the bench
workload shapes, to separate kernel efficiency from the rest of the step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from pretrain_gnns_tpu.core import graphs as G
from pretrain_gnns_tpu.data.synthetic import molecule_dataset
from pretrain_gnns_tpu.data.packing import block_layout, PackedLoader
from pretrain_gnns_tpu.ops import pallas_spmm

BN = int(os.environ.get("BN", 128))
BE = int(os.environ.get("BE", 384))
ITERS = 200


def main():
    graphs, _ = molecule_dataset(256, num_tasks=1, seed=0, mean_atoms=23)
    blocks = block_layout(graphs, 256, block_nodes=BN, block_edges=BE)
    p = next(iter(PackedLoader(graphs, 256, shuffle=False, drop_last=True,
                               blocks=blocks)))
    N = p.node_feat.shape[0]
    E = p.senders.shape[0]
    F = 300
    print(f"N={N} E={E} blocks={N // BN} valid_edges={int(p.edge_mask.sum())}")
    rng = np.random.default_rng(0)
    x = jnp.array(rng.normal(size=(N, F)).astype(np.float32))
    ein = jnp.array(rng.normal(size=(E, 9)).astype(np.float32))
    W = jnp.array(rng.normal(size=(9, F)).astype(np.float32))
    w = jnp.array(p.edge_mask.astype(np.float32))
    snd = jnp.array(p.senders)
    rcv = jnp.array(p.receivers)

    def one_fwd(x):
        return pallas_spmm.blocked_spmm_fused(
            x, ein, W, snd, rcv, w, BN, BE, jnp.bfloat16, False, True)

    def one_fwdbwd(x):
        def f(x, W):
            return jnp.sum(
                pallas_spmm.blocked_spmm_fused(
                    x, ein, W, snd, rcv, w, BN, BE, jnp.bfloat16, False,
                    True) ** 2)
        gx, gW = jax.grad(f, argnums=(0, 1))(x, W)
        return gx

    def chain(fn):
        # ITERS dependent calls inside ONE dispatch (tunnel latency is ~ms)
        @jax.jit
        def run(x):
            def body(h, _):
                return fn(h) * 1e-3 + x * 1e-3, ()
            h, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(h)
        return run

    for name, fn in [("fwd", one_fwd), ("fwd+bwd", one_fwdbwd)]:
        run = chain(fn)
        _ = float(run(x))
        t0 = time.perf_counter()
        final = float(run(x))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(final)
        nb = N // BN
        mm = 2 * BE * BN * F * nb
        nmat = 2 if name == "fwd" else 5
        print(f"{name:8s} {dt * 1e6:8.1f} us  "
              f"{nmat * mm / dt / 1e12:6.1f} TFLOP/s eff  "
              f"{int(p.edge_mask.sum()) / dt / 1e6:8.1f} Medges/s")

    # --- receiver-sorted segment-sum scatter experiment (VERDICT r3 #6) --
    from pretrain_gnns_tpu.ops import pallas_spmm_sorted as sortmod

    ee = jnp.array(rng.normal(size=(E, F)).astype(np.float32))
    s2, r2, w2, ee2 = jax.jit(
        lambda: sortmod.sort_block_edges(snd, rcv, w, ee, N // BN, BE)
    )()

    def onehot_fwd(x):
        return pallas_spmm.blocked_spmm(
            x, ee, snd, rcv, w, BN, BE, jnp.bfloat16, False)

    def sorted_fwd(x):
        return sortmod.sorted_blocked_spmm(
            x, ee2, s2, r2, w2, BN, BE, jnp.bfloat16, False)

    def sorted_fwd_with_sort(x):
        ss, rr, ww, eee = sortmod.sort_block_edges(
            snd, rcv, w, ee, N // BN, BE)
        return sortmod.sorted_blocked_spmm(
            x, eee, ss, rr, ww, BN, BE, jnp.bfloat16, False)

    for name, fn in [("onehot scatter fwd", onehot_fwd),
                     ("sorted-segsum  fwd", sorted_fwd),
                     ("sorted + sort  fwd", sorted_fwd_with_sort)]:
        run = chain(fn)
        _ = float(run(x))
        t0 = time.perf_counter()
        final = float(run(x))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(final)
        print(f"{name} {dt * 1e6:8.1f} us  "
              f"{int(p.edge_mask.sum()) / dt / 1e6:8.1f} Medges/s")

    # --- fused GAT attention (SDDMM + segment softmax + aggregation) ----
    from pretrain_gnns_tpu.ops import attention

    H, D = 2, F
    xh = jnp.array(rng.normal(size=(N, H, D)).astype(np.float32))
    eh = jnp.array(rng.normal(size=(E, H, D)).astype(np.float32) * 0.3)
    esh = jnp.array(rng.normal(size=(H, D)).astype(np.float32) * 0.3)
    aih = jnp.array(rng.normal(size=(1, H, D)).astype(np.float32) * 0.2)
    ajh = jnp.array(rng.normal(size=(1, H, D)).astype(np.float32) * 0.2)
    em = jnp.array(p.edge_mask)

    def bwd_mode(mode):
        os.environ["PGT_GAT_BWD"] = mode

        def gat_fwdbwd(xx):
            def f(xx):
                out = attention._gat_blocked(
                    xx, eh, esh, aih, ajh, snd, rcv, em, N, 0.2, BN, BE,
                    jnp.float32, False,
                )
                return jnp.sum(out ** 2)

            return jax.grad(f)(xx)

        @jax.jit
        def run(xx):
            def body(hh, _):
                return hh * 0.999 + gat_fwdbwd(hh) * 1e-4, ()

            hh, _ = jax.lax.scan(body, xx, None, length=ITERS)
            return jnp.sum(hh)

        _ = float(run(xh))
        t0 = time.perf_counter()
        final = float(run(xh))
        dt = (time.perf_counter() - t0) / ITERS
        assert np.isfinite(final)
        print(f"gat fwd+bwd [{mode:6s}] {dt * 1e6:8.1f} us  "
              f"{int(p.edge_mask.sum()) / dt / 1e6:8.1f} Medges/s")

    for mode in ("pallas", "xla"):
        bwd_mode(mode)
    os.environ.pop("PGT_GAT_BWD", None)


if __name__ == "__main__":
    main()
