"""Masked segment ops vs brute-force numpy references."""

import numpy as np
import jax.numpy as jnp

from pretrain_gnns_tpu.ops import segment as seg
from pretrain_gnns_tpu.ops import spmm


def _setup(rng):
    E, N, F = 50, 10, 4
    data = rng.normal(size=(E, F)).astype(np.float32)
    ids = rng.integers(0, N, size=E).astype(np.int32)
    mask = rng.random(E) < 0.7
    return data, ids, mask, N


def test_segment_sum_mean_max(rng):
    data, ids, mask, N = _setup(rng)
    s = np.asarray(seg.segment_sum(jnp.array(data), jnp.array(ids), N,
                                   jnp.array(mask)))
    m = np.asarray(seg.segment_mean(jnp.array(data), jnp.array(ids), N,
                                    jnp.array(mask)))
    mx = np.asarray(seg.segment_max(jnp.array(data), jnp.array(ids), N,
                                    jnp.array(mask), empty_value=0.0))
    for i in range(N):
        sel = data[(ids == i) & mask]
        np.testing.assert_allclose(s[i], sel.sum(0) if len(sel) else 0,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(m[i], sel.mean(0) if len(sel) else 0,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(mx[i], sel.max(0) if len(sel) else 0,
                                   rtol=1e-5, atol=1e-6)


def test_segment_softmax(rng):
    data, ids, mask, N = _setup(rng)
    p = np.asarray(seg.segment_softmax(jnp.array(data), jnp.array(ids), N,
                                       jnp.array(mask)))
    # masked rows get ~0 probability; per-segment valid rows sum to 1
    assert np.all(np.abs(p[~mask]) < 1e-8)
    for i in range(N):
        sel = (ids == i) & mask
        if sel.any():
            np.testing.assert_allclose(p[sel].sum(0), 1.0, rtol=1e-5)


def test_segment_softmax_with_extra_logit(rng):
    """The analytic self-loop logit must behave like one more row."""
    E, N = 30, 6
    logits = rng.normal(size=(E,)).astype(np.float32)
    ids = rng.integers(0, N, size=E).astype(np.int32)
    mask = np.ones(E, bool)
    extra = rng.normal(size=(N,)).astype(np.float32)
    p_rows, p_extra = seg.segment_softmax(
        jnp.array(logits), jnp.array(ids), N, jnp.array(mask),
        extra_logit=jnp.array(extra),
    )
    p_rows, p_extra = np.asarray(p_rows), np.asarray(p_extra)
    for i in range(N):
        sel = ids == i
        all_logits = np.concatenate([logits[sel], [extra[i]]])
        ref = np.exp(all_logits - all_logits.max())
        ref = ref / ref.sum()
        np.testing.assert_allclose(p_rows[sel], ref[:-1], rtol=1e-5)
        np.testing.assert_allclose(p_extra[i], ref[-1], rtol=1e-5)


def test_gather_scatter_matches_manual(rng):
    N, E, F = 7, 20, 5
    x = rng.normal(size=(N, F)).astype(np.float32)
    e = rng.normal(size=(E, F)).astype(np.float32)
    snd = rng.integers(0, N, size=E).astype(np.int32)
    rcv = rng.integers(0, N, size=E).astype(np.int32)
    mask = rng.random(E) < 0.8
    w = rng.normal(size=E).astype(np.float32)

    out = np.asarray(spmm.gather_scatter(
        jnp.array(x), jnp.array(e), jnp.array(snd), jnp.array(rcv),
        jnp.array(mask), N, combine="add", aggr="sum",
        edge_weight=jnp.array(w)))
    ref = np.zeros((N, F), np.float32)
    for k in range(E):
        if mask[k]:
            ref[rcv[k]] += w[k] * (x[snd[k]] + e[k])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    out_c = np.asarray(spmm.gather_scatter(
        jnp.array(x), jnp.array(e), jnp.array(snd), jnp.array(rcv),
        jnp.array(mask), N, combine="concat", aggr="sum"))
    ref_c = np.zeros((N, 2 * F), np.float32)
    for k in range(E):
        if mask[k]:
            ref_c[rcv[k]] += np.concatenate([x[snd[k]], e[k]])
    np.testing.assert_allclose(out_c, ref_c, rtol=1e-4, atol=1e-5)
