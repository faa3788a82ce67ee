"""Multi-host execution layer (parallel.multihost).

The reference is single-process (SURVEY.md §2.8); the north star demands
N>=2-host scaling. Proven here without hardware: two OS processes x 4
virtual CPU devices each (gloo collectives over jax.distributed) must
produce the SAME training run as one process over 8 devices
(SURVEY.md §4d test strategy). Two granularities:

- ONE optimizer step: parameters match to float-noise tolerance (the
  only difference is the gradient-psum reduction order);
- two epochs (80 steps): per-epoch losses match tightly. Parameters are
  checked loosely only, because directions with ~zero gradient (a Linear
  bias feeding BatchNorm) make Adam a +-lr random walk that chaotically
  amplifies reduction-order noise — loss agreement is the trajectory
  check there.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_smoke.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ)
    # the workers pick their own per-process device counts via
    # jax_num_cpu_devices; the conftest's 8-device XLA flag must not leak
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run_pair(tmp_path, tag, extra):
    """One single-process (8-device) run and one 2-process x 4-device run
    of scripts/multihost_smoke.py; returns (history, params) per run plus
    the 2-process workers' stdout."""
    base = str(tmp_path / f"single_{tag}.npz")
    mh = str(tmp_path / f"multi_{tag}.npz")
    env = _env()

    r = subprocess.run(
        [sys.executable, SCRIPT, "--num_processes", "1",
         "--cpu_devices", "8", "--out", base] + extra,
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    port = _free_port()
    procs = []
    for pid in range(2):
        cmd = [sys.executable, SCRIPT, "--num_processes", "2",
               "--process_id", str(pid), "--cpu_devices", "4",
               "--coordinator", f"127.0.0.1:{port}"] + extra
        if pid == 0:
            cmd += ["--out", mh]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    def load(path):
        with open(path + ".json") as f:
            hist = json.load(f)
        return hist, dict(np.load(path))

    return load(base), load(mh), outs


def test_one_step_params_match_single_process(tmp_path):
    """128 graphs / batch 16 / 8 devices -> exactly one global DP step;
    afterwards every parameter matches the 1-process run to reduction-
    order float noise."""
    (h1, p1), (h2, p2), _ = _run_pair(
        tmp_path, "step",
        ["--epochs", "1", "--batch_size", "16", "--num_layer", "2",
         "--emb_dim", "32", "--n_graphs", "128"],
    )
    assert h1["edges"] == h2["edges"]
    np.testing.assert_allclose(h1["losses"], h2["losses"],
                               rtol=1e-6, atol=1e-7)
    assert sorted(p1) == sorted(p2)
    # Adam's FIRST step moves every element by ~±lr·sign(g): where the
    # true gradient is ~0 (Linear bias feeding BatchNorm), reduction-
    # order noise can flip the sign, bounding any legitimate per-element
    # discrepancy by 2·lr = 2e-3. Flips must be rare; everything else
    # must match to float noise.
    diffs = np.concatenate(
        [np.abs(p1[k] - p2[k]).ravel() for k in sorted(p1)]
    )
    assert diffs.max() <= 2.2e-3, f"beyond sign-flip bound: {diffs.max()}"
    frac_noise = float((diffs <= 1e-5).mean())
    assert frac_noise >= 0.995, f"only {frac_noise:.4f} at float noise"


def test_two_epoch_run_matches_single_process(tmp_path):
    (h1, p1), (h2, p2), outs = _run_pair(
        tmp_path, "epochs",
        ["--epochs", "2", "--batch_size", "16", "--num_layer", "2",
         "--emb_dim", "32", "--n_graphs", "320"],
    )
    # process-0-only logging: worker 1 must not print epoch rows
    assert "epoch=" in outs[0]
    assert "epoch=" not in outs[1]
    assert "4 local / 8 global" in outs[0]

    # identical step sequence: same consumed-edge accounting, same
    # per-epoch mean losses (up to collective reduction order)
    assert h1["edges"] == h2["edges"]
    np.testing.assert_allclose(h1["losses"], h2["losses"],
                               rtol=2e-5, atol=1e-6)
    # params: loose sanity only (see module docstring)
    for k in p1:
        np.testing.assert_allclose(
            p1[k], p2[k], atol=2e-2,
            err_msg=f"param divergence at {k}",
        )


def test_initialize_noop_without_config(monkeypatch):
    from pretrain_gnns_tpu.parallel import multihost

    for v in ("PGT_COORDINATOR", "PGT_NUM_PROCESSES", "PGT_PROCESS_ID"):
        monkeypatch.delenv(v, raising=False)
    assert multihost.initialize() is False
    assert multihost.is_main()
    assert multihost.process_count() == 1


def test_local_cols_single_process():
    import jax

    from pretrain_gnns_tpu.parallel import multihost
    from pretrain_gnns_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.device_count())
    n, lo, hi = multihost.local_cols(mesh)
    assert (n, lo, hi) == (jax.device_count(), 0, jax.device_count())
