"""End-to-end multi-controller Trainer: two local processes rendezvous
via jax.distributed on CPU and run ``Trainer.train()`` — the full loop
(dp shard_map step, process-local batch feed, dp-sharded masked eval) —
and must match the single-process trajectory on the same 4-shard data
axis (VERDICT round 4 item 1; SURVEY.md §7 stage 6).  The reference has
no distribution at all; this validates the new capability without a TPU
pod."""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)

# One script for both runs: nproc=1 is the single-process reference
# (4 virtual devices), nproc=2 runs 2 processes x 2 devices — the same
# 4-way data axis, so the trajectories must agree (float reduction
# order across process boundaries is the only difference).
_CHILD = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
nproc = int(sys.argv[3]); devs = int(sys.argv[4])
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devs}"
import jax
jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    from lbt_tpu.parallel.multihost import initialize
    initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc

import numpy as np
import jax.numpy as jnp
from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.nn import Dense, ReLU
from lbt_tpu.nn.model import Model
from lbt_tpu.train.trainer import Trainer

cfg = QuantConfig.uniform(8, engine="int8", stochastic=True)
model = Model("toy", [
    Dense("d1", cfg, 20, 64),
    ReLU(),
    Dense("d2", cfg, 64, 4),
], input_shape=(20,), num_classes=4, cfg=cfg)

rng = np.random.default_rng(0)
xtr = rng.normal(0, 1, (256, 20)).astype(np.float32)
w = rng.normal(0, 1, (20, 4)).astype(np.float32)
ytr = (xtr @ w).argmax(-1).astype(np.int32)
# eval set of 100 with eval_batch_size 48 -> ragged final batch of 4
# exercises the masked padding path
xte, yte = xtr[:100], ytr[:100]

tc = TrainConfig(lr=0.05, batch_size=32, n_epoch=2, data_parallel=True,
                 eval_batch_size=48, log_every=1000)
tr = Trainer(model, tc, {"train": (xtr, ytr), "test": (xte, yte)})
ev = tr.train()
psum = sum(float(jnp.sum(jnp.asarray(p))) for p in jax.tree.leaves(tr.params))
print(f"RESULT {ev['loss']:.6f} {ev['accuracy']:.6f} {psum:.6f}",
      flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(script, nproc, devs, port):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), str(nproc),
             str(devs)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(nproc)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (p.returncode, out, err[-3000:])
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, (out, err[-2000:])
        results.append([float(v) for v in line[0].split()[1:]])
    return results


def test_trainer_two_process_matches_single(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)

    (ref,) = _run(script, nproc=1, devs=4, port=_free_port())
    multi = _run(script, nproc=2, devs=2, port=_free_port())

    # every process reports the same (replicated) final state
    assert multi[0] == pytest.approx(multi[1], rel=1e-6)
    loss_r, acc_r, psum_r = ref
    loss_m, acc_m, psum_m = multi[0]
    # cross-process float reduction order is the only allowed divergence
    assert acc_m == pytest.approx(acc_r, abs=0.02)
    assert loss_m == pytest.approx(loss_r, rel=0.05, abs=0.01)
    assert psum_m == pytest.approx(psum_r, rel=0.02, abs=0.05)
