"""Preemption-shaped failure recovery (VERDICT round-4 item 8).

The reference loses the whole run on any crash (checkpoint only at the
very end, reference trainer.py:189-192).  Here a Trainer child process
is SIGTERM-killed MID-EPOCH, restarted with the same experiment
directory, and must resume from the last epoch checkpoint and reproduce
the uninterrupted run's final state bit-for-bit at the matched step
count (the trajectory is fully determined by (seed, epoch) batch
derivations plus the checkpointed params/qstate/velocity/epoch)."""

import os
import pathlib
import signal
import subprocess
import sys
import time

import pytest

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)

_CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from lbt_tpu.config import QuantConfig, TrainConfig
from lbt_tpu.nn import Conv2d, Dense, Flatten, MaxPool, Model, ReLU
from lbt_tpu.train.trainer import Trainer

ckpt_dir = sys.argv[1]
slow = len(sys.argv) > 2 and sys.argv[2] == "slow"

cfg = QuantConfig.uniform(8, engine="int8", stochastic=True)
model = Model("tiny", [
    Conv2d("c1", cfg, (3, 3, 1, 4), (1, 1), "SAME"),
    ReLU(),
    MaxPool(ksize=(2, 2), strides=(2, 2)),
    Flatten(),
    Dense("d1", cfg, 64, 4),
], input_shape=(8, 8, 1), num_classes=4, cfg=cfg)

rng = np.random.default_rng(0)
x = rng.normal(0, 0.7, (256, 8, 8, 1)).astype(np.float32)
w = rng.normal(0, 1, (64, 4)).astype(np.float32)
y = (x.reshape(256, 64) @ w).argmax(-1).astype(np.int32)

tc = TrainConfig(lr=0.05, batch_size=32, n_epoch=5, log_every=1000,
                 checkpoint_every_epochs=1, checkpoint_dir=ckpt_dir,
                 eval_batch_size=64)


class SlowTrainer(Trainer):
    # the preempted arm crawls mid-epoch so SIGTERM lands inside one
    def train_epoch(self, epoch):
        import time as _t
        r = super().train_epoch(epoch)
        return r

    def evaluate(self):
        if slow and self.epoch >= 2:
            import time as _t
            print("EPOCH_MARK", self.epoch, flush=True)
            _t.sleep(0.8)
        return super().evaluate()


tr = SlowTrainer(model, tc, {"train": (x, y), "test": (x[:100], y[:100])})
ev = tr.train()
psum = sum(float(jnp.sum(jnp.asarray(p))) for p in jax.tree.leaves(tr.params))
print(f"RESULT {tr.step} {ev['loss']:.8f} {ev['accuracy']:.6f} {psum:.8f}",
      flush=True)
"""


def _spawn(script, ckpt_dir, mode=""):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, str(script), str(ckpt_dir)] + ([mode] if mode
                                                        else []),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)


def _finish(p, timeout=240):
    try:
        out, err = p.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        p.kill()
        raise
    return out, err


def test_sigterm_resume_reproduces_uninterrupted_run(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)

    # uninterrupted control run
    out, err = _finish(_spawn(script, tmp_path / "ckpt_ref"))
    ref_lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
    assert ref_lines, (out, err[-3000:])
    ref = ref_lines[0].split()[1:]

    # preempted arm: SIGTERM once training is past epoch 2 (mid-run,
    # between that epoch's checkpoint and the next)
    p = _spawn(script, tmp_path / "ckpt_pre", mode="slow")
    deadline = time.time() + 240
    marked = False
    while time.time() < deadline:
        line = p.stdout.readline()
        if not line:
            break
        if line.startswith("EPOCH_MARK"):
            marked = True
            break
    assert marked, "child never reached the mid-run marker"
    p.send_signal(signal.SIGTERM)
    p.communicate(timeout=60)
    assert p.returncode != 0, "child should have died from SIGTERM"

    # checkpoints up to the kill point exist; final epochs are missing
    ckpts = os.listdir(tmp_path / "ckpt_pre")
    assert ckpts, "no checkpoint written before preemption"

    # restart: must resume and converge to the identical final state
    out, err = _finish(_spawn(script, tmp_path / "ckpt_pre"))
    assert "Resumed from" in err or "Resumed" in out + err, (
        "restart did not resume", err[-2000:])
    res_lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
    assert res_lines, (out, err[-3000:])
    res = res_lines[0].split()[1:]

    assert res[0] == ref[0], f"step count {res[0]} != {ref[0]}"
    assert res[1] == ref[1], f"final loss {res[1]} != {ref[1]}"
    assert res[2] == ref[2], f"final accuracy {res[2]} != {ref[2]}"
    assert res[3] == ref[3], f"param checksum {res[3]} != {ref[3]}"
