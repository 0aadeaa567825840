"""Multi-host (multi-process) smoke: two local processes rendezvous via
jax.distributed on CPU, build one global mesh, and run the low-bit ring
all-reduce across process boundaries (SURVEY.md §5.8 — the reference has
no distribution at all; this validates the new capability without a TPU
pod)."""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)

_CHILD = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from lbt_tpu.parallel.multihost import initialize, host_batch_slice
initialize(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from lbt_tpu.parallel.mesh import make_mesh
from lbt_tpu.parallel.lowbit import ring_lowbit_allreduce

mesh = make_mesh(data=4, model=1)
g_global = (np.arange(4 * 8, dtype=np.float32).reshape(4, 8) - 16.0) * 1e-3
sh = NamedSharding(mesh, P("data"))
start, size = host_batch_slice(4)
g = jax.make_array_from_process_local_data(
    sh, g_global[start:start + size])
buf = jax.make_array_from_process_local_data(
    sh, np.zeros((size, 8), np.float32))

def step(g, buf):
    m, r = ring_lowbit_allreduce({"w": g}, {"w": buf}, "data", 4,
                                 bits=8, wire="int16", reduce="mean")
    return m["w"], r["w"]

f = jax.jit(jax.shard_map(
    step, mesh=mesh, in_specs=(P("data"), P("data")),
    out_specs=(P(), P("data")), check_vma=False))
mean, res = f(g, buf)
got = np.asarray(mean.addressable_shards[0].data).reshape(-1)[:8]
want = g_global.mean(axis=0)
# one shared-exponent int8 grid step bounds the quantization error
step_sz = 2.0 ** (np.frexp(np.abs(g_global).max())[1] - 7)
assert np.abs(got - want).max() <= step_sz, (got, want, step_sz)
print("MULTIHOST_OK", pid, flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_lowbit_allreduce(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    port = _free_port()
    env = dict(os.environ)
    # The child script lives in tmp_path, so sys.path[0] is the tmp dir —
    # the repo root must be on PYTHONPATH for `import lbt_tpu` to resolve.
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (rc, out, err[-2000:])
        assert "MULTIHOST_OK" in out, (out, err[-2000:])
