"""Multi-host (DCN) smoke test without a cluster: two OS processes, each with 4
virtual CPU devices, joined via ``jax.distributed.initialize`` into one 8-device
mesh. Exercises ``shard_host_local_batch``'s
``make_array_from_process_local_data`` path (core/mesh.py) — VERDICT r1 item 10.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_CHILD = r"""
import os, sys
sys.path.insert(0, "@REPO@")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize("@COORD@", 2, int(sys.argv[1]))
import jax.numpy as jnp
import numpy as np
from cenet_tpu.core.mesh import MeshConfig, make_mesh, shard_host_local_batch

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
mesh = make_mesh(MeshConfig(data=8, model=1))
pid = jax.process_index()
# each host feeds its local half of the global batch (global = 8 rows, 0..7)
local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 12 * pid
batch = shard_host_local_batch(mesh, {"x": local})
total = jax.jit(lambda x: jnp.sum(x))(batch["x"])
expected = float(np.arange(12).sum() + (np.arange(12) + 12).sum())
assert abs(float(total) - expected) < 1e-6, (float(total), expected)

# stacked multi-step batches (K, B, ...) — the production steps_per_call>1 path
# (cli run_train put_batch(..., stacked=True)); batch axis 1 rides 'data'
local_k = np.stack([local, local + 100.0])  # (2, 4, 3) per host
bk = shard_host_local_batch(mesh, {"x": local_k}, stacked=True)
assert bk["x"].shape == (2, 8, 3), bk["x"].shape
tk = jax.jit(lambda x: jnp.sum(x))(bk["x"])
exp_k = 2 * expected + 100.0 * 4 * 3 * 2
assert abs(float(tk) - exp_k) < 1e-5, (float(tk), exp_k)
print(f"proc {pid} ok total={float(total)} stacked={float(tk)}")
"""


def test_two_process_dcn_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = _CHILD.replace("@REPO@", repo).replace("@COORD@", f"127.0.0.1:{port}")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    assert all(rc == 0 for rc, _ in outs), outs
    assert "proc 0 ok" in outs[0][1] + outs[1][1], outs
    assert "proc 1 ok" in outs[0][1] + outs[1][1], outs
