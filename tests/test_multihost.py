"""Two-process jax.distributed smoke test over the parallel/ API.

Spawns two CPU processes that call ``multihost_init`` (DCN bootstrap), build
a global 2-device mesh, and run a shard_map psum — validating the multi-host
initialization path that a real multi-host TPU slice would use (each process
sees its own local device; collectives cross the process boundary via Gloo).
"""
import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ.pop("XLA_FLAGS", None)      # parent harness forces 8 virtual devs
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
from torch_robotics_tpu.parallel import make_mesh, multihost_init, shard_batch
multihost_init(coordinator_address=f"127.0.0.1:{port}", num_processes=2,
               process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 2

import jax.numpy as jnp
from functools import partial
from jax.sharding import PartitionSpec as P
mesh = make_mesh()

@partial(jax.shard_map, mesh=mesh, in_specs=P("batch"), out_specs=P())
def global_sum(x):
    return jax.lax.psum(jnp.sum(x), "batch")[None]

from jax.experimental import multihost_utils
x = multihost_utils.host_local_array_to_global_array(
    jnp.full((2, 3), float(pid + 1)), mesh, P("batch"))
total = global_sum(x)
# rows: 2 rows of 1.0 from proc 0 + 2 rows of 2.0 from proc 1, 3 cols
expect = (2 * 3 * 1.0) + (2 * 3 * 2.0)
# out_specs=P() replicates the result: read this process's local shard
got = float(total.addressable_data(0).ravel()[0])
assert abs(got - expect) < 1e-6, (got, expect)
print(f"OK proc {pid} total {got}")
"""


def test_two_process_distributed_psum(tmp_path):
    port = _free_port()
    repo = str(pathlib.Path(__file__).resolve().parents[1])
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {"PYTHONPATH": repo, "PATH": "/usr/bin:/bin",
           "HOME": "/tmp"}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=repo) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke test timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"OK proc {i}" in out, out


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
