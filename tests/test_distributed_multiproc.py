"""Two-process ``jax.distributed`` bring-up (VERDICT r4 item 5).

``parallel/distributed.py:initialize`` was the one code path in the repo
that had never executed: every prior test was single-process.  This test
launches a REAL coordinator + worker pair (two subprocesses, CPU
backend), each calling ``tpu_ctc.parallel.distributed.initialize`` with
explicit args, building the hybrid mesh over both processes' devices,
and running one psum over the global mesh — the exact multi-host
bring-up sequence a pod run performs (SURVEY.md §3.5).
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")

from tpu_ctc.config import MeshConfig
from tpu_ctc.parallel import distributed

coord, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

# 2 global devices (1 per process): data axis spans DCN (the 2 hosts)
mesh = distributed.hybrid_mesh(MeshConfig(data=-1, model=1, seq=1))
assert dict(mesh.shape) == {"data": 2, "model": 1, "seq": 1}, mesh.shape

# one real cross-process collective over the global mesh
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

local = jnp.asarray([float(pid + 1)])        # host 0 -> 1.0, host 1 -> 2.0
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.asarray(local), (2,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == 3.0, float(total)

# this host's slice of a global batch
sl = distributed.local_batch_slice(8)
assert (sl.start, sl.stop) == (4 * pid, 4 * pid + 4), sl
print(f"OK process {pid}", flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="subprocess rig")
def test_two_process_initialize_and_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)           # 1 device per process
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, coord, str(i)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=240)
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {i} failed:\n{out}\n{err}"
        assert f"OK process {i}" in out
