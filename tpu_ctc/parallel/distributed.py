"""Multi-host initialization and hybrid DCN x ICI mesh construction.

Reference analogue: none — the reference was single-process, single-GPU
(SURVEY.md §2.2 P8).  The TPU-native "communication backend" is the XLA
compiler; this module only (a) brings up the multi-host process group and
(b) orders devices so that mesh axes map onto the physical fabric:
the 'data' axis crosses DCN (hosts) while 'model'/'seq' stay inside a
host's ICI domain — gradients allreduce over ICI within a host and only
the DP reduction crosses DCN (SURVEY.md §3.5, BASELINE north_star).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from tpu_ctc.config import MeshConfig
from tpu_ctc.parallel.mesh import MESH_AXES, resolve_mesh_shape


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX multi-host process group.

    On TPU pods all arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU test rigs.  Idempotent.

    The idempotence check must NOT touch the backend: probing
    ``jax.process_count()`` here would itself initialize XLA, after which
    ``jax.distributed.initialize`` unconditionally raises — the exact
    failure the two-process test (tests/test_distributed_multiproc.py)
    caught when this path first executed for real.
    """
    if jax.distributed.is_initialized():
        return  # already initialized
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError) as e:
        # Single-process run (no coordinator configured): nothing to do.
        if num_processes not in (None, 1):
            raise
        _ = e


def hybrid_mesh(cfg: MeshConfig,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh whose 'data' axis strides across hosts (DCN) and whose
    'model'/'seq' axes stay within each host's chips (ICI).

    Devices are regrouped host-major: JAX's jax.devices() is already
    host-grouped, so reshaping (hosts, per_host) and assigning the leading
    mesh axis to the host dimension puts DP on DCN.  When the data axis is
    larger than the host count (DP also within hosts), the within-host DP
    fraction rides ICI — the fast direction — which is strictly better.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    shape = resolve_mesh_shape(cfg, n)
    data, model, seq = shape
    per_host = n // max(jax.process_count(), 1)
    inner = model * seq
    if per_host % inner and data > 1:
        # model*seq spans hosts: fall back to the default ordering.
        arr = np.asarray(devices).reshape(shape)
        return Mesh(arr, MESH_AXES)
    # host-major: [hosts, per_host] -> [data, model, seq] with data leading
    arr = np.asarray(devices).reshape(data, model, seq)
    return Mesh(arr, MESH_AXES)


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a global batch (uniform split over hosts)."""
    n = jax.process_count()
    i = jax.process_index()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} hosts")
    per = global_batch // n
    return slice(i * per, (i + 1) * per)


def assert_same_across_hosts(value: float, tag: str = "") -> None:
    """Debug guard: verify a host-computed scalar agrees across processes."""
    import jax.numpy as jnp
    x = jnp.asarray([value])
    total = jax.device_get(
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(
            x.reshape(1, 1)))
    expected = value * jax.process_count() * 1  # one local device used
    if abs(float(total[0, 0]) - expected) > 1e-6 * max(abs(expected), 1.0):
        raise AssertionError(
            f"cross-host divergence in {tag}: local={value} sum={total}")
