"""Device mesh construction and sharding helpers.

The reference is single-GPU/single-process (SURVEY.md §2.2: no DP/TP/PP/SP,
no NCCL/MPI).  In the TPU-native framework the "communication backend" is the
XLA compiler: we build one logical :class:`jax.sharding.Mesh` with named axes
``('data', 'model', 'seq')``, annotate arrays with
:class:`~jax.sharding.NamedSharding`, and let ``jit`` insert ``psum`` /
``all_gather`` / ``reduce_scatter`` / ``ppermute`` collectives over ICI/DCN.

Axis semantics (SURVEY.md §2.2 P1/P2/P4):
  * ``data``  — utterance-batch data parallelism; gradients allreduce here.
  * ``model`` — hidden-dimension tensor parallelism of the BiRNN weights.
  * ``seq``   — time-axis sequence parallelism (BiRNN carry rings).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_ctc.config import MeshConfig

AXIS_DATA = "data"
AXIS_MODEL = "model"
AXIS_SEQ = "seq"
MESH_AXES = (AXIS_DATA, AXIS_MODEL, AXIS_SEQ)


def resolve_mesh_shape(cfg: MeshConfig, n_devices: Optional[int] = None):
    """Resolve (data, model, seq) sizes; a single -1 absorbs leftover devices."""
    if n_devices is None:
        n_devices = jax.device_count()
    sizes = [cfg.data, cfg.model, cfg.seq]
    n_auto = sum(1 for s in sizes if s == -1)
    if n_auto > 1:
        raise ValueError(f"at most one mesh axis may be -1, got {cfg}")
    fixed = math.prod(s for s in sizes if s != -1)
    if n_auto == 1:
        if n_devices % fixed:
            raise ValueError(
                f"{n_devices} devices not divisible by fixed axes {fixed}")
        sizes = [n_devices // fixed if s == -1 else s for s in sizes]
    elif fixed != n_devices:
        raise ValueError(f"mesh {sizes} does not cover {n_devices} devices")
    return tuple(sizes)


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the logical mesh.

    On a real multi-host pod the caller should order ``devices`` so that the
    ``data`` axis crosses DCN (slowest) and ``model``/``seq`` stay within ICI
    (the hybrid-mesh recipe of SURVEY.md §3.5); JAX's default device order
    already groups by host, and ``data`` is the leading axis here, so the
    default does the right thing.
    """
    if devices is None:
        devices = jax.devices()
    sizes = (cfg.data, cfg.model, cfg.seq)
    if -1 not in sizes and math.prod(sizes) < len(devices):
        # Fully-specified mesh smaller than the machine: use a prefix of the
        # devices (e.g. a single-device mesh on an 8-device test host).
        devices = devices[:math.prod(sizes)]
    shape = resolve_mesh_shape(cfg, len(devices))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, MESH_AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(data=1, model=1, seq=1), devices=jax.devices()[:1])


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def batch_spec() -> P:
    """Sharding for per-utterance batched arrays: leading dim over 'data'."""
    return P(AXIS_DATA)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of batched arrays with the leading axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
