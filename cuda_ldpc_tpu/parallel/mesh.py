"""Device meshes and batch sharding for Monte-Carlo data parallelism.

The reference's only parallel axes are 4096 interleaved codewords on one GPU
(bldpc_实习/define.cuh:60) and host std::threads with mutex-shared counters
(myNBLDPC/src/Simulation.cpp:14-48).  The TPU-native equivalent is a 1-D
``batch`` mesh over every chip: channel tensors carry a leading frame axis
sharded over the mesh, decoders run SPMD under jit, and the per-batch
statistics vectors (a few counters per frame) are the only cross-device
reduction — tiny, so XLA's all-reduce over ICI/DCN is free in practice.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh and
every process runs the same sweep loop; ``get_mesh`` spans all global devices
and per-host RNG keys are folded with the process index so noise streams never
collide (replacing the reference's mutex-serialized LCG).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices=None, axis: str = "batch") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "batch",
                   axis_pos: int = 0) -> NamedSharding:
    """Shard the frame axis (position ``axis_pos``), replicate the rest.
    ``axis_pos=1`` serves the column-major [L, B, Z] kernel layout."""
    spec = [None] * ndim
    spec[axis_pos] = axis
    return NamedSharding(mesh, P(*spec))


def host_local_batch(total_batch: int, mesh: Mesh) -> int:
    """Frames this process contributes so the global batch is ``total_batch``
    per device * device count."""
    n_local = len([d for d in mesh.devices.flat
                   if d.process_index == jax.process_index()])
    return total_batch * n_local
