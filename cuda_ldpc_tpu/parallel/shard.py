"""shard_map wrappers: run the fused Pallas kernels on multi-device meshes.

``pl.pallas_call`` is a single-device program — invoked directly on a batch
that is sharded over a mesh, XLA would all-gather the batch onto every chip
and replicate the work, which is why the sweep drivers used to gate the fused
kernels to single-device meshes (the round-4 VERDICT's top gap: every
multi-chip run fell back to the ~20x slower jnp path).  These wrappers close
that gap the TPU way: ``jax.shard_map`` over the 1-D ``batch`` mesh axis
(parallel/mesh.py) hands each device its local frame shard, every device runs
the identical fused kernel on its shard, and the only cross-device traffic is
a scalar ``pmax`` for the binary decoders' batch-global iteration count — the
same communication-free Monte-Carlo data parallelism as the jnp path
(BENCH.md "Multi-host / multi-chip scaling").

The reference runs its one GPU uniformly (bldpc_实习/Simulation.cu:33-51);
here the uniform fast path extends to any mesh size.  ``check_vma=False``:
the wrapped kernels close over large static graph constants (edge tables,
Hadamard stacks) that are replicated by construction, and the outputs'
sharding is fully pinned by ``out_specs``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from cuda_ldpc_tpu.ops.minsum import DecodeResult
from cuda_ldpc_tpu.ops.nb_decode import NBDecodeResult


def shard_binary_decode(base, mesh: Mesh, col_major: bool,
                        axis: str = "batch"):
    """Wrap a fused binary decode (pallas_minsum.decode_flooding/_layered
    signature) so each device decodes its local batch shard.

    ``col_major`` fixes the frame-axis position at wrap time ([L, B, Z] vs
    [B, L, Z]); the returned callable still accepts the full kwarg surface
    (and a matching ``col_major`` kwarg) so it is a drop-in at every
    _pick_binary_decode call site.  Per-frame hard/ok stay sharded; ``iters``
    (the reference's batch-global iteration count, one host loop for the
    whole batch — bldpc_实习/LDPC_Decoder.cu:94-156) is pmax-reduced over the
    mesh so every shard reports the same scalar."""
    bspec = P(None, axis, None) if col_major else P(axis, None, None)

    def fn(chan, code, num_iters, **kw):
        if bool(kw.get("col_major", False)) != col_major:
            raise ValueError("shard-mapped decode was built for "
                             f"col_major={col_major}")

        def inner(c):
            res = base(c, code, num_iters, **kw)
            return (res.hard, res.ok,
                    jax.lax.pmax(res.iters, axis))

        hard, ok, iters = jax.shard_map(
            inner, mesh=mesh, in_specs=(bspec,),
            out_specs=(bspec, P(axis), P()), check_vma=False)(chan)
        return DecodeResult(hard, ok, iters)

    return fn


def shard_nb_decode(base, mesh: Mesh, axis: str = "batch"):
    """Wrap a fused NB decode (``base(L) -> NBDecodeResult`` with L
    [B, N, q]) over the batch mesh axis.  All three outputs are per-frame
    (hard [B, N], ok [B], iters [B]), so no collective is needed."""
    def fn(L):
        def inner(x):
            return tuple(base(x))

        hard, ok, iters = jax.shard_map(
            inner, mesh=mesh, in_specs=(P(axis, None, None),),
            out_specs=(P(axis, None), P(axis), P(axis)),
            check_vma=False)(L)
        return NBDecodeResult(hard, ok, iters)

    return fn


def shard_stream_step(step, mesh: Mesh, n_state3: int, n_flags: int,
                      axis: str = "batch"):
    """Wrap a stateful fused stream step over the batch (slot) mesh axis.

    The step takes ``n_state3`` leading [X, B, lanes] tensors (channel/
    totals, persistent messages) followed by ``n_flags`` [B, 128] per-slot
    flag planes, and returns updated state tensors in the same layout plus a
    hard-decision tensor — every array carries the slot axis, slots never
    interact, so the wrap is pure SPMD with zero collectives (each device
    owns its slots' persistent state for the whole sweep, exactly like the
    reference's per-thread graph replicas, myNBLDPC/src/Simulation.cpp:405-430)."""
    mid = P(None, axis, None)
    flag = P(axis, None)
    in_specs = (mid,) * n_state3 + (flag,) * n_flags

    def fn(*args):
        def inner(*a):
            return tuple(step(*a))

        probe = jax.eval_shape(lambda *a: tuple(step(*a)), *args)
        out_specs = tuple(mid if len(s.shape) == 3 else flag for s in probe)
        return jax.shard_map(inner, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(*args)

    return fn
