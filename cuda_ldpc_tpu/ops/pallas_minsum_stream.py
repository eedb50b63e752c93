"""Stateful fused Pallas step for the binary continuous-batching engine.

The batch kernels (ops/pallas_minsum.py) decode a whole call to completion —
early termination is tile-granular (a tile's slowest frame pins its 8
lanes), and one uncorrectable frame burns maxIT for its whole tile.  The
stream engine wants per-SLOT termination with immediate refill, which needs
decoder state that PERSISTS across calls so finished slots can be re-seeded
while their neighbours keep decoding.

This kernel runs up to ``k`` iterations of the fused decoder against
HBM-resident per-slot state (c2v messages [E, B, Zp]; layered also persists
the running totals), freezing each frame the pass its check passes (or its
iteration budget runs out) — exactly the per-iteration semantics of
minsum.build_core driven by sim.make_binary_stream_fn's inner loop, minus
the refill, which the driver performs between calls (fresh channel for done
slots; the kernel zeroes a finished slot's messages on the way out so the
driver never touches the big R tensor).  HBM traffic per call is one
read+write of the state regardless of k, so k amortizes it to nothing;
compute stays VMEM-resident as in the batch kernels.

The reference has no counterpart: its host loop iterates the full 4096-frame
batch until every frame converges (bldpc_实习/LDPC_Decoder.cu:94-156).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_ldpc_tpu.models.qc_binary import QCBinaryCode
from cuda_ldpc_tpu.ops.pallas_minsum import (_cn_phase, _frame_ok, _lane_pad,
                                             supports)


def _body_accounting(ok_f, t, done, okf, max_iters: int):
    """One decide's per-frame accounting ([TB, 128] int32 state, all lanes
    equal).  Mirrors the jnp stream driver: a frame finishes when its check
    passes or its budget is exhausted; t counts only continued passes."""
    okb = jnp.broadcast_to(ok_f.astype(jnp.int32), t.shape)
    active = done == 0
    fin = active & ((okb == 1) | (t >= max_iters))
    okf = jnp.where(fin, okb, okf)
    done = jnp.where(fin, 1, done)
    cont = done == 0
    t = t + cont.astype(jnp.int32)
    return t, done, okf, cont


def _stream_kernel(chan_ref, Rin_hbm, tin_ref, din_ref, oin_ref,
                   chanout_ref, Rout_hbm, hard_ref, tout_ref, dout_ref,
                   oout_ref, T_ref, Rv_ref, sem_in, sem_out, *,
                   code: QCBinaryCode, k: int,
                   max_iters: int, alpha: float, beta: float, check: str,
                   rule: str, tile_b: int, layered: bool):
    """The persistent c2v state R stays in HBM (memory_space=ANY) and each
    grid step DMAs only ITS tile slice into the single Rv scratch copy.
    Routing R through blocked in/out specs instead would hold FOUR VMEM
    copies of the [E, tile_b, Zp] tile (in x2 + out x2 double buffering) —
    measured 24.44 MB of scoped VMEM on J15_L30_Z1280 (device OOM)."""
    L = code.L
    i = pl.program_id(0)
    sl = pl.ds(i * tile_b, tile_b)
    dma_in = pltpu.make_async_copy(Rin_hbm.at[:, sl, :], Rv_ref, sem_in)
    dma_in.start()
    if layered:
        # chan carries the RUNNING TOTALS state for the layered schedule
        # (fresh slots are seeded with the channel LLRs = initial totals)
        T_ref[...] = chan_ref[...]
    dma_in.wait()

    def body(state):
        it, t, done, okf = state
        if not layered:
            for l in range(L):
                x = chan_ref[l].astype(jnp.float32)
                for e in code.col_edges[l]:
                    x = x + Rv_ref[e].astype(jnp.float32)
                T_ref[l] = x
        ok_f = _frame_ok(T_ref, code, check, tile_b)          # [TB, 1]
        t, done, okf, cont = _body_accounting(ok_f, t, done, okf, max_iters)
        _cn_phase(T_ref, Rv_ref, code, alpha, beta, tile_b,
                  layered=layered, rule=rule, cont=cont[:, 0:1])
        return it + 1, t, done, okf

    def cond(state):
        it, _, done, _ = state
        return jnp.logical_and(it < k, jnp.min(done) == 0)

    state0 = (jnp.int32(0), tin_ref[...], din_ref[...], oin_ref[...])
    _, t, done, okf = jax.lax.while_loop(cond, body, state0)

    # layered: recompute nothing — T_ref holds each frame's frozen totals;
    # flooding: T_ref likewise holds totals of the last executed pass, which
    # for finished frames is their frozen state (unfinished frames' hard is
    # never read by the driver)
    for l in range(L):
        hard_ref[l] = (T_ref[l].astype(jnp.float32) < 0).astype(jnp.int8)
    dmask = (done[:, 0:1] == 1)
    for e in range(code.num_edges):
        # finished slots leave with zeroed messages so the driver's refill
        # never has to rewrite the [E, B, Zp] state
        Rv_ref[e] = jnp.where(dmask, 0.0, Rv_ref[e])
    dma_out = pltpu.make_async_copy(Rv_ref, Rout_hbm.at[:, sl, :], sem_out)
    dma_out.start()
    if layered:
        chanout_ref[...] = T_ref[...]
    else:
        chanout_ref[...] = chan_ref[...]
    tout_ref[...] = t
    dout_ref[...] = done
    oout_ref[...] = okf
    dma_out.wait()


def stream_step(chan, R, t, done, okf, code: QCBinaryCode, k: int,
                max_iters: int, alpha: float = 1.0, beta: float = 0.0,
                check: str = "zero", rule: str = "minsum",
                layered: bool = False, tile_b: int = 8,
                interpret: bool = False):
    """Run up to ``k`` fused decoder iterations against persistent per-slot
    state.  All arrays col-major / lane-padded:

      chan [L, B, Zp] f32 — channel LLRs (flooding) or RUNNING TOTALS
                            (layered; returned updated),
      R    [E, B, Zp] f32 — c2v messages (returned updated; zeroed for
                            slots that finished this call),
      t / done / okf [B, 128] int32 — per-slot iteration count, finished
                            flag, check-passed flag (lanes replicated).

    Returns (chan', R', hard [L, B, Zp] int8, t', done', okf').  B must be a
    multiple of tile_b; padded lanes of chan must be zero."""
    if not supports(code):
        raise ValueError(f"pallas kernel unsupported for {code.name}")
    L, B, Zp = chan.shape
    assert Zp == _lane_pad(code.Z) and B % tile_b == 0
    nt = B // tile_b
    kernel = functools.partial(
        _stream_kernel, code=code, k=k, max_iters=max_iters, alpha=alpha,
        beta=beta, check=check, rule=rule, tile_b=tile_b, layered=layered)
    # chan/R are aliased in/out (persistent state updated in place)
    chan_out, R_out, hard, t2, d2, o2 = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((L, tile_b, Zp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # R state: manual DMA
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, tile_b, Zp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # R state: manual DMA
            pl.BlockSpec((L, tile_b, Zp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, B, Zp), jnp.float32),
            jax.ShapeDtypeStruct((code.num_edges, B, Zp), jnp.float32),
            jax.ShapeDtypeStruct((L, B, Zp), jnp.int8),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, tile_b, Zp), jnp.float32),     # VN totals
            pltpu.VMEM((code.num_edges, tile_b, Zp), jnp.float32),  # R tile
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(chan, R, t, done, okf)
    return chan_out, R_out, hard, t2, d2, o2
