"""Stateful fused Pallas step for the NON-BINARY continuous-batching engine.

Round 3 measured the NB stream engine (sim.make_nb_stream_fn, jnp
DecoderCore) at 4.3x the batch engine on the GF(64) code — batch-granular
early termination lets one straggler pin 1024 lanes at maxIT, while the
stream engine re-seeds finished slots every iteration.  But the jnp stream
core still traverses the full [B, M, dc, q] message state in HBM several
times per iteration; the fused batch kernel (ops/pallas_qspa.py) showed
VMEM residency is worth ~an-order-of-magnitude on that traffic, and the two
wins were mutually exclusive (VERDICT r4 item 3: best engine and best
kernel could not be combined).

This kernel is the composition: it runs up to ``k`` fused FFT-QSPA
iterations against HBM-persistent per-slot state, freezing each slot the
pass its GF syndrome passes (or its iteration budget runs out) — the exact
per-iteration semantics of nb_decode.build_core driven by
sim.make_nb_stream_fn's inner loop, minus the refill, which the driver
performs between calls (fresh channel LLRs for done slots; the kernel
zeroes a finished slot's c2v messages on the way out so the driver never
rewrites the big [E, B, q] state).  HBM traffic per call is one read+write
of the c2v state regardless of k; all per-iteration compute (softmax,
Hadamard MXU matmuls, exclusive products, syndrome) stays VMEM-resident
exactly as in the batch kernel, whose plan/row-update/decide/syndrome
helpers are reused verbatim.

State layout (col-major over slots, like the batch kernel's tiles; qp =
q rounded up to the 128-lane boundary — Mosaic requires manually-DMA'd
memrefs to have 128-aligned minor dims, the same constraint that gives the
binary stream kernel its Zp padding; measured on device: an unpadded q=64
state fails to compile with "Slice shape along dimension 2 must be aligned
to tiling (128)"):

  chan [N, B, qp] f32 — channel symbol-LLRs (flooding) or RUNNING TOTALS
                       (layered; returned updated) — logrot codes store
                       lanes in discrete-log slot order; PAD LANES = NEG
                       (see ``pack_chan``),
  C    [E, B, qp] f32 — c2v messages (persistent; HBM + per-tile DMA:
                       blocked in/out specs would hold four double-buffered
                       VMEM copies, the same OOM the binary stream kernel
                       hit — ops/pallas_minsum_stream.py),
  t / done / okf [B, 128] int32 — per-slot iteration count, finished flag,
                       check-passed flag (lanes replicated).

Lane-padding invariants (why no per-op masking is needed): chan pads are
NEG and the A/hp tables are zero-padded, so v2c pads stay ~NEG, softmax
sends them to probability 0, the zero matrix rows/columns keep every real
lane's matmul exact, written c2v pads are bounded garbage (~log EPS) that
NEG absorbs in f32, the padded ``sym`` lane table (value qp) can never win
a decide, and one-hot decisions are 0 on pads so the syndrome never sees
them.

The reference decodes one frame per host thread with no batching at all
(myNBLDPC/src/Simulation.cpp:16-161); the round-3 155,708 frames/s jnp
stream number at the 2 dB GF(64) point is the bar this kernel exists to
beat (VERDICT r4 "Next round" item 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_ldpc_tpu.models.nb_code import NBCode
from cuda_ldpc_tpu.ops.nb_decode import NEG
from cuda_ldpc_tpu.ops.pallas_minsum import _lane_pad
from cuda_ldpc_tpu.ops.pallas_minsum_stream import _body_accounting
from cuda_ldpc_tpu.ops.pallas_qspa import (_Plan, _cn_row_update,
                                           _decide_onehot, _lane_bytes,
                                           _syndrome_viol, make_plan,
                                           supports)


def pack_chan(L: jax.Array, code: NBCode) -> jax.Array:
    """[B, N, q] symbol LLRs -> the stream kernel's [N, B, qp] channel/state
    layout: discrete-log lane order for logrot codes, lane axis padded to
    the 128 boundary with NEG (see module docstring invariants)."""
    plan = make_plan(code)
    q = plan.q
    qp = _lane_pad(q)
    if plan.scheme == "logrot":
        L = jnp.take(L, jnp.asarray(plan.sym), axis=2)
    chan = L.astype(jnp.float32).transpose(1, 0, 2)
    if qp != q:
        chan = jnp.pad(chan, ((0, 0), (0, 0), (0, qp - q)),
                       constant_values=NEG)
    return chan


def _padded_tables(plan: _Plan):
    """(A [nA, qp, qp] zero-pad, hp [E, 1, qp] zero-pad, sym [1, qp] with
    pad value qp so pad lanes never win a decide)."""
    q = plan.q
    qp = _lane_pad(q)
    A = plan.A
    hp = plan.hp
    sym = (np.asarray(plan.sym, np.float32) if plan.scheme == "logrot"
           else np.arange(q, dtype=np.float32))
    if qp != q:
        A = np.zeros((A.shape[0], qp, qp), np.float32)
        A[:, :q, :q] = plan.A
        hp = np.zeros((plan.E, 1, qp), np.float32)
        hp[:, :, :q] = plan.hp
        sym = np.concatenate([sym, np.full(qp - q, qp, np.float32)])
    return A, hp, sym[None, :]


def _stream_vmem_bytes(plan: _Plan, tile_b: int) -> int:
    """Scoped-VMEM model for the stream kernel: T + Cv scratch single-copy,
    chan in/out and hard out double-buffered by the blocked grid."""
    lb = _lane_bytes(plan.q)
    state = tile_b * lb * (plan.N + plan.E)        # T + Cv scratch
    state += tile_b * lb * plan.N * 6              # chan in x2, out x2, hard x2
    return state + plan.A.nbytes * 2 + plan.hp.size * 4


def pick_tile_b(code: NBCode, budget: int = 10 << 20) -> int:
    plan = make_plan(code)
    if plan.scheme == "logrot":
        dc_max = max(len(row) for row in plan.row_edges)
        if dc_max > 8:
            return 8
        tiles = (32, 16, 8)
    else:
        tiles = (64, 32, 16, 8)
    for tb in tiles:
        if _stream_vmem_bytes(plan, tb) <= budget:
            return tb
    return 8


def _stream_kernel(chan_ref, A_ref, hp_ref, sym_ref, Cin_hbm, tin_ref,
                   din_ref, oin_ref, chanout_ref, Cout_hbm, hard_ref,
                   tout_ref, dout_ref, oout_ref, T_ref, Cv_ref, sem_in,
                   sem_out, *, plan: _Plan, k: int, max_iters: int,
                   tile_b: int, layered: bool):
    N, q = plan.N, plan.q                  # q = REAL symbol count (1/q,
    qp = _lane_pad(q)                      # logrot rotations); qp = lanes
    sym_lane = sym_ref[...]                        # [1, qp] f32
    i = pl.program_id(0)
    sl = pl.ds(i * tile_b, tile_b)
    dma_in = pltpu.make_async_copy(Cin_hbm.at[:, sl, :], Cv_ref, sem_in)
    dma_in.start()
    if layered:
        # chan carries the RUNNING TOTALS state for the layered schedule
        # (fresh slots are seeded with the channel LLRs = initial totals)
        T_ref[...] = chan_ref[...]
    for n in range(N):
        hard_ref[n] = jnp.zeros((tile_b, qp), jnp.float32)
    dma_in.wait()

    def body(state):
        it, t, done, okf = state
        if not layered:        # flooding: totals derived from c2v each pass
            for n in range(N):
                x = chan_ref[n]
                for eid in plan.col_edges[n]:
                    x = x + Cv_ref[eid]
                T_ref[n] = x
        active = done[:, 0:1] == 0
        for n in range(N):
            oh = _decide_onehot(T_ref[n], sym_lane)
            hard_ref[n] = jnp.where(active, oh, hard_ref[n])
        viol = _syndrome_viol(plan, hard_ref, hp_ref, tile_b)
        ok_f = viol == 0
        t, done, okf, cont = _body_accounting(ok_f, t, done, okf, max_iters)
        for row in plan.row_edges:
            _cn_row_update(row, T_ref, Cv_ref, A_ref, cont[:, 0:1], q,
                           layered, plan)
        return it + 1, t, done, okf

    def cond(state):
        it, _, done, _ = state
        return jnp.logical_and(it < k, jnp.min(done) == 0)

    state0 = (jnp.int32(0), tin_ref[...], din_ref[...], oin_ref[...])
    _, t, done, okf = jax.lax.while_loop(cond, body, state0)

    dmask = done[:, 0:1] == 1
    for e in range(plan.E):
        # finished slots leave with zeroed messages so the driver's refill
        # never touches the [E, B, q] state
        Cv_ref[e] = jnp.where(dmask, 0.0, Cv_ref[e])
    dma_out = pltpu.make_async_copy(Cv_ref, Cout_hbm.at[:, sl, :], sem_out)
    dma_out.start()
    if layered:
        chanout_ref[...] = T_ref[...]
    else:
        chanout_ref[...] = chan_ref[...]
    tout_ref[...] = t
    dout_ref[...] = done
    oout_ref[...] = okf
    dma_out.wait()


def stream_step(chan, C, t, done, okf, code: NBCode, k: int, max_iters: int,
                layered: bool = False, tile_b: int | None = None,
                interpret: bool = False):
    """Run up to ``k`` fused QSPA iterations against persistent per-slot
    state (see module docstring for layouts; build chan with ``pack_chan``).
    Returns (chan', C', hard_onehot [N, B, qp] f32, t', done', okf').
    B must be a multiple of tile_b; argmax over the one-hot lane axis never
    lands on a pad lane, so callers may argmax the padded width directly."""
    plan = make_plan(code)
    if not interpret and not supports(code):
        raise ValueError(f"pallas qspa stream kernel unsupported for "
                         f"{code.name} (q={code.q}, E={plan.E})")
    if tile_b is None:
        tile_b = pick_tile_b(code)
    qp = _lane_pad(plan.q)
    N, B, qc = chan.shape
    assert N == plan.N and qc == qp and B % tile_b == 0, (
        f"chan must be [N, B, qp]={plan.N, B, qp} (pack_chan), got "
        f"{chan.shape}")
    nt = B // tile_b
    A, hp, sym_in = _padded_tables(plan)
    kernel = functools.partial(_stream_kernel, plan=plan, k=k,
                               max_iters=max_iters, tile_b=tile_b,
                               layered=layered)
    # chan/C are aliased in/out (persistent state updated in place)
    chan_out, C_out, hard_oh, t2, d2, o2 = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((N, tile_b, qp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.A.shape[0], qp, qp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.E, 1, qp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # C state: manual DMA
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, tile_b, qp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # C state: manual DMA
            pl.BlockSpec((N, tile_b, qp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, B, qp), jnp.float32),
            jax.ShapeDtypeStruct((plan.E, B, qp), jnp.float32),
            jax.ShapeDtypeStruct((N, B, qp), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, tile_b, qp), jnp.float32),       # LLR totals
            pltpu.VMEM((plan.E, tile_b, qp), jnp.float32),  # c2v tile copy
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={0: 0, 4: 1},
        interpret=interpret,
    )(chan, jnp.asarray(A), jnp.asarray(hp), jnp.asarray(sym_in),
      C, t, done, okf)
    return chan_out, C_out, hard_oh, t2, d2, o2
