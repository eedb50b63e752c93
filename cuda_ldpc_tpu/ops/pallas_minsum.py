"""Fused Pallas TPU kernel for binary flooding min-sum decode.

The jnp path (ops/minsum.py) materializes every message tensor in HBM each
iteration (~6 full [B, E, Z] traversals/iter), which caps J15_L30_Z1280 at
~130 Mb/s info throughput per chip.  This kernel keeps the ENTIRE decode in
VMEM: per grid step it loads a tile of frames' channel LLRs once, runs all
iterations against a [E, TB, Z] VMEM message buffer, and writes only hard
decisions + per-frame ok flags back to HBM.  HBM traffic drops to
L*Z*4 bytes/frame total, making the kernel VPU-bound.

Layout note: ALL per-column buffers are [L, TB, Z] (column-major over the
tile) so every column slice ``T_ref[l]`` is a native (TB sublane x Z lane)
tile.  The earlier [TB, L, Z] layout made each slice a strided middle-axis
gather that Mosaic lowered to per-sublane shuffles — rearranging to [L, TB, Z]
was worth ~4x wall-time on J15_L30_Z1280.  The host-side [B, L, Z] contract
is preserved by cheap XLA transposes around the pallas_call.

Numerics are identical to ops/minsum.decode_flooding (which mirrors the
reference kernels, bldpc_实习/LDPC_Decoder.cu:172-315): VN total = chan + sum
of c2v, hard = total < 0, v2c = total - c2v; CN two-min with sign product
writing min2 on the (first) min edge; optional alpha/beta normalization; early
termination checked on-device per tile ('zero' = the reference's all-zero
message check, LDPC_Decoder.cu:137-153, or a true 'syndrome' check).  Hard
decisions / ok / iteration count are written ONCE after the iteration loop
(the totals persist in scratch), not per iteration like the reference's
per-iteration D2H copy.

The circulant permutation is ``pltpu.roll`` along the trailing Z (lane) axis.
Z % 128 == 0 (the flagship Z=1280 and the Z=256/512 codes) rotates in one
roll at full lane efficiency; any other Z >= 64 (Z=64/96/160 — every other
shipped BlockH code) runs with the lane axis padded to the next 128 multiple
and the rotation done as two rolls + a lane select (see _roll).
``supports(code)`` gates dispatch; tiny-Z codes use the jnp path.

VMEM budget (f32, TB=8, J15_L30_Z1280): R 115*8*1280*4 = 4.7 MB, totals
30*8*1280*4 = 1.2 MB, chan tile 1.2 MB — comfortably under 16 MB.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_ldpc_tpu.models.qc_binary import QCBinaryCode
from cuda_ldpc_tpu.ops.minsum import DecodeResult


def _roll(x, shift: int, size: int):
    """Circulant rotation of the first ``size`` lanes with jnp.roll semantics.

    When ``size`` equals the (128-aligned) lane width this is a single
    pltpu.roll.  For padded lanes (size < width, e.g. Z=96 padded to 128 or
    Z=160 padded to 256) it is TWO full-width rolls + a lane select:
    y[i] = x[i-s] for i >= s and x[i-s+size] for i < s — valid lanes only
    ever read valid lanes, so the padding never contaminates the result
    (padded output lanes are garbage and are masked at the reductions).
    Mosaic's dynamic_rotate only handles 32-bit lanes, so narrow dtypes
    round-trip through f32 (rolls are ~free — ablation showed no cost
    difference)."""
    s = shift % size
    if s == 0:
        return x
    if x.dtype.itemsize != 4:
        return _roll(x.astype(jnp.float32), s, size).astype(x.dtype)
    width = x.shape[-1]
    if width == size:
        return pltpu.roll(x, s, axis=1)
    r1 = pltpu.roll(x, s, axis=1)
    r2 = pltpu.roll(x, (s - size) % width, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    return jnp.where(lane >= s, r1, r2)


def _lane_pad(Z: int) -> int:
    """Lane width for a lifting factor: Z rounded up to a multiple of 128."""
    return ((Z + 127) // 128) * 128


def _valid_mask(shape, Z: int) -> jax.Array:
    """Bool mask selecting the true-Z lanes of a padded [.., lanes] tile."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return lane < Z


def supports(code: QCBinaryCode) -> bool:
    """Z % 128 == 0 runs at full lane efficiency; other Z >= 64 run with
    padded lanes (Z=96 -> 128, Z=160 -> 256: 75%/63% lane efficiency, still
    ~an order of magnitude over the jnp path).  Tiny-Z codes stay on jnp."""
    return code.Z >= 64


def _frame_ok(T_ref, code: QCBinaryCode, check: str, tile_b: int):
    """Per-frame convergence flag [TB, 1] from the totals in T_ref."""
    L, Z, J = code.L, code.Z, code.J
    edges = code.edges
    lanes = T_ref.shape[-1]
    pad = lanes != Z               # padded lanes hold garbage: mask reductions

    def masked_count(bits):        # bits: [TB, lanes] int32 in {0, 1}
        if pad:
            bits = jnp.where(_valid_mask(bits.shape, Z), bits, 0)
        return jnp.sum(bits, axis=1, keepdims=True)

    if check == "zero":            # all-zero-codeword check (LDPC_Decoder.cu:137)
        acc = jnp.zeros((tile_b, 1), jnp.int32)
        for l in range(L - J):     # message bits only (Message_CW=0)
            acc += masked_count(
                (T_ref[l].astype(jnp.float32) < 0).astype(jnp.int32))
        return acc == 0
    if check == "syndrome":
        viol = jnp.zeros((tile_b, 1), jnp.int32)
        for j in range(J):
            par = None
            for e in code.row_edges[j]:
                l, s = int(edges[e, 1]), int(edges[e, 2])
                h = (T_ref[l].astype(jnp.float32) < 0).astype(jnp.int32)
                h = _roll(h, -s, Z)
                par = h if par is None else jnp.bitwise_xor(par, h)
            viol += masked_count(par)
        return viol == 0
    return jnp.zeros((tile_b, 1), jnp.bool_)


_SIGNBIT = np.int32(-2**31)        # 0x80000000: IEEE f32 sign-bit mask
_MAGBITS = np.int32(0x7FFFFFFF)


def _cn_phase(T_ref, R_ref, code: QCBinaryCode, alpha: float, beta: float,
              tile_b: int, layered: bool, rule: str = "minsum", cont=None):
    """CN update for every block row: two-min + sign-product (rule='minsum',
    mirrors minsum._cn_minsum) or exact sum-product in the stable phi domain
    (rule='bp', mirrors minsum._cn_bp — the reference's declared-but-never-
    implemented decoder_method=1, bldpc_实习/define.cuh:33-34).  Flooding reads
    v2c = T - R and only rewrites R; layered additionally applies the message
    delta to the running totals row by row (mirrors minsum.decode_layered).
    ``cont`` ([TB, 1] bool or None): per-frame freeze mask — writes keep the
    old value where ~cont (the stream engine's per-slot freezing; the batch
    kernels pass None and update every frame like the reference).

    Sign handling is bitwise on the IEEE sign bit (the kernel is VPU-op-bound
    — BENCH.md roofline — so every saved op is throughput): per-edge sign =
    ``bitcast(q) & 0x80000000``, sign product = XOR of the masks, and the
    output sign is OR'd onto the non-negative magnitude, replacing the
    compare + negate + select of the +-1 formulation.  Bit-identical to
    minsum._cn_minsum/_cn_bp for every input except an exact -0.0 message
    (sign bit set but ``-0.0 < 0`` is False), which cannot arise from the
    continuous channel: q = T - R is +0.0 whenever T == R under
    round-to-nearest."""
    L, Z = code.L, code.Z
    edges = code.edges
    lanes = R_ref.shape[-1]        # Z rounded up to a 128 multiple
    dtype = jnp.float32
    store = R_ref.dtype
    big = jnp.asarray(3.4e38, dtype)
    half = jnp.asarray(0.5, dtype)
    for j in range(code.J):
        idx = code.row_edges[j]
        signs = []                 # per-edge [TB, lanes] i32: sign bit of q
        if rule == "bp":
            # phi(x) = -log(tanh(x/2)) per edge; clip exactly like minsum._cn_bp
            # so interpret-mode parity with the jnp path is bit-exact
            phs = []
            ph_sum = jnp.zeros((tile_b, lanes), dtype)
            for slot, e in enumerate(idx):
                l, s = int(edges[e, 1]), int(edges[e, 2])
                q = T_ref[l].astype(dtype) - R_ref[e].astype(dtype)
                q = _roll(q, -s, Z)
                w = pltpu.bitcast(q, jnp.int32)
                signs.append(w & _SIGNBIT)
                mag = pltpu.bitcast(w & _MAGBITS, dtype)  # == |q|, bit-exact
                mag = jnp.clip(mag, 1.4e-7, 34.0)
                ph = -jnp.log(jnp.tanh(mag * half))
                phs.append(ph)
                ph_sum = ph_sum + ph
        else:
            # Running two-min with argmin-slot tracking.  A min/max sorting
            # network (m2' = min(m2, max(m1, mag)) with the min edge
            # recovered by ``mag == m1`` in the emit pass — provably
            # bit-exact even under ties, since tied mins force m2 == m1)
            # would save the compare + slot select, but measured SLOWER on
            # device (2677 vs 2719 Mb/s): holding all dc magnitudes live
            # across both passes raises VMEM register pressure, the same
            # effect as the prefix/suffix-min ablation (BENCH.md).
            m1 = jnp.full((tile_b, lanes), big, dtype)
            m2 = jnp.full((tile_b, lanes), big, dtype)
            am = jnp.zeros((tile_b, lanes), jnp.int32)
            for slot, e in enumerate(idx):
                l, s = int(edges[e, 1]), int(edges[e, 2])
                q = T_ref[l].astype(dtype) - R_ref[e].astype(dtype)
                q = _roll(q, -s, Z)
                w = pltpu.bitcast(q, jnp.int32)
                mag = pltpu.bitcast(w & _MAGBITS, dtype)  # == |q|, bit-exact
                newmin = mag < m1
                m2 = jnp.where(newmin, m1, jnp.minimum(m2, mag))
                am = jnp.where(newmin, slot, am)
                m1 = jnp.minimum(m1, mag)
                signs.append(w & _SIGNBIT)
        # sign product as XOR of the sign-bit masks
        tot = signs[0]
        for sb in signs[1:]:
            tot = jnp.bitwise_xor(tot, sb)
        for slot, e in enumerate(idx):
            l, s = int(edges[e, 1]), int(edges[e, 2])
            if rule == "bp":
                rest = jnp.clip(ph_sum - phs[slot], 1.4e-7, None)
                out = -jnp.log(jnp.tanh(rest * half))
            else:
                out = jnp.where(am == slot, m2, m1)
            if beta:
                out = jnp.maximum(out - jnp.asarray(beta, dtype), 0)
            if alpha != 1.0:
                out = out * jnp.asarray(alpha, dtype)
            # out >= +0.0 here, so OR-ing the product^edge sign bit onto its
            # bits is exactly where(sign_prod*sign_e < 0, -out, out)
            out = pltpu.bitcast(
                pltpu.bitcast(out, jnp.int32)
                | jnp.bitwise_xor(tot, signs[slot]), dtype)
            new_col = _roll(out, s, Z)
            if layered:
                new_t = (T_ref[l].astype(dtype) + new_col
                         - R_ref[e].astype(dtype)).astype(store)
                T_ref[l] = (new_t if cont is None
                            else jnp.where(cont, new_t, T_ref[l]))
            new_r = new_col.astype(store)
            R_ref[e] = (new_r if cont is None
                        else jnp.where(cont, new_r, R_ref[e]))


def _zero_outputs(hard_ref, ok_ref, iters_ref, tile_b: int):
    hard_ref[...] = jnp.zeros(hard_ref.shape, jnp.int8)
    ok_ref[...] = jnp.zeros((tile_b, 128), jnp.int32)
    iters_ref[...] = jnp.zeros((tile_b, 128), jnp.int32)


def _epilogue(T_ref, hard_ref, ok_ref, iters_ref, code: QCBinaryCode,
              check: str, tile_b: int, final_it):
    for l in range(code.L):
        hard_ref[l] = (T_ref[l].astype(jnp.float32) < 0).astype(jnp.int8)
    ok = _frame_ok(T_ref, code, check, tile_b)
    ok_ref[...] = jnp.broadcast_to(ok.astype(jnp.int32), (tile_b, 128))
    iters_ref[...] = jnp.broadcast_to(
        final_it.astype(jnp.int32)[None, None], (tile_b, 128))


def _kernel(chan_ref, hard_ref, ok_ref, iters_ref, T_ref, R_ref, *,
            code: QCBinaryCode, num_iters: int, alpha: float, beta: float,
            check: str, early_stop: bool, tile_b: int, rule: str = "minsum"):
    L = code.L
    store = R_ref.dtype         # scratch storage dtype (f32 or bf16)
    dtype = jnp.float32         # compute dtype (Mosaic: sub-32-bit compare/rotate unsupported)

    if num_iters <= 0:          # match minsum.decode_flooding: zeros, not-ok
        _zero_outputs(hard_ref, ok_ref, iters_ref, tile_b)
        return

    R_ref[...] = jnp.zeros(R_ref.shape, store)

    def vn_totals():
        for l in range(L):
            t = chan_ref[l].astype(dtype)
            for e in code.col_edges[l]:
                t = t + R_ref[e].astype(dtype)
            T_ref[l] = t.astype(store)

    if early_stop and check != "none":
        def body(state):
            it, _ = state
            vn_totals()
            all_ok = jnp.all(_frame_ok(T_ref, code, check, tile_b))
            _cn_phase(T_ref, R_ref, code, alpha, beta, tile_b, layered=False,
                      rule=rule)
            return it + 1, all_ok

        def cond(state):
            it, all_ok = state
            return jnp.logical_and(it < num_iters, jnp.logical_not(all_ok))

        final_it, _ = jax.lax.while_loop(cond, body,
                                         (jnp.int32(0), jnp.asarray(False)))
    else:
        def body(it, carry):
            vn_totals()
            _cn_phase(T_ref, R_ref, code, alpha, beta, tile_b, layered=False,
                      rule=rule)
            return carry
        jax.lax.fori_loop(0, num_iters, body, jnp.int32(0))
        final_it = jnp.int32(num_iters)

    _epilogue(T_ref, hard_ref, ok_ref, iters_ref, code, check, tile_b,
              final_it)


def _layered_kernel(chan_ref, hard_ref, ok_ref, iters_ref, T_ref, R_ref, *,
                    code: QCBinaryCode, num_iters: int, alpha: float,
                    beta: float, check: str, early_stop: bool, tile_b: int,
                    rule: str = "minsum"):
    """Row-layered schedule: each block-row's CN update is applied to the
    running totals immediately (mirrors ops/minsum.decode_layered).  No
    separate VN phase — totals live in T_ref across iterations — and layered
    converges in roughly half the flooding iterations."""
    L = code.L
    store = R_ref.dtype

    if num_iters <= 0:          # match minsum.decode_layered: zeros, not-ok
        _zero_outputs(hard_ref, ok_ref, iters_ref, tile_b)
        return

    R_ref[...] = jnp.zeros(R_ref.shape, store)
    for l in range(L):
        T_ref[l] = chan_ref[l].astype(store)

    if early_stop and check != "none":
        def body(state):
            it, _ = state
            _cn_phase(T_ref, R_ref, code, alpha, beta, tile_b, layered=True,
                      rule=rule)
            all_ok = jnp.all(_frame_ok(T_ref, code, check, tile_b))
            return it + 1, all_ok

        def cond(state):
            it, all_ok = state
            return jnp.logical_and(it < num_iters, jnp.logical_not(all_ok))

        final_it, _ = jax.lax.while_loop(cond, body,
                                         (jnp.int32(0), jnp.asarray(False)))
    else:
        def body(it, carry):
            _cn_phase(T_ref, R_ref, code, alpha, beta, tile_b, layered=True,
                      rule=rule)
            return carry
        jax.lax.fori_loop(0, num_iters, body, jnp.int32(0))
        final_it = jnp.int32(num_iters)

    _epilogue(T_ref, hard_ref, ok_ref, iters_ref, code, check, tile_b,
              final_it)


def _kernel_dtype(msg_dtype, chan_dtype):
    """In-kernel STORAGE dtype (f32 or bf16).  Compute is always f32: Mosaic
    cannot relayout the i1 masks of sub-32-bit compares and dynamic_rotate is
    32-bit only, so narrow dtypes only shrink the VMEM scratch (allowing a
    bigger frame tile), with loads/stores casting at the boundary."""
    want = jnp.dtype(msg_dtype) if msg_dtype is not None else jnp.dtype(chan_dtype)
    if want == jnp.dtype(jnp.bfloat16):
        return want
    return jnp.dtype(jnp.float32)


def _run_kernel(kernel, chan, code, tile_b, dtype, interpret,
                col_major=False):
    if col_major:
        L, B, Z = chan.shape
        chan = chan.astype(jnp.float32)
        nt = pl.cdiv(B, tile_b)
        Bp = nt * tile_b
        Zp = _lane_pad(Z)
        if Bp != B or Zp != Z:
            chan = jnp.pad(chan, ((0, 0), (0, Bp - B), (0, Zp - Z)))
    else:
        B, L, Z = chan.shape
        nt = pl.cdiv(B, tile_b)
        Bp = nt * tile_b
        Zp = _lane_pad(Z)
        if Bp != B or Zp != Z:
            chan = jnp.pad(chan, ((0, Bp - B), (0, 0), (0, Zp - Z)))
        # [B, L, Z] -> [L, B, Z] so each in-kernel column slice is a native
        # (TB sublane x Z lane) tile (see layout note in module docstring)
        chan = chan.astype(jnp.float32).transpose(1, 0, 2)
    hard, ok, iters = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[pl.BlockSpec((L, tile_b, Zp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((L, tile_b, Zp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Bp, Zp), jnp.int8),
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, tile_b, Zp), dtype),               # VN totals
            pltpu.VMEM((code.num_edges, tile_b, Zp), dtype),  # c2v messages
        ],
        interpret=interpret,
    )(chan)
    hard = (hard[:, :B, :Z] if col_major
            else hard.transpose(1, 0, 2)[:B, :, :Z])
    return DecodeResult(hard, ok[:B, 0].astype(bool),
                        jnp.max(iters[:, 0]).astype(jnp.int32))


def decode_layered(chan: jax.Array, code: QCBinaryCode, num_iters: int,
                   alpha: float = 1.0, beta: float = 0.0,
                   check: str = "zero", early_stop: bool = True,
                   msg_dtype=None, tile_b: int = 8,
                   interpret: bool = False,
                   col_major: bool = False, rule: str = "minsum") -> DecodeResult:
    """Fused row-layered decode (drop-in for minsum.decode_layered).
    ``rule``: 'minsum' (default) or 'bp' (exact sum-product; chan must be
    true LLRs 2y/sigma^2 — see minsum._cn_bp).
    ``col_major=True`` takes chan as [L, B, Z] (the kernel's native layout)
    and returns hard the same way, skipping two large HBM transposes."""
    if not supports(code):
        raise ValueError(
            f"pallas kernel needs Z % 128 == 0 or Z >= 64, got Z={code.Z}")
    dtype = _kernel_dtype(msg_dtype, chan.dtype)
    kernel = functools.partial(_layered_kernel, code=code, num_iters=num_iters,
                               alpha=alpha, beta=beta, check=check,
                               early_stop=early_stop, tile_b=tile_b, rule=rule)
    return _run_kernel(kernel, chan, code, tile_b, dtype, interpret,
                       col_major=col_major)


def decode_flooding(chan: jax.Array, code: QCBinaryCode, num_iters: int,
                    alpha: float = 1.0, beta: float = 0.0,
                    check: str = "zero", early_stop: bool = True,
                    msg_dtype=None, tile_b: int = 8,
                    interpret: bool = False,
                    col_major: bool = False, rule: str = "minsum") -> DecodeResult:
    """Drop-in fused replacement for minsum.decode_flooding (binary flooding
    decode, same numerics).  ``rule``: 'minsum' (default) or 'bp' (exact
    sum-product; chan must be true LLRs 2y/sigma^2 — see minsum._cn_bp).
    Returns per-frame ok and the batch-global iteration count (max over
    tiles, like the reference's single host loop).
    ``col_major=True`` takes chan as [L, B, Z] (the kernel's native layout)
    and returns hard the same way, skipping two large HBM transposes."""
    if not supports(code):
        raise ValueError(
            f"pallas kernel needs Z % 128 == 0 or Z >= 64, got Z={code.Z}")
    dtype = _kernel_dtype(msg_dtype, chan.dtype)
    kernel = functools.partial(_kernel, code=code, num_iters=num_iters,
                               alpha=alpha, beta=beta, check=check,
                               early_stop=early_stop, tile_b=tile_b, rule=rule)
    return _run_kernel(kernel, chan, code, tile_b, dtype, interpret,
                       col_major=col_major)
