"""Circulant-aware fused Pallas QSPA kernel for QC-lifted non-binary codes
(the 9472-symbol Tanner_74_9_Z128_GF16 file, myNBLDPC/Tanner_74_9_Z128_GF16.txt:1).

The per-edge-unrolled kernel (ops/pallas_qspa.py) statically unrolls every
edge visit, capping it at E <= ~640; the Tanner code has E = 23,680 and was
stuck on the jnp path at 36-208 frames/s (BENCH.md).  This kernel exploits
the quasi-cyclic structure instead: the code lifts a 9 x 74 base graph with
185 circulant blocks of size Z = 128 — exactly the TPU lane width — so one
"block edge" (r, c, shift s) covers 128 real edges and the whole lifted
permutation is a single lane roll (the binary kernel's trick,
ops/pallas_minsum.py).  State layout per block-column: [q, TB, Z] with the
GF(q) symbol axis LEADING (q = 16 is far below the 128-lane width; putting Z
on lanes keeps every op full-width).

Per-lane GF coefficients (the TPU-hard part): unlike binary QC codes, the GF
coefficient h varies arbitrarily along z WITHIN each circulant (verified on
the shipped file), so the k -> h*k message permutation differs per lane and
cannot be one static matrix per block.  TPU-first re-derivation: order the q
symbol slots by DISCRETE LOG (slot 0 = symbol 0, slot 1+j = alpha^j).  In
that order, multiplication by h = alpha^i is a cyclic rotation of slots
1..q-1 by i — and a rotation by a per-lane amount i_z decomposes into
log2(q) conditional rotations by 2^b, each a static row permutation selected
per lane by bit b of i_z.  The Walsh-Hadamard transform that diagonalizes
the XOR convolution folds the log-order permutation into one constant
[q, q] matrix Hlog[slot, u] = (-1)^popcount(sym(slot) & u), applied to a
whole block-row's edge stack with a single rank-3 dot_general on the MXU
(probe-verified to compile; tools/probe_mosaic.py).

Numerics mirror ops/nb_decode's qspa / layered_qspa cores (which re-derive
the reference decoders, myNBLDPC/src/LDPC_Decoder.cpp): same softmax,
exclusive spectral products, log/EPS floor, L[0]-normalization, argmax
decisions with first-max-in-SYMBOL-order tie break, true GF syndrome check
every pass, per-frame freezing, and the reference's iteration accounting
(LDPC_Decoder.cpp:236).  Summation orders differ (log-ordered stacked
matmuls vs natural-order einsums), so float messages agree to ~1e-5, not
bit-exactly; decisions/ok/iters are checked exact in tests on
non-degenerate inputs.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_ldpc_tpu.models.nb_code import NBCode
from cuda_ldpc_tpu.ops.nb_decode import NBDecodeResult

EPS = 1e-30          # pmf floor before the log (matches nb_decode._qspa_cn_core)
_HI = jax.lax.Precision.HIGHEST


class _QCPlan(NamedTuple):
    """Static kernel plan for one QC code (compile-time constants)."""
    NB: int                     # block columns
    MB: int                     # block rows
    Z: int                      # lifting factor (= lane width)
    q: int
    EB: int                     # nonzero circulant blocks ("block edges")
    nbits: int                  # rotation bits = log2(q)
    row_edges: tuple            # per block-row: tuple of (eid, c, shift)
    col_edges: tuple            # per block-col: tuple of (eid, shift)
    Hlog: np.ndarray            # [q, q] f32: Hlog[slot, u] = (-1)^(sym(slot)&u)
    sym: np.ndarray             # [q] int64: symbol value at log slot
    ibits: np.ndarray           # [EB*nbits, 1, Z] f32: bit b of log(h) per lane
    hv: np.ndarray              # [EB, q, 1, Z] f32: h_z * sym(slot) (syndrome)
    logpos: np.ndarray          # [q] int64: log slot of symbol v


_PLANS: dict[tuple, object] = {}


def _code_key(code: NBCode) -> tuple:
    blob = b"".join(np.ascontiguousarray(a).tobytes()
                    for a in (code.cn_links, code.cn_gf, code.cn_mask))
    return (code.name, code.n_sym, code.m_sym, code.q,
            hashlib.sha1(blob).hexdigest())


def _log_tables(code: NBCode):
    """(sym[slot], logpos[value]) for generator alpha = 2 (the polynomial x,
    primitive for every shipped table — utils/gf.py builds GF(2^m) from
    primitive polynomials, so x generates the multiplicative group)."""
    q, mul = code.q, code.mul_table
    sym = np.zeros(q, dtype=np.int64)
    x = 1
    for j in range(q - 1):
        sym[1 + j] = x
        x = int(mul[x, 2])
    if x != 1 or len(set(sym.tolist())) != q:
        raise ValueError("alpha=2 is not a generator for this GF table")
    logpos = np.zeros(q, dtype=np.int64)
    logpos[sym] = np.arange(q)
    return sym, logpos


def make_plan(code: NBCode):
    """Extract the QC structure (or None if the code is not fully QC with
    Z equal to a supported lane width)."""
    key = _code_key(code)
    if key in _PLANS:
        return _PLANS[key]
    plan = _build_plan(code)
    _PLANS[key] = plan
    return plan


def _build_plan(code: NBCode):
    q = code.q
    if q & (q - 1) or not 4 <= q <= 64:
        return None
    for Z in (128, 256):
        if code.n_sym % Z == 0 and code.m_sym % Z == 0:
            break
    else:
        return None
    NB, MB = code.n_sym // Z, code.m_sym // Z
    # group edges into circulant blocks keyed by (block-row, block-col, shift)
    blocks: dict[tuple, dict] = {}
    for m in range(code.m_sym):
        bj, z = divmod(m, Z)
        for d in range(int(code.cn_weight[m])):
            v = int(code.cn_links[m, d])
            g = int(code.cn_gf[m, d])
            bc, cz = divmod(v, Z)
            s = (cz - z) % Z
            blocks.setdefault((bj, bc, s), {})[z] = g
    seen_rc = set()
    for (bj, bc, s), zg in blocks.items():
        if len(zg) != Z:
            return None                   # incomplete circulant: not QC
        if (bj, bc) in seen_rc:
            return None                   # parallel block edges unsupported
        seen_rc.add((bj, bc))
    try:
        sym, logpos = _log_tables(code)
    except ValueError:
        return None
    mul = code.mul_table
    nbits = q.bit_length() - 1
    row_edges: list[list] = [[] for _ in range(MB)]
    col_edges: list[list] = [[] for _ in range(NB)]
    ibits_rows, hv_rows = [], []
    for eid, ((bj, bc, s), zg) in enumerate(sorted(blocks.items())):
        row_edges[bj].append((eid, bc, s))
        col_edges[bc].append((eid, s))
        hz = np.array([zg[z] for z in range(Z)], dtype=np.int64)
        iz = logpos[hz] - 1               # h = alpha^i -> rotation amount i
        if (iz < 0).any():
            return None                   # h = 0 on a live edge: malformed
        for b in range(nbits):
            ibits_rows.append((((iz >> b) & 1)[None, :]).astype(np.float32))
        hv_rows.append(mul[hz[None, :], sym[:, None]]    # [q, Z]
                       .astype(np.float32)[:, None, :])
    anb = sym[:, None] & np.arange(q)[None, :]
    par = np.zeros_like(anb)
    v = anb.copy()
    while v.any():
        par ^= v & 1
        v >>= 1
    Hlog = np.where(par == 1, -1.0, 1.0).astype(np.float32)
    return _QCPlan(NB=NB, MB=MB, Z=Z, q=q, EB=len(blocks), nbits=nbits,
                   row_edges=tuple(tuple(r) for r in row_edges),
                   col_edges=tuple(tuple(c) for c in col_edges),
                   Hlog=Hlog, sym=sym,
                   ibits=np.stack(ibits_rows), hv=np.stack(hv_rows),
                   logpos=logpos)


def _vmem_bytes(plan: _QCPlan, tile_b: int) -> int:
    blk = plan.q * tile_b * plan.Z * 4
    state = blk * (plan.NB + plan.EB)                # T + C scratch
    state += blk * plan.NB * 2                       # chan in, double-buffered
    state += plan.ibits.nbytes + plan.hv.nbytes
    state += plan.NB * tile_b * plan.Z * 4 * 2       # hard out (+ buffer)
    return state


def pick_tile_b(code: NBCode, budget: int = 13 << 20) -> int:
    plan = make_plan(code)
    for tb in (8, 4, 2):
        if _vmem_bytes(plan, tb) <= budget:
            return tb
    return 2


def supports(code: NBCode, budget: int = 13 << 20) -> bool:
    """True when the QC kernel applies: fully quasi-cyclic code, q = 2^m in
    [4, 64], Z a lane-width multiple, smallest tile fits VMEM."""
    plan = make_plan(code)
    return plan is not None and _vmem_bytes(plan, 2) <= budget


# --------------------------------------------------------------------------
# in-kernel helpers (all on [q, TB, Z] values; q leading, Z on lanes)
# --------------------------------------------------------------------------

def _rtree(x, op):
    """Reduce the leading (q) axis by pairwise halving -> [1, TB, Z]."""
    n = x.shape[0]
    while n > 1:
        h = n // 2
        x = op(x[:h], x[h:n])
        n = h
    return x


def _rot_up(x, c: int, q: int):
    """Static cyclic rotation of log slots 1..q-1 by c (slot 0 fixed):
    out[1 + (j + c) % (q-1)] = x[1 + j]."""
    c = c % (q - 1)
    if c == 0:
        return x
    return jnp.concatenate([x[0:1], x[q - c:q], x[1:q - c]], axis=0)


def _mul_rot(x, eid: int, ibits_ref, plan: _QCPlan, inv: bool):
    """Per-lane GF multiply y = h_z * x as log-slot rotation by i_z,
    decomposed into nbits conditional constant rotations (bit b of i_z
    selects a rotation by 2^b; inv rotates by -(2^b))."""
    q = plan.q
    for b in range(plan.nbits):
        mask = ibits_ref[eid * plan.nbits + b]       # [1, Z] f32 0/1
        r = _rot_up(x, (q - 1 - (1 << b)) if inv else (1 << b), q)
        x = jnp.where(mask[None] != 0.0, r, x)
    return x


def _softmax_q(x):
    """softmax over the leading q axis (same formula as jax.nn.softmax)."""
    m = _rtree(x, jnp.maximum)
    e = jnp.exp(x - m)
    return e / _rtree(e, jnp.add)


def _decide_sym(t, symc):
    """Hard SYMBOL decision [1, TB, Z] (f32) from log-ordered totals with the
    jnp path's tie rule: among maxima, the smallest SYMBOL VALUE wins
    (jnp.argmax over natural order picks the first = smallest symbol)."""
    q = t.shape[0]
    mx = _rtree(t, jnp.maximum)
    cand = jnp.where(t == mx, symc, float(q))
    return _rtree(cand, jnp.minimum)


def _syndrome_viol(plan: _QCPlan, hard_ref, hv_ref, symc, tile_b: int):
    """[TB, 1] count of violated check rows from the frozen symbol decisions
    in hard_ref ([1, NB, TB, Z] int32).  Row z of block-row r: xor over
    block edges of h_z * x_hat with x_hat read at lane (z + s) % Z — the
    circulant roll.  The one-hot is rebuilt on the fly from the symbol
    values (keeping a [NB, q, TB, Z] one-hot scratch blew the VMEM budget
    by ~400 KB at tile_b=2)."""
    viol = jnp.zeros((tile_b, 1), jnp.int32)
    for row in plan.row_edges:
        syn = jnp.zeros((tile_b, plan.Z), jnp.int32)
        for eid, c, s in row:
            h = hard_ref[0, c].astype(jnp.float32)[None]        # [1, TB, Z]
            oh = jnp.where(h == symc, 1.0, 0.0)                 # [q, TB, Z]
            oh = pltpu.roll(oh, (-s) % plan.Z, axis=2) if s else oh
            contrib = _rtree(oh * hv_ref[eid], jnp.add)[0]      # [TB, Z]
            syn = jnp.bitwise_xor(syn, contrib.astype(jnp.int32))
        viol += jnp.sum((syn != 0).astype(jnp.int32), axis=1, keepdims=True)
    return viol


def _transform(x, H):
    """F[u] = sum_slot x[slot] * Hlog[slot, u] (stacked over the middle
    axis): [q, n, Z] x [q, q] -> [q, n, Z] on the MXU."""
    return jax.lax.dot_general(H, x, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _itransform(x, H):
    """pout[slot] = sum_u x[u] * Hlog[slot, u]."""
    return jax.lax.dot_general(H, x, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _cn_row_update(row, T_ref, C_ref, H, ibits_ref, plan: _QCPlan, cont,
                   tile_b: int, layered: bool):
    """One block-row's exact sum-product update (Z independent check rows at
    once).  Mirrors nb_decode._qspa_cn_core / the layered write-back of
    nb_decode's layered_qspa row_body."""
    q, Z = plan.q, plan.Z
    k = len(row)
    v2cs, Us = [], []
    for eid, c, s in row:
        t = pltpu.roll(T_ref[c], (-s) % Z, axis=2) if s else T_ref[c]
        v = t - C_ref[eid]
        v2cs.append(v)
        Us.append(_mul_rot(v, eid, ibits_ref, plan, inv=False))
    U = jnp.concatenate(Us, axis=1)                  # [q, k*TB, Z]
    F = _transform(_softmax_q(U), H)
    Fs = [F[:, i * tile_b:(i + 1) * tile_b] for i in range(k)]
    one = jnp.ones_like(Fs[0])
    fwd = [one]
    for i in range(k - 1):
        fwd.append(fwd[-1] * Fs[i])
    bwd = [one]
    for i in range(k - 1, 0, -1):
        bwd.append(bwd[-1] * Fs[i])
    bwd = bwd[::-1]
    excl = jnp.concatenate([fwd[i] * bwd[i] for i in range(k)], axis=1)
    pout = _itransform(excl, H) * (1.0 / q)
    lp = jnp.log(jnp.maximum(pout, EPS))
    for i, (eid, c, s) in enumerate(row):
        c2v = _mul_rot(lp[:, i * tile_b:(i + 1) * tile_b], eid, ibits_ref,
                       plan, inv=True)
        c2v = c2v - c2v[0:1]
        if layered:
            tnew = v2cs[i] + c2v
            tnew = pltpu.roll(tnew, s, axis=2) if s else tnew
            T_ref[c] = jnp.where(cont, tnew, T_ref[c])
        C_ref[eid] = jnp.where(cont, c2v, C_ref[eid])


def _kernel(chan_ref, H_ref, ibits_ref, hv_ref, symc_ref,
            hard_ref, ok_ref, iters_ref, T_ref, C_ref, *,
            plan: _QCPlan, num_iters: int, early_stop: bool, tile_b: int,
            layered: bool):
    NB, q, Z = plan.NB, plan.q, plan.Z
    H = H_ref[...]
    symc = symc_ref[...].reshape(q, 1, 1)

    for c in range(NB):
        hard_ref[0, c] = jnp.zeros((tile_b, Z), jnp.int32)
    if num_iters <= 0:           # mirror nb_decode._run with max_iters=0
        ok_ref[0] = jnp.zeros((tile_b, 128), jnp.int32)
        iters_ref[0] = jnp.zeros((tile_b, 128), jnp.int32)
        return

    C_ref[...] = jnp.zeros(C_ref.shape, jnp.float32)
    if layered:
        for c in range(NB):
            T_ref[c] = chan_ref[0, c]

    def body(state):
        t, done, iters = state
        if not layered:          # flooding: totals derived from c2v each pass
            for c in range(NB):
                x = chan_ref[0, c]
                for eid, s in plan.col_edges[c]:
                    r = pltpu.roll(C_ref[eid], s, axis=2) if s else C_ref[eid]
                    x = x + r
                T_ref[c] = x
        active = done == 0                           # [TB, 1]
        act2 = jnp.broadcast_to(active, (tile_b, Z))
        for c in range(NB):
            sym_val = _decide_sym(T_ref[c], symc)[0].astype(jnp.int32)
            hard_ref[0, c] = jnp.where(act2, sym_val, hard_ref[0, c])
        viol = _syndrome_viol(plan, hard_ref, hv_ref, symc, tile_b)
        ok_pass = viol == 0
        iters = jnp.where(active, jnp.where(ok_pass, t, t + 1), iters)
        done = jnp.where(ok_pass, 1, done)
        cont = (active & ~ok_pass).reshape(1, tile_b, 1)
        for row in plan.row_edges:
            _cn_row_update(row, T_ref, C_ref, H, ibits_ref, plan, cont,
                           tile_b, layered)
        return t + 1, done, iters

    def cond(state):
        t, done, _ = state
        more = t < num_iters
        if early_stop:
            more = jnp.logical_and(more, jnp.min(done) == 0)
        return more

    done0 = jnp.zeros((tile_b, 1), jnp.int32)
    it0 = jnp.zeros((tile_b, 1), jnp.int32)
    _, done, iters = jax.lax.while_loop(cond, body,
                                        (jnp.int32(0), done0, it0))
    ok_ref[0] = jnp.broadcast_to(done, (tile_b, 128))
    iters_ref[0] = jnp.broadcast_to(iters, (tile_b, 128))


def _decode(L_ch: jax.Array, code: NBCode, num_iters: int, layered: bool,
            early_stop: bool = True, tile_b: int | None = None,
            interpret: bool = False) -> NBDecodeResult:
    plan = make_plan(code)
    if plan is None:
        raise ValueError(f"QC qspa kernel unsupported for {code.name}")
    if not interpret and not supports(code):
        raise ValueError(f"QC qspa kernel unsupported for {code.name} "
                         f"(VMEM budget)")
    if tile_b is None:
        tile_b = pick_tile_b(code)
    B, N, q = L_ch.shape
    assert N == plan.NB * plan.Z and q == plan.q
    nt = pl.cdiv(B, tile_b)
    Bp = nt * tile_b
    chan = L_ch.astype(jnp.float32)
    if Bp != B:
        chan = jnp.pad(chan, ((0, Bp - B), (0, 0), (0, 0)))
    # log-order the symbol axis, then [Bp, NB, Z, q] -> [nt, NB, q, TB, Z].
    # The frame-tile blocking rides a LEADING nt axis: Mosaic requires the
    # last two dims of a blocked spec to be (8, 128)-divisible or equal to
    # the array dims, which (TB, Z) with small TB satisfies only when the
    # block covers them fully.
    chan = jnp.take(chan, jnp.asarray(plan.sym), axis=2)
    chan = chan.reshape(nt, tile_b, plan.NB, plan.Z, q)
    chan = chan.transpose(0, 2, 4, 1, 3)
    kernel = functools.partial(_kernel, plan=plan, num_iters=num_iters,
                               early_stop=early_stop, tile_b=tile_b,
                               layered=layered)
    hard, ok, iters = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, plan.NB, q, tile_b, plan.Z),
                         lambda i: (i, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(plan.ibits.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(plan.hv.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, plan.NB, tile_b, plan.Z),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, plan.NB, tile_b, plan.Z), jnp.int32),
            jax.ShapeDtypeStruct((nt, tile_b, 128), jnp.int32),
            jax.ShapeDtypeStruct((nt, tile_b, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((plan.NB, q, tile_b, plan.Z), jnp.float32),   # totals
            pltpu.VMEM((plan.EB, q, tile_b, plan.Z), jnp.float32),   # c2v
        ],
        interpret=interpret,
    )(chan, jnp.asarray(plan.Hlog), jnp.asarray(plan.ibits),
      jnp.asarray(plan.hv), jnp.asarray(plan.sym, dtype=jnp.float32)[:, None])
    hard = hard.transpose(0, 2, 1, 3).reshape(Bp, N)[:B]
    ok = ok.reshape(Bp, 128)
    iters = iters.reshape(Bp, 128)
    return NBDecodeResult(hard, ok[:B, 0].astype(bool), iters[:B, 0])


def decode_flooding(L_ch: jax.Array, code: NBCode, max_iters: int,
                    early_stop: bool = True, tile_b: int | None = None,
                    interpret: bool = False) -> NBDecodeResult:
    """Fused flooding FFT-QSPA on the QC structure — drop-in for
    nb_decode.decode_qspa on supported codes.  L_ch: [B, N, q] symbol LLRs
    (log P(s)/P(0), L[...,0] = 0)."""
    return _decode(L_ch, code, max_iters, layered=False,
                   early_stop=early_stop, tile_b=tile_b, interpret=interpret)


def decode_layered(L_ch: jax.Array, code: NBCode, max_iters: int,
                   early_stop: bool = True, tile_b: int | None = None,
                   interpret: bool = False) -> NBDecodeResult:
    """Fused BLOCK-row-layered FFT-QSPA: each of the MB block rows is Z
    conflict-free check rows updated at once with immediate LLR write-back —
    the grouped-layered schedule (nb_decode.row_groups) realized at full lane
    width.  Matches nb_decode's glayered_qspa when the group order equals the
    block-row order (true for QC codes: rows of one block row share no VN)."""
    return _decode(L_ch, code, max_iters, layered=True,
                   early_stop=early_stop, tile_b=tile_b, interpret=interpret)
