"""Fused Pallas TPU kernel for non-binary FFT-QSPA decode (flooding and
row-layered schedules).

The jnp path (ops/nb_decode.decode_qspa / decode_layered_qspa) materializes
every [B, M, dc, q] message tensor in HBM each iteration — BENCH.md measured
the sweep as throughput-bound on those elementwise HBM passes (the grouped
layered schedule with 12x fewer sequential steps ran no faster).  This kernel
keeps the ENTIRE decode in VMEM: per grid step it loads a tile of frames'
channel symbol-LLRs once, runs all iterations against VMEM-resident state
(VN totals [N, TB, q] + c2v messages [E, TB, q]), and writes one-hot hard
decisions + per-frame ok/iteration counters back to HBM.  HBM traffic drops
to ~2·N·q·4 bytes/frame total regardless of iteration count.

Math note (the TPU-first trick): the per-edge GF permutation k -> h·k and the
Walsh-Hadamard transform fold into ONE constant matrix per distinct GF
coefficient,

    A_h[u, k] = (-1)^popcount((h*u) & k)   (= the Hadamard matrix with its
                                             rows permuted by u -> h*u),

so each edge's CN transform is a single [TB, q] x [q, q] MXU matmul each
direction: F = p_x @ A_h gives the spectrum of the pmf of y = h·x directly
from the VN-symbol-domain pmf, and pout_x = (excl @ A_h^T) / q lands the
convolved pmf back in the VN symbol domain — no separate permutation step,
no gather.  A_h is deduplicated across edges (<= q-1 distinct values).
Matmuls run at precision=HIGHEST: the Hadamard cancellation producing pmf
values ~1e-4..1e-6 from O(1) spectra does not survive bf16 passes (measured
on the jnp path — BENCH.md precision note).

Numerics are identical to ops/nb_decode (which re-derives the reference's
decoders, myNBLDPC/src/LDPC_Decoder.cpp): decisions are argmax over the
symbol LLR totals (first max on ties), the true GF syndrome check runs
on-device every pass (the reference copies decisions to the host per
iteration, myNBLDPC/src/Decode_GPU.cu:224-271), per-frame freezing and the
reference's iteration accounting (a frame whose syndrome passes at entry of
pass t reports t iterations — the ``iter_number--`` on success,
LDPC_Decoder.cpp:236).  Layered mirrors nb_decode's layered_qspa schedule
(decide at the top of a sweep, per-row immediate LLR write-back — the
schedule the reference ships only for TMM, LDPC_Decoder.cpp:544-702).

Scope: rows are statically unrolled, so the kernel targets the small/medium
adjacency codes (the GF(64)/GF(256) files; E <= ~600 edge visits).  The
9472-symbol Tanner code stays on the jnp path (``supports`` gates dispatch).
"""

from __future__ import annotations

import functools
import hashlib
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_ldpc_tpu.models.nb_code import NBCode
from cuda_ldpc_tpu.ops.nb_decode import NBDecodeResult, _hadamard

EPS = 1e-30          # pmf floor before the log (matches nb_decode._qspa_cn_core)
_HI = jax.lax.Precision.HIGHEST


class _Plan(NamedTuple):
    """Static (compile-time) kernel plan for one code.

    Two schemes for the per-edge GF permutation (see module docstring):

    * 'astack' (q <= 64): one folded row-permuted Hadamard matrix A_h per
      distinct coefficient, deduped — the permutation costs nothing but the
      stack costs nA * q^2 floats of VMEM.
    * 'logrot' (q > 64, where the stack would blow VMEM — the GF(256)
      codes): symbol slots are DISCRETE-LOG ordered (slot 0 = symbol 0,
      slot 1+j = alpha^j), where multiplication by h = alpha^i is a static
      cyclic rotation of slots 1..q-1 by i (two lane rolls + a select per
      edge), and ONE shared transform matrix Hlog[slot, u] =
      (-1)^popcount(sym(slot) & u) serves every edge.
    """
    N: int
    M: int
    q: int
    E: int                      # number of real edges (padded slots dropped)
    row_edges: tuple            # per CN row: tuple of (eid, vn, a_idx)
    col_edges: tuple            # per VN: tuple of eid
    A: np.ndarray               # [nA, q, q] f32 (logrot: [1, q, q] = Hlog)
    hp: np.ndarray              # [E, 1, q] f32: syndrome value per slot
    scheme: str                 # 'astack' | 'logrot'
    rot: tuple                  # logrot: per-edge rotation amount (else ())
    sym: np.ndarray | None      # logrot: [q] symbol value at log slot


_PLANS: dict[tuple, _Plan] = {}


def _code_key(code: NBCode) -> tuple:
    """Content-based cache key: id(code) could be reused by a different
    NBCode after garbage collection and silently return a stale plan."""
    blob = b"".join(np.ascontiguousarray(a).tobytes()
                    for a in (code.cn_links, code.cn_gf, code.cn_mask))
    return (code.name, code.n_sym, code.m_sym, code.q,
            hashlib.sha1(blob).hexdigest())


def make_plan(code: NBCode, scheme: str = "auto") -> _Plan:
    if scheme == "auto":
        scheme = "astack" if code.q <= 64 else "logrot"
    key = _code_key(code) + (scheme,)
    plan = _PLANS.get(key)
    if plan is not None:
        return plan
    mul = code.mul_table
    q = code.q
    H = _hadamard(q)            # validates q = 2^m
    if scheme == "logrot":
        from cuda_ldpc_tpu.ops.pallas_qspa_qc import _log_tables
        sym, logpos = _log_tables(code)
        # Hlog[slot, u] = H[sym(slot), u]: log-order rows of the Hadamard
        A_list = [H[sym].astype(np.float32)]
    else:
        sym = logpos = None
        A_list = []
    a_index: dict[int, int] = {}
    row_edges = []
    col_edges: list[list[int]] = [[] for _ in range(code.n_sym)]
    hp_rows = []
    rot = []
    eid = 0
    for m in range(code.m_sym):
        row = []
        for d in range(code.max_dc):
            if not code.cn_mask[m, d]:
                continue
            h = int(code.cn_gf[m, d])
            if scheme == "logrot":
                a = 0
                rot.append(int(logpos[h]) - 1)       # h = alpha^rot
                hp_rows.append(mul[h, sym].astype(np.float32))
            else:
                a = a_index.get(h)
                if a is None:
                    a = a_index[h] = len(A_list)
                    # A_h = row-permuted Hadamard: A_h[u, k] = H[h*u, k]
                    A_list.append(H[mul[h]].astype(np.float32))
                hp_rows.append(mul[h].astype(np.float32))
            n = int(code.cn_links[m, d])
            row.append((eid, n, a))
            col_edges[n].append(eid)
            eid += 1
        row_edges.append(tuple(row))
    plan = _Plan(N=code.n_sym, M=code.m_sym, q=q, E=eid,
                 row_edges=tuple(row_edges),
                 col_edges=tuple(tuple(c) for c in col_edges),
                 A=np.stack(A_list),
                 hp=np.stack(hp_rows)[:, None, :],
                 scheme=scheme, rot=tuple(rot), sym=sym)
    _PLANS[key] = plan
    return plan


def clear_plans():
    _PLANS.clear()


def _lane_bytes(q: int) -> int:
    """f32 bytes per (1 sublane x q lanes) row, including Mosaic lane padding
    to the 128 boundary."""
    return ((q + 127) // 128) * 128 * 4


def _vmem_bytes(plan: _Plan, tile_b: int) -> int:
    lb = _lane_bytes(plan.q)
    # chan in (x2: Mosaic double-buffers input blocks), hard out, T scratch,
    # C scratch, plus the A stack and hp table
    state = tile_b * lb * (3 * plan.N + plan.E)
    state += tile_b * lb * plan.N          # input double buffer
    return state + plan.A.nbytes * 2 + plan.hp.size * 4


def pick_tile_b(code: NBCode, budget: int = 10 << 20) -> int:
    plan = make_plan(code)
    # Empirical Mosaic-stack caps (measured 2026-08-20): the logrot scheme's
    # unrolled per-row CN temporaries (lane-rotated spectra, leave-one-out
    # products) live on the scoped-VMEM stack outside the state model below.
    # Measured on device: LDPC_N576_K480_GF256_exp (E=144, dc=12) needs
    # 22.24 MB at tile 16 (tile 8 compiles, device-exact); the low-degree
    # LDPC_N96_K48_GF256_d1_exp (E=24, dc=4) fits at tile 128 only when the
    # grid is a single step — a multi-tile grid double-buffers the in/out
    # blocks and overflows by 0.8 MB (16.83 MB at B=1024).  Cap logrot at
    # tile 64, and high-degree (dc > 8) logrot at tile 8.
    if plan.scheme == "logrot":
        dc_max = max(len(row) for row in plan.row_edges)
        if dc_max > 8:
            return 8
        tiles = (64, 32, 16, 8)
    else:
        tiles = (128, 64, 32, 16, 8)
    for tb in tiles:
        if _vmem_bytes(plan, tb) <= budget:
            return tb
    return 8


def supports(code: NBCode, max_edges: int = 640,
             budget: int = 10 << 20) -> bool:
    """True when the fused kernel applies: q = 2^m lane-friendly width,
    statically-unrollable row count, and the smallest frame tile fits VMEM
    (q > 64 dispatches the logrot scheme, whose shared transform matrix
    replaces the per-coefficient A stack — this is what admits GF(256))."""
    if code.q & (code.q - 1) or not 8 <= code.q <= 256:
        return False
    plan = make_plan(code)
    return plan.E <= max_edges and _vmem_bytes(plan, 8) <= budget


def _lane_rot(x, c: int, q: int):
    """Static cyclic rotation of lanes 1..q-1 by c (lane 0 fixed) — the
    logrot scheme's GF multiply.  Two full-width rolls + selects (the wrapped
    part of the 1..q-1 subrange comes from a roll by c-(q-1))."""
    c = c % (q - 1)
    if c == 0:
        return x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    r1 = pltpu.roll(x, c, axis=x.ndim - 1)
    r2 = pltpu.roll(x, (c - (q - 1)) % q, axis=x.ndim - 1)
    out = jnp.where(lane >= c + 1, r1, r2)
    return jnp.where(lane == 0, x, out)


def _decide_onehot(t_n, sym):
    """One-hot argmax over the q lane axis with jnp.argmax's first-max tie
    rule: ties break on the smallest SYMBOL VALUE.  ``sym`` [1, q] f32 holds
    each lane's symbol value — the natural iota for 'astack' (lane order ==
    symbol order), the log-order table for 'logrot'."""
    q = t_n.shape[1]
    mx = jnp.max(t_n, axis=1, keepdims=True)
    best = jnp.min(jnp.where(t_n == mx, sym, float(q)), axis=1,
                   keepdims=True)
    return jnp.where(sym == best, 1.0, 0.0)


def _syndrome_viol(plan: _Plan, hard_ref, hp_ref, tile_b: int):
    """[TB, 1] count of violated rows, from the one-hot decisions in
    hard_ref.  GF syndrome per row: xor of h_d * x_d (mirrors
    nb_decode._syndrome_ok; the one-hot masked reduction avoids dynamic
    q-lane gathers, which serialize on TPU)."""
    viol = jnp.zeros((tile_b, 1), jnp.int32)
    for row in plan.row_edges:
        syn = jnp.zeros((tile_b, 1), jnp.int32)
        for eid, n, _a in row:
            contrib = jnp.sum(hard_ref[n] * hp_ref[eid], axis=1,
                              keepdims=True).astype(jnp.int32)
            syn = jnp.bitwise_xor(syn, contrib)
        viol += (syn != 0).astype(jnp.int32)
    return viol


def _cn_row_update(row, T_ref, C_ref, A_ref, cont, q: int, layered: bool,
                   plan: _Plan):
    """One CN row's exact sum-product update, fused:
    v2c -> [logrot: slot rotation] -> softmax -> spectrum matmul ->
    exclusive product -> inverse matmul / q -> log -> [logrot: inverse
    rotation] -> normalize to L[0]=0.  Writes guarded by the per-frame cont
    mask.  Layered additionally writes the new LLR totals (v2c + c2v) back
    immediately (nb_decode layered_qspa semantics)."""
    logrot = plan.scheme == "logrot"
    Fs = []
    v2cs = []
    for eid, n, a in row:
        v = T_ref[n] - C_ref[eid]
        v2cs.append(v)
        if logrot:
            v = _lane_rot(v, plan.rot[eid], q)
        p = jax.nn.softmax(v, axis=1)
        Fs.append(jax.lax.dot_general(
            p, A_ref[a], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI))
    k = len(row)
    one = jnp.ones_like(Fs[0])
    fwd = [one]
    for i in range(k - 1):
        fwd.append(fwd[-1] * Fs[i])
    bwd = [one]
    for i in range(k - 1, 0, -1):
        bwd.append(bwd[-1] * Fs[i])
    bwd = bwd[::-1]
    inv_q = 1.0 / q
    for i, (eid, n, a) in enumerate(row):
        excl = fwd[i] * bwd[i]
        pout = jax.lax.dot_general(
            excl, A_ref[a], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI) * inv_q
        c2v = jnp.log(jnp.maximum(pout, EPS))
        if logrot:
            c2v = _lane_rot(c2v, (q - 1) - plan.rot[eid], q)
        c2v = c2v - c2v[:, 0:1]
        if layered:
            T_ref[n] = jnp.where(cont, v2cs[i] + c2v, T_ref[n])
        C_ref[eid] = jnp.where(cont, c2v, C_ref[eid])


def _kernel(chan_ref, A_ref, hp_ref, sym_ref, hard_ref, ok_ref, iters_ref,
            T_ref, C_ref, *, plan: _Plan, num_iters: int, early_stop: bool,
            tile_b: int, layered: bool):
    N, q = plan.N, plan.q
    sym_lane = sym_ref[...]                      # [1, q] f32

    for n in range(N):
        hard_ref[n] = jnp.zeros((tile_b, q), jnp.float32)
    if num_iters <= 0:           # mirror nb_decode._run with max_iters=0
        ok_ref[...] = jnp.zeros((tile_b, 128), jnp.int32)
        iters_ref[...] = jnp.zeros((tile_b, 128), jnp.int32)
        return

    C_ref[...] = jnp.zeros(C_ref.shape, jnp.float32)
    if layered:
        for n in range(N):
            T_ref[n] = chan_ref[n]

    def body(state):
        t, done, iters = state
        if not layered:          # flooding: totals derived from c2v each pass
            for n in range(N):
                x = chan_ref[n]
                for eid in plan.col_edges[n]:
                    x = x + C_ref[eid]
                T_ref[n] = x
        active = done == 0                       # [TB, 1]
        for n in range(N):
            oh = _decide_onehot(T_ref[n], sym_lane)
            hard_ref[n] = jnp.where(active, oh, hard_ref[n])
        # done frames' frozen decisions already satisfy the syndrome, so
        # reading hard_ref is safe for every frame
        viol = _syndrome_viol(plan, hard_ref, hp_ref, tile_b)
        ok_pass = viol == 0
        iters = jnp.where(active,
                          jnp.where(ok_pass, t, t + 1), iters)
        done = jnp.where(ok_pass, 1, done)
        cont = active & ~ok_pass
        for row in plan.row_edges:
            _cn_row_update(row, T_ref, C_ref, A_ref, cont, q, layered, plan)
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
    ok_ref[...] = jnp.broadcast_to(done, (tile_b, 128))
    iters_ref[...] = jnp.broadcast_to(iters, (tile_b, 128))


def _decode(L_ch: jax.Array, code: NBCode, num_iters: int, layered: bool,
            early_stop: bool = True, tile_b: int | None = None,
            interpret: bool = False) -> NBDecodeResult:
    plan = make_plan(code)
    if not interpret and not supports(code):
        raise ValueError(f"pallas qspa kernel unsupported for {code.name} "
                         f"(q={code.q}, E={plan.E})")
    if tile_b is None:
        tile_b = pick_tile_b(code)
    B, N, q = L_ch.shape
    assert N == plan.N and q == plan.q
    nt = pl.cdiv(B, tile_b)
    Bp = nt * tile_b
    chan = L_ch.astype(jnp.float32)
    if Bp != B:
        chan = jnp.pad(chan, ((0, Bp - B), (0, 0), (0, 0)))
    logrot = plan.scheme == "logrot"
    if logrot:                                   # lanes in discrete-log order
        chan = jnp.take(chan, jnp.asarray(plan.sym), axis=2)
        sym_in = np.asarray(plan.sym, np.float32)[None, :]
    else:
        sym_in = np.arange(q, dtype=np.float32)[None, :]
    chan = chan.transpose(1, 0, 2)               # [N, Bp, q]: native tiles
    kernel = functools.partial(_kernel, plan=plan, num_iters=num_iters,
                               early_stop=early_stop, tile_b=tile_b,
                               layered=layered)
    hard_oh, ok, iters = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((N, tile_b, q), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.A.shape[0], q, q), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.E, 1, q), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, tile_b, q), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Bp, q), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, tile_b, q), jnp.float32),        # LLR totals
            pltpu.VMEM((plan.E, tile_b, q), jnp.float32),   # c2v messages
        ],
        interpret=interpret,
    )(chan, jnp.asarray(plan.A), jnp.asarray(plan.hp), jnp.asarray(sym_in))
    hard = jnp.argmax(hard_oh, axis=2).astype(jnp.int32).T[:B]  # [B, N]
    if logrot:                                   # slot index -> symbol value
        hard = jnp.take(jnp.asarray(plan.sym, jnp.int32), hard)
    return NBDecodeResult(hard, ok[:B, 0].astype(bool), iters[:B, 0])


def decode_flooding(L_ch: jax.Array, code: NBCode, max_iters: int,
                    early_stop: bool = True, tile_b: int | None = None,
                    interpret: bool = False) -> NBDecodeResult:
    """Fused flooding FFT-QSPA decode — drop-in for nb_decode.decode_qspa
    (same decisions / ok / per-frame iteration accounting).  L_ch: [B, N, q]
    symbol LLRs (log P(s)/P(0), L[...,0]=0)."""
    return _decode(L_ch, code, max_iters, layered=False,
                   early_stop=early_stop, tile_b=tile_b, interpret=interpret)


def decode_layered(L_ch: jax.Array, code: NBCode, max_iters: int,
                   early_stop: bool = True, tile_b: int | None = None,
                   interpret: bool = False) -> NBDecodeResult:
    """Fused row-layered FFT-QSPA decode — drop-in for
    nb_decode.decode_layered_qspa.  Rows are statically unrolled, so the
    serial sweep costs no per-row dispatch (the jnp path's fori_loop
    serialization is what made layered == grouped-layered in wall time)."""
    return _decode(L_ch, code, max_iters, layered=True,
                   early_stop=early_stop, tile_b=tile_b, interpret=interpret)
