"""Fused Pallas TPU kernels for the non-binary MAX-DOMAIN decoders: EMS
(the reference's committed default decoder) and TMM / layered TMM.

The jnp cores (ops/nb_decode._ems_cn_core / _tmm_cn_core) re-derive the
reference's EMS and Trellis-Min-Max CN updates (myNBLDPC/src/
LDPC_Decoder.cpp:172-359, 361-542, 704-817; GPU ports Decode_GPU.cu:441-704,
957-1069) as fixed-shape tensor programs, but they traverse the full
[B, M, dc, q] message state in HBM many times per iteration — BENCH.md
measured ems at 5,878 frames/s and flooding tmm at 3,907 on the GF(64) code
while the VMEM-resident QSPA kernel family ran ~10x faster on the same
graph.  These kernels give the max-domain family the same treatment: per
grid step a tile of frames decodes entirely out of VMEM state (LLR totals
[N, TB, q] + c2v messages [E, TB, q]), writing only one-hot decisions and
per-frame ok/iteration counters back to HBM.

TPU-first building blocks (shared by both cores):

* GF permutations k -> h*k and their inverses are CONSTANT [q, q] 0/1
  matrices applied on the MXU (one matmul per edge per direction, deduped
  per distinct coefficient) — dynamic q-lane gathers serialize on the VPU
  (the round-3 lesson, BENCH.md).
* XOR-shifts by a PER-FRAME symbol s (delta-domain reindexing by the
  argmax/argmin offset, the syndrome reindex beta = syn ^ Zn) decompose
  into log2(q) stages: stage b applies the constant single-bit permutation
  X_b[u, y] = (u ^ 2^b == y) as an MXU matmul and selects it per frame by
  bit b of s — all vector ops, bit-exact vs nb_decode._xor_shift.
* TMM's 2-deviation search (min over j of max(min1[j], min1[i^j])) runs as
  a fori_loop over j with the full constant XOR-permutation stack
  X[j] ([q, q, q], 1 MB VMEM at q=64) indexed per step — every candidate
  row is one matmul + a handful of selects, with the strict `cand < best`
  update preserving jnp.argmin's first-tie rule exactly.

Numerics are bit-identical to the jnp cores (same op set: permutation
matmuls pick single f32 values exactly at precision=HIGHEST; max/min chains
and tie rules mirrored; EMS /1.2 and TMM x0.8 constants preserved), with
the same flooding/layered schedules, on-device GF syndrome early exit, and
per-frame iteration accounting as ops/pallas_qspa.py, whose decide/syndrome
helpers are reused.

Scope: q = 2^m <= 64 natural symbol order (the GF(16)/GF(64) codes; the
GF(256) codes' [q, q] stacks would need the logrot treatment), statically
unrollable rows (E <= 640), EMS restricted to the reference's committed
configuration set shape Nm=2, Nc=2 (conf(q,1) + one top-1 pair deviation;
other (Nm, Nc) stay on the jnp path — define.h:38-39 ships 2/2).
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
from cuda_ldpc_tpu.ops.nb_decode import NBDecodeResult, to_min_domain
from cuda_ldpc_tpu.ops.pallas_qspa import (_decide_onehot, _lane_bytes,
                                           _syndrome_viol)

_HI = jax.lax.Precision.HIGHEST
NEG = -1e30
POS = 1e30


class _Plan(NamedTuple):
    N: int
    M: int
    q: int
    E: int
    row_edges: tuple          # per CN row: tuple of (eid, vn, p_idx)
    col_edges: tuple          # per VN: tuple of eid
    P: np.ndarray             # [nP, q, q] f32: P_h[s, v] = (v == h*s)
    hp: np.ndarray            # [E, 1, q] f32: h*k per lane (syndrome table)
    Xbit: np.ndarray          # [log2(q), q, q] f32: single-bit XOR perms
    Xall: np.ndarray          # [q, q, q] f32: all-constant XOR perms


_PLANS: dict[tuple, _Plan] = {}


def _code_key(code: NBCode) -> tuple:
    blob = b"".join(np.ascontiguousarray(a).tobytes()
                    for a in (code.cn_links, code.cn_gf, code.cn_mask))
    return (code.name, code.n_sym, code.m_sym, code.q,
            hashlib.sha1(blob).hexdigest())


def make_plan(code: NBCode) -> _Plan:
    key = _code_key(code)
    plan = _PLANS.get(key)
    if plan is not None:
        return plan
    q = code.q
    mul = code.mul_table
    eye = np.eye(q, dtype=np.float32)
    p_index: dict[int, int] = {}
    P_list: list[np.ndarray] = []
    row_edges = []
    col_edges: list[list[int]] = [[] for _ in range(code.n_sym)]
    hp_rows = []
    eid = 0
    for m in range(code.m_sym):
        row = []
        for d in range(code.max_dc):
            if not code.cn_mask[m, d]:
                continue
            h = int(code.cn_gf[m, d])
            p = p_index.get(h)
            if p is None:
                p = p_index[h] = len(P_list)
                P_list.append(eye[:, mul[h]].T.copy())  # P[s, v] = (v == h*s)
            hp_rows.append(mul[h].astype(np.float32))
            n = int(code.cn_links[m, d])
            row.append((eid, n, p))
            col_edges[n].append(eid)
            eid += 1
        row_edges.append(tuple(row))
    nbits = q.bit_length() - 1
    lanes = np.arange(q)
    Xbit = np.stack([eye[:, lanes ^ (1 << b)].T.copy() for b in range(nbits)])
    Xall = np.stack([eye[:, lanes ^ j].T.copy() for j in range(q)])
    plan = _Plan(N=code.n_sym, M=code.m_sym, q=q, E=eid,
                 row_edges=tuple(row_edges),
                 col_edges=tuple(tuple(c) for c in col_edges),
                 P=np.stack(P_list), hp=np.stack(hp_rows)[:, None, :],
                 Xbit=Xbit.astype(np.float32), Xall=Xall.astype(np.float32))
    _PLANS[key] = plan
    return plan


def _vmem_bytes(plan: _Plan, tile_b: int, tmm: bool) -> int:
    lb = _lane_bytes(plan.q)
    state = tile_b * lb * (3 * plan.N + plan.E)   # chan/T/hard + C
    state += tile_b * lb * plan.N                 # input double buffer
    tables = plan.P.nbytes + plan.Xbit.nbytes + plan.hp.size * 4
    if tmm:
        tables += plan.Xall.nbytes
    return state + tables


def pick_tile_b(code: NBCode, tmm: bool, budget: int = 10 << 20) -> int:
    """Measured Mosaic scoped-VMEM cap (2026-08-21, BDS GF(64)): the
    unrolled per-row EMS temporaries cost ~3.5x the state model — tile 32
    compiles to a 34.55 MB scoped allocation against the 16 MB limit, so
    the max-domain kernels run at tile 8 (8.6 MB measured-equivalent)."""
    return 8


def supports(code: NBCode, nm: int = 2, nc: int = 2, max_edges: int = 640,
             budget: int = 10 << 20) -> bool:
    """True when the fused max-domain kernels apply (module docstring).
    ``nm``/``nc`` gate EMS dispatch: only the reference's committed
    Nm=2, Nc=2 shape is compiled (TMM callers pass the defaults)."""
    if code.q & (code.q - 1) or not 8 <= code.q <= 64:
        return False
    if (nm, nc) != (2, 2):
        return False
    plan = make_plan(code)
    return plan.E <= max_edges and _vmem_bytes(plan, 8, True) <= budget


def _mm(x, mat):
    """Exact permutation matmul: x [TB, q] x 0/1 [q, q] on the MXU."""
    return jax.lax.dot_general(x, mat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _mm_t(x, mat):
    """x @ mat^T (the forward GF permutation: out[k] = x[h*k])."""
    return jax.lax.dot_general(x, mat, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _xor_dyn(x, s, Xbit_ref, q: int):
    """x[..., y] -> x[..., y ^ s] for per-frame s [TB, 1] int32: log2(q)
    constant-permutation matmuls selected per frame by the bits of s.
    Bit-exact vs nb_decode._xor_shift (xor commutes, picks are exact)."""
    for b in range(q.bit_length() - 1):
        swapped = _mm(x, Xbit_ref[b])
        bit = ((s >> b) & 1) == 1
        x = jnp.where(bit, swapped, x)
    return x



def _f32_iota(shape, dim):
    """Lane-index iota as f32.  Mosaic's tpu.iota only produces integer
    vectors (f32 iota fails the MLIR verifier on device — found the hard
    way); generate int32 and convert."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

def _max_first(x, q: int):
    """(max value [TB, 1], first-max lane index [TB, 1] i32) — matches
    jnp.argmax's first-tie rule (lanes are in natural symbol order)."""
    v = jnp.max(x, axis=1, keepdims=True)
    lane = _f32_iota(x.shape, 1)
    idx = jnp.min(jnp.where(x == v, lane, float(q)), axis=1, keepdims=True)
    return v, idx.astype(jnp.int32)


def _min_first(x, q: int):
    v = jnp.min(x, axis=1, keepdims=True)
    lane = _f32_iota(x.shape, 1)
    idx = jnp.min(jnp.where(x == v, lane, float(q)), axis=1, keepdims=True)
    return v, idx.astype(jnp.int32)


def _decide_onehot_min(t_n, sym):
    """One-hot argmin with jnp.argmin's first-min rule (TMM decisions,
    d_DecideLLRVector — myNBLDPC/src/LDPC_Decoder.cpp:92-105)."""
    q = t_n.shape[1]
    mn = jnp.min(t_n, axis=1, keepdims=True)
    best = jnp.min(jnp.where(t_n == mn, sym, float(q)), axis=1,
                   keepdims=True)
    return jnp.where(sym == best, 1.0, 0.0)


# --------------------------------------------------------------------------
# EMS check-node row update (Nm=2, Nc=2)
# --------------------------------------------------------------------------

def _ems_row_update(row, T_ref, C_ref, P_ref, Xbit_ref, cont, q: int):
    """Mirrors nb_decode._ems_cn_core for nm=2, nc=2 on one unrolled row.
    v2c is read as totals - c2v; only c2v is rewritten (flooding)."""
    k = len(row)
    Ws, c0s = [], []
    P1s, O1s = [], []
    lane = None
    for eid, n, p in row:
        v = T_ref[n] - C_ref[eid]
        U = _mm(v, P_ref[p])                      # U[y] = v2c[h^-1 y]
        v0, c0 = _max_first(U, q)
        W = _xor_dyn(U, c0, Xbit_ref, q) - v0     # delta profile, W[0] = 0
        if lane is None:
            lane = _f32_iota(W.shape, 1)
        Ws.append(W)
        c0s.append(c0)
        # top non-best deviation per edge (the conf(Nm=2, .) alphabet)
        W0 = jnp.where(lane == 0.0, NEG, W)
        p1, o1 = _max_first(W0, q)
        P1s.append(p1)
        O1s.append(o1)

    # conf(q,1): best/second-best single deviation across edges, per offset
    m1 = jnp.full(Ws[0].shape, NEG)
    m2 = jnp.full(Ws[0].shape, NEG)
    am = jnp.zeros(Ws[0].shape, jnp.float32)
    for slot, W in enumerate(Ws):
        newmax = W > m1
        m2 = jnp.where(newmax, m1, jnp.maximum(m2, W))
        am = jnp.where(newmax, float(slot), am)
        m1 = jnp.maximum(m1, W)
    D = [jnp.where(am == float(dout), m2, m1) for dout in range(k)]

    # conf(Nm=2, Nc=2): one pair of deviating edges at their top non-best
    # slots (static unroll over pairs, nb_decode._ems_cn_core nc == 2 branch)
    if k >= 3:
        for a in range(k):
            for b in range(a + 1, k):
                val = P1s[a] + P1s[b]                       # [TB, 1]
                off = jnp.bitwise_xor(O1s[a], O1s[b]).astype(jnp.float32)
                upd = jnp.where(lane == off, val, NEG)      # [TB, q]
                for dout in range(k):
                    if dout != a and dout != b:
                        D[dout] = jnp.maximum(D[dout], upd)

    # baseline GF value excluding the output edge
    call = c0s[0]
    for c0 in c0s[1:]:
        call = jnp.bitwise_xor(call, c0)
    inv12 = 1.0 / 1.2
    for dout, (eid, n, p) in enumerate(row):
        g0 = jnp.bitwise_xor(call, c0s[dout])
        Ds = _xor_dyn(D[dout], g0, Xbit_ref, q)   # Ds[y] = D[y ^ g0]
        Dg = _mm_t(Ds, P_ref[p])                  # Dg[k] = D[h*k ^ g0]
        c2v = (Dg - Ds[:, 0:1]) * inv12
        C_ref[eid] = jnp.where(cont, c2v, C_ref[eid])


# --------------------------------------------------------------------------
# TMM check-node row update (1- and 2-deviation paths, x0.8)
# --------------------------------------------------------------------------

def _tmm_row_update(row, T_ref, C_ref, P_ref, Xbit_ref, Xall_ref, hp_ref,
                    cont, q: int, layered: bool):
    """Mirrors nb_decode._tmm_cn_core on one unrolled row.  Flooding
    rewrites only c2v; layered additionally writes the new totals
    v2c + c2v back immediately (Decoding_layered_TMM,
    myNBLDPC/src/LDPC_Decoder.cpp:640-689)."""
    k = len(row)
    vs, Us, Zns, vmins = [], [], [], []
    lane = None
    for eid, n, p in row:
        v = T_ref[n] - C_ref[eid]
        vs.append(v)
        vmin, qmin = _min_first(v, q)
        vmins.append(vmin)
        if lane is None:
            lane = _f32_iota(v.shape, 1)
        # Zn = h * qmin via the one-hot lane reduction (hp holds h*k per lane)
        oh = lane == qmin.astype(jnp.float32)
        Zn = jnp.sum(jnp.where(oh, hp_ref[eid], 0.0), axis=1, keepdims=True)
        Zns.append(Zn.astype(jnp.int32))
        Us.append(_mm(v, P_ref[p]))               # U[y] = v2c[h^-1 y]
    syn = Zns[0]
    for Zn in Zns[1:]:
        syn = jnp.bitwise_xor(syn, Zn)

    # delta domain + per-eta min1/min2/min-column across edges
    min1 = jnp.full(Us[0].shape, POS)
    min2 = jnp.full(Us[0].shape, POS)
    col = jnp.zeros(Us[0].shape, jnp.float32)
    dUs = []
    for slot in range(k):
        dU = _xor_dyn(Us[slot], Zns[slot], Xbit_ref, q) - vmins[slot]
        dUs.append(dU)
        newmin = dU < min1
        min2 = jnp.where(newmin, min1, jnp.minimum(min2, dU))
        col = jnp.where(newmin, float(slot), col)
        min1 = jnp.minimum(min1, dU)

    # 2-deviation search: fori_loop over j with the constant XOR stack;
    # strict `cand < I2` keeps the FIRST minimizing j (jnp first-tie rule)
    lanef = lane

    def dev2_body(j, carry):
        I2, p1, p2 = carry
        jf = j.astype(jnp.float32)
        ohj = lanef == jf
        vj = jnp.sum(jnp.where(ohj, min1, 0.0), axis=1, keepdims=True)
        cjv = jnp.sum(jnp.where(ohj, col, 0.0), axis=1, keepdims=True)
        Xj = Xall_ref[j]
        mk = _mm(min1, Xj)                        # min1[i ^ j]
        ckv = _mm(col, Xj)
        valid = (cjv != ckv) & (vj != mk) & (lanef != jf)
        cand = jnp.where(valid, jnp.maximum(vj, mk), POS)
        better = cand < I2
        I2 = jnp.where(better, cand, I2)
        p1 = jnp.where(better, jnp.broadcast_to(cjv, col.shape), p1)
        p2 = jnp.where(better, ckv, p2)
        return I2, p1, p2

    I2 = jnp.full(min1.shape, POS)
    I2, p1_2, p2_2 = jax.lax.fori_loop(
        0, q, dev2_body, (I2, jnp.zeros_like(col), jnp.zeros_like(col)))

    use2 = I2 < min1
    I = jnp.where(use2, I2, min1)
    E = jnp.where(use2, min1, min2)
    p1 = jnp.where(use2, p1_2, col)
    p2 = jnp.where(use2, p2_2, col)

    for dout, (eid, n, p) in enumerate(row):
        df = float(dout)
        on_path = (p1 == df) | (p2 == df)
        Lc2p = jnp.where(on_path, E, I)
        Lc2p = jnp.where(lanef == 0.0, 0.0, Lc2p)
        beta = jnp.bitwise_xor(syn, Zns[dout])
        c2v = 0.8 * _mm_t(_xor_dyn(Lc2p, beta, Xbit_ref, q), P_ref[p])
        if layered:
            new_t = vs[dout] + c2v
            T_ref[n] = jnp.where(cont, new_t, T_ref[n])
        C_ref[eid] = jnp.where(cont, c2v, C_ref[eid])


# --------------------------------------------------------------------------
# kernel + host wrappers
# --------------------------------------------------------------------------

def _kernel(chan_ref, P_ref, Xbit_ref, Xall_ref, hp_ref, sym_ref, hard_ref,
            ok_ref, iters_ref, T_ref, C_ref, *, plan: _Plan, num_iters: int,
            early_stop: bool, tile_b: int, method: str):
    """Shared driver for 'ems' (flooding), 'tmm' (flooding, LLR totals
    accumulate across iterations — LDPC_Decoder.cpp:425-435) and
    'layered_tmm' (serial row sweep).  Same decide/syndrome/accounting
    shape as pallas_qspa._kernel."""
    N, q = plan.N, plan.q
    sym_lane = sym_ref[...]
    tmm = method in ("tmm", "layered_tmm")
    layered = method == "layered_tmm"
    decide = _decide_onehot_min if tmm else _decide_onehot

    for n in range(N):
        hard_ref[n] = jnp.zeros((tile_b, q), jnp.float32)
    if num_iters <= 0:
        ok_ref[...] = jnp.zeros((tile_b, 128), jnp.int32)
        iters_ref[...] = jnp.zeros((tile_b, 128), jnp.int32)
        return

    C_ref[...] = jnp.zeros(C_ref.shape, jnp.float32)
    if tmm:
        # chan arrives already min-domain; T is the PERSISTENT llr state
        for n in range(N):
            T_ref[n] = chan_ref[n]

    def body(state):
        t, done, iters = state
        active = done == 0
        cont_pre = active                         # [TB, 1]
        if method == "ems":
            for n in range(N):
                x = chan_ref[n]
                for eid in plan.col_edges[n]:
                    x = x + C_ref[eid]
                T_ref[n] = x
        elif method == "tmm":
            # totals accumulate: lnew = llr_state + sum c2v; frozen frames
            # keep their old state (decide still sees the frozen totals)
            for n in range(N):
                x = T_ref[n]
                for eid in plan.col_edges[n]:
                    x = x + C_ref[eid]
                T_ref[n] = jnp.where(cont_pre, x, T_ref[n])
        for n in range(N):
            oh = decide(T_ref[n], sym_lane)
            hard_ref[n] = jnp.where(active, oh, hard_ref[n])
        viol = _syndrome_viol(plan, hard_ref, hp_ref, tile_b)
        ok_pass = viol == 0
        iters = jnp.where(active, jnp.where(ok_pass, t, t + 1), iters)
        done = jnp.where(ok_pass, 1, done)
        cont = active & ~ok_pass
        for row in plan.row_edges:
            if method == "ems":
                _ems_row_update(row, T_ref, C_ref, P_ref, Xbit_ref, cont, q)
            else:
                _tmm_row_update(row, T_ref, C_ref, P_ref, Xbit_ref, Xall_ref,
                                hp_ref, cont, q, layered)
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


def _decode(L_ch: jax.Array, code: NBCode, num_iters: int, method: str,
            early_stop: bool = True, tile_b: int | None = None,
            interpret: bool = False) -> NBDecodeResult:
    plan = make_plan(code)
    if not interpret and not supports(code):
        raise ValueError(f"pallas nbms kernel unsupported for {code.name} "
                         f"(q={code.q}, E={plan.E})")
    tmm = method in ("tmm", "layered_tmm")
    if tile_b is None:
        tile_b = pick_tile_b(code, tmm)
    B, N, q = L_ch.shape
    assert N == plan.N and q == plan.q
    nt = pl.cdiv(B, tile_b)
    Bp = nt * tile_b
    chan = L_ch.astype(jnp.float32)
    if tmm:
        chan = to_min_domain(chan)
    if Bp != B:
        chan = jnp.pad(chan, ((0, Bp - B), (0, 0), (0, 0)))
    chan = chan.transpose(1, 0, 2)                # [N, Bp, q]
    sym_in = np.arange(q, dtype=np.float32)[None, :]
    kernel = functools.partial(_kernel, plan=plan, num_iters=num_iters,
                               early_stop=early_stop, tile_b=tile_b,
                               method=method)
    hard_oh, ok, iters = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((N, tile_b, q), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.P.shape[0], q, q), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.Xbit.shape[0], q, q), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, q, q), lambda i: (0, 0, 0),
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
    )(chan, jnp.asarray(plan.P), jnp.asarray(plan.Xbit),
      jnp.asarray(plan.Xall), jnp.asarray(plan.hp),
      jnp.asarray(sym_in))
    hard = jnp.argmax(hard_oh, axis=2).astype(jnp.int32).T[:B]
    return NBDecodeResult(hard, ok[:B, 0].astype(bool), iters[:B, 0])


def decode_ems(L_ch: jax.Array, code: NBCode, max_iters: int,
               early_stop: bool = True, tile_b: int | None = None,
               interpret: bool = False) -> NBDecodeResult:
    """Fused flooding EMS decode, Nm=2/Nc=2 — drop-in for
    nb_decode.decode_ems at the reference's committed configuration
    (myNBLDPC/include/define.h:37-39).  L_ch: [B, N, q] symbol LLRs."""
    return _decode(L_ch, code, max_iters, "ems", early_stop=early_stop,
                   tile_b=tile_b, interpret=interpret)


def decode_tmm(L_ch: jax.Array, code: NBCode, max_iters: int,
               early_stop: bool = True, tile_b: int | None = None,
               interpret: bool = False) -> NBDecodeResult:
    """Fused flooding TMM decode — drop-in for nb_decode.decode_tmm
    (positive-domain L_ch converted to the min domain internally, LLR
    totals accumulating across iterations like the reference)."""
    return _decode(L_ch, code, max_iters, "tmm", early_stop=early_stop,
                   tile_b=tile_b, interpret=interpret)


def decode_layered_tmm(L_ch: jax.Array, code: NBCode, max_iters: int,
                       early_stop: bool = True, tile_b: int | None = None,
                       interpret: bool = False) -> NBDecodeResult:
    """Fused row-layered TMM decode — drop-in for
    nb_decode.decode_layered_tmm (serial row sweep, statically unrolled)."""
    return _decode(L_ch, code, max_iters, "layered_tmm",
                   early_stop=early_stop, tile_b=tile_b, interpret=interpret)
