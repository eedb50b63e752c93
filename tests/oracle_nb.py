"""Loop-based NumPy oracles for the non-binary decoders.

Straightforward per-frame transcriptions of the reference algorithms'
*semantics* (myNBLDPC/src/LDPC_Decoder.cpp) — written independently as nested
loops with explicit configuration-set enumeration, used to validate the
vectorized delta-domain jax implementations in cuda_ldpc_tpu/ops/nb_decode.py.

Tie-breaking: sorts/argmax pick the lowest symbol index among equals (the jax
implementation's convention).  Exact float ties are measure-zero under AWGN;
the reference's bubble sort breaks some ties differently, which is
statistically irrelevant (see SURVEY.md section 7).
"""

from __future__ import annotations

import numpy as np

from cuda_ldpc_tpu.utils import gf as gflib

NEG = -1e30
POS = 1e30


class Graph:
    def __init__(self, code):
        self.code = code
        self.q = code.q
        self.mul = code.mul_table
        self.inv = code.inv_table
        self.N = code.n_sym
        self.M = code.m_sym

    def cn_edges(self, m):
        """List of (vn, h) for check row m."""
        c = self.code
        return [(c.cn_links[m, d], c.cn_gf[m, d])
                for d in range(c.cn_weight[m])]


def syndrome_ok(code, hard) -> bool:
    g = Graph(code)
    for m in range(g.M):
        s = 0
        for vn, h in g.cn_edges(m):
            s ^= g.mul[h, hard[vn]]
        if s:
            return False
    return True


def decide_ems(llr_row) -> int:
    """argmax over full q-vector with L[0]=0 (DecideLLRVector semantics)."""
    return int(np.argmax(llr_row))


def _vn_llr(code, L_ch, c2v):
    """LLR totals [N, q] = L_ch + sum of incident c2v (c2v: dict keyed by
    (m, slot_in_cn) -> [q] vector, VN symbol domain)."""
    N, q = L_ch.shape
    llr = L_ch.copy()
    for i in range(N):
        for d in range(code.vn_weight[i]):
            m = code.vn_links[i, d]
            slot = code.vn_slot[i, d]
            llr[i] += c2v[m][slot]
    return llr


def ems_cn_update(code, llr, c2v_old, nm, nc, full=False):
    """One flooding EMS CN phase.  Returns new c2v (list over M of
    [dc, q] arrays, VN symbol domain)."""
    g = Graph(code)
    q = g.q
    new_c2v = [np.zeros_like(c2v_old[m]) for m in range(g.M)]
    for m in range(g.M):
        w = code.cn_weight[m]
        # v2c per edge, VN symbol domain
        v2c = np.stack([llr[code.cn_links[m, d]] - c2v_old[m][d]
                        for d in range(w)])
        for dout in range(w):
            ins = [d for d in range(w) if d != dout]
            # sorted slots per in-edge (desc, ties -> lowest symbol)
            order = {d: np.argsort(-v2c[d], kind="stable") for d in ins}
            ems = np.full(q, NEG)

            def add(cfg):
                # cfg: dict d -> symbol chosen
                val = sum(v2c[d][cfg[d]] for d in ins)
                gfv = 0
                for d in ins:
                    gfv ^= g.mul[code.cn_gf[m, d], cfg[d]]
                if val > ems[gfv]:
                    ems[gfv] = val

            base = {d: int(order[d][0]) for d in ins}
            if full:
                # unrestricted enumeration (only for tiny codes)
                def rec(idx, cfg):
                    if idx == len(ins):
                        add(cfg)
                        return
                    d = ins[idx]
                    for e in range(q):
                        cfg[d] = e
                        rec(idx + 1, cfg)
                    cfg[d] = base[d]
                rec(0, dict(base))
            else:
                # conf(q, 1): one edge deviates to any symbol
                add(base)
                for d in ins:
                    for k in range(q):
                        cfg = dict(base)
                        cfg[d] = int(order[d][k])
                        add(cfg)
                # conf(nm, nc): every slot vector in [0, nm)^|ins| with at
                # most nc deviating edges (the reference's ConstructConf
                # enumeration, LDPC_Decoder.cpp:319-359)
                if nc >= 2:
                    import itertools
                    for slots in itertools.product(range(min(nm, q)),
                                                   repeat=len(ins)):
                        ndev = sum(1 for k in slots if k != 0)
                        if ndev < 2 or ndev > nc:
                            continue   # 0/1-deviation covered by conf(q,1)
                        cfg = {d: int(order[d][k])
                               for d, k in zip(ins, slots)}
                        add(cfg)
            h = code.cn_gf[m, dout]
            out = np.zeros(q)
            for k in range(1, q):
                out[k] = (ems[g.mul[k, h]] - ems[0]) / 1.2
            new_c2v[m][dout] = out
    return new_c2v


def tmm_cn_row(code, v2c, m):
    """TMM CN math for row m.  v2c: [w, q] min-domain messages (VN symbol
    domain).  Returns new c2v [w, q]."""
    g = Graph(code)
    q = g.q
    w = code.cn_weight[m]
    # Zn / syndrome
    Zn = np.zeros(w, dtype=int)
    vmin = np.zeros(w)
    syn = 0
    for d in range(w):
        qmin = int(np.argmin(v2c[d]))
        vmin[d] = v2c[d][qmin]
        Zn[d] = g.mul[code.cn_gf[m, d], qmin]
        syn ^= Zn[d]
    # deltaU[d][eta] = U[eta ^ Zn[d]] - vmin[d],  U[v] = v2c[hinv * v]
    dU = np.zeros((w, q))
    for d in range(w):
        hinv = g.inv[code.cn_gf[m, d]]
        for eta in range(q):
            dU[d][eta] = v2c[d][g.mul[hinv, eta ^ Zn[d]]] - vmin[d]
    # min1/min2/col per eta
    min1 = np.full(q, POS)
    min2 = np.full(q, POS)
    col = np.zeros(q, dtype=int)
    for eta in range(q):
        for d in range(w):
            if dU[d][eta] < min1[eta]:
                min2[eta] = min1[eta]
                min1[eta] = dU[d][eta]
                col[eta] = d
            elif dU[d][eta] < min2[eta]:
                min2[eta] = dU[d][eta]
    # paths (sequential, strict inequalities, like TMM_ConstructConf)
    I = min1.copy()
    E = min2.copy()
    p1 = col.copy()
    p2 = col.copy()
    I[0] = 0.0
    E[0] = 0.0
    for i in range(1, q):
        for j in range(q):
            if j == i:
                continue
            k = i ^ j
            if col[j] == col[k]:
                continue
            dev1, dev2 = min1[j], min1[k]
            if dev1 > dev2 and dev1 < I[i]:
                I[i] = dev1
                p1[i], p2[i] = col[j], col[k]
                E[i] = min1[i]
            elif dev1 < dev2 and dev2 < I[i]:
                I[i] = dev2
                p1[i], p2[i] = col[j], col[k]
                E[i] = min1[i]
    new = np.zeros((v2c.shape[0], q))
    for dout in range(w):
        Lc2p = np.where((np.arange(q) >= 0)
                        & ((p1 == dout) | (p2 == dout)), E, I)
        Lc2p[0] = 0.0
        hinv = g.inv[code.cn_gf[m, dout]]
        beta_syn = syn ^ Zn[dout]
        for eta in range(q):
            beta = g.mul[hinv, eta ^ beta_syn]
            new[dout][beta] = Lc2p[eta] * 0.8
    return new


def to_min_domain(L_ch):
    m = L_ch[:, 1:].max(axis=1, keepdims=True)
    return m - L_ch


def decode_nb(code, L_ch, method, max_iters, nm=2, nc=2):
    """Oracle decode of ONE frame.  L_ch: [N, q] positive-domain LLRs.
    Returns (hard [N], ok, iters) with the reference's iteration counting."""
    g = Graph(code)
    q = g.q
    c2v = [np.zeros((code.cn_weight[m], q)) for m in range(g.M)]

    if method in ("tmm", "layered_tmm"):
        llr_state = to_min_domain(L_ch.astype(np.float64))
    hard = np.zeros(code.n_sym, dtype=int)

    for t in range(max_iters):
        if method == "ems" or method == "ems_full":
            llr = _vn_llr(code, L_ch.astype(np.float64), c2v)
            hard = np.argmax(llr, axis=1)
        elif method == "tmm":
            llr_state = _vn_llr(code, llr_state, c2v)
            hard = np.argmin(llr_state, axis=1)
        elif method == "layered_tmm":
            hard = np.argmin(llr_state, axis=1)
        if syndrome_ok(code, hard):
            return hard, True, t
        if method in ("ems", "ems_full"):
            c2v = ems_cn_update(code, llr, c2v, nm, nc,
                                full=(method == "ems_full"))
        elif method == "tmm":
            for m in range(g.M):
                w = code.cn_weight[m]
                v2c = np.stack([llr_state[code.cn_links[m, d]] - c2v[m][d]
                                for d in range(w)])
                c2v[m] = tmm_cn_row(code, v2c, m)
        elif method == "layered_tmm":
            for m in range(g.M):
                w = code.cn_weight[m]
                v2c = np.stack([llr_state[code.cn_links[m, d]] - c2v[m][d]
                                for d in range(w)])
                new = tmm_cn_row(code, v2c, m)
                for d in range(w):
                    llr_state[code.cn_links[m, d]] = v2c[d] + new[d]
                c2v[m] = new
    return hard, False, max_iters
