"""Independent NumPy oracles (dense-H formulations) used to validate the
jnp/Pallas decoders.  Deliberately written against the *mathematical* spec, not
the reference's memory layout, so agreement is meaningful."""

from __future__ import annotations

import numpy as np


def minsum_flooding_dense(llr: np.ndarray, H: np.ndarray, num_iters: int,
                          alpha: float = 1.0, beta: float = 0.0):
    """Flooding min-sum on a dense parity-check matrix.

    llr: [n] channel LLRs (positive = bit 0).  Returns (hard [n], total [n],
    iters, ok) with the same schedule as the jnp decoder: per iteration
    VN (totals + hard) -> syndrome check -> CN; stops when H.hard == 0.
    """
    m, n = H.shape
    rows = [np.nonzero(H[i])[0] for i in range(m)]
    R = np.zeros((m, n))
    hard = np.zeros(n, dtype=bool)
    total = llr.copy()
    it = 0
    ok = False
    while it < num_iters and not ok:
        it += 1
        total = llr + R.sum(axis=0)
        hard = total < 0
        Q = np.where(H > 0, total[None, :] - R, 0.0)
        for i in range(m):
            vs = rows[i]
            q = Q[i, vs]
            sgn = np.where(q < 0, -1.0, 1.0)
            mag = np.abs(q)
            sp = np.prod(sgn)
            amin = int(np.argmin(mag))
            min1 = mag[amin]
            rest = np.delete(mag, amin)
            min2 = rest.min()
            out = np.where(np.arange(len(vs)) == amin, min2, min1)
            if beta:
                out = np.maximum(out - beta, 0.0)
            R[i, vs] = alpha * sp * sgn * out
        ok = not np.any((H @ hard.astype(np.int64)) % 2)
    return hard, total, it, ok


def bp_flooding_dense(llr: np.ndarray, H: np.ndarray, num_iters: int):
    """Flooding exact sum-product (tanh rule) on a dense parity-check matrix,
    float64 tanh-product form R_i = 2 atanh(prod_{j!=i} tanh(Q_j/2)) —
    deliberately a different algebraic form from the decoder's phi-domain
    sign/magnitude formulation so agreement is meaningful.

    llr: [n] true channel LLRs.  Returns (hard [n], total [n], iters, ok)
    with the same schedule as the jnp decoder.
    """
    m, n = H.shape
    rows = [np.nonzero(H[i])[0] for i in range(m)]
    R = np.zeros((m, n))
    hard = np.zeros(n, dtype=bool)
    total = llr.copy()
    it = 0
    ok = False
    tiny = 1e-300
    while it < num_iters and not ok:
        it += 1
        total = llr + R.sum(axis=0)
        hard = total < 0
        Q = np.where(H > 0, total[None, :] - R, 0.0)
        for i in range(m):
            vs = rows[i]
            t = np.tanh(np.clip(Q[i, vs], -34.0, 34.0) / 2.0)
            t = np.where(np.abs(t) < tiny, tiny, t)
            prod_all = np.prod(t)
            r = np.clip(prod_all / t, -1 + 1e-15, 1 - 1e-15)
            R[i, vs] = 2.0 * np.arctanh(r)
        ok = not np.any((H @ hard.astype(np.int64)) % 2)
    return hard, total, it, ok
