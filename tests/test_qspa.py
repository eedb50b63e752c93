"""FFT-QSPA decoder tests.

The CN core is checked against a brute-force probability-domain sum-product
(direct XOR-group convolution in numpy — no Hadamard transform), and the full
decoder end-to-end against the noiseless channel and ems_full at a moderate
SNR (exact sum-product must not be worse than the max-sum approximation by
more than Monte-Carlo noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_ldpc_tpu import NBCode
from cuda_ldpc_tpu.ops import channel, demod, nb_decode
from cuda_ldpc_tpu.utils.constellations import constellation


def _brute_cn_update(code, v2c, row):
    """Brute-force sum-product c2v for one CN row of a real code graph."""
    q = code.q
    mul = code.mul_table
    h = code.cn_gf[row]
    mask = code.cn_mask[row]
    dc = code.max_dc
    # per-edge pmf of y = h*x
    pmfs = []
    for d in range(dc):
        if not mask[d]:
            e = np.zeros(q)
            e[0] = 1.0
            pmfs.append(e)
            continue
        ex = np.exp(v2c[d] - v2c[d].max())
        p_x = ex / ex.sum()
        p_y = np.zeros(q)
        for x in range(q):
            p_y[mul[h[d], x]] += p_x[x]
        pmfs.append(p_y)

    def conv(a, b):
        out = np.zeros(q)
        for u in range(q):
            out += a[u] * b[np.arange(q) ^ u]
        return out

    c2v = np.zeros((dc, q))
    for dout in range(dc):
        acc = np.zeros(q)
        acc[0] = 1.0
        for d in range(dc):
            if d != dout:
                acc = conv(acc, pmfs[d])
        # message about VN symbol k: pmf at y = h*k
        p_k = acc[mul[h[dout], np.arange(q)]] if mask[dout] else acc
        p_k = np.maximum(p_k, 1e-30)
        llr = np.log(p_k)
        c2v[dout] = llr - llr[0]
    return np.where(mask[:, None], c2v, 0.0)


def test_qspa_cn_core_matches_bruteforce():
    code = NBCode.from_registry("BDS.576.288.GF.64")
    g = nb_decode.build_graph(code)
    rng = np.random.default_rng(0)
    v2c = rng.normal(size=(1, g.M, g.dc, g.q)).astype(np.float32) * 2.0
    v2c[..., 0] = 0.0
    out = np.asarray(nb_decode._qspa_cn_core(
        jnp.asarray(v2c), jnp.asarray(g.cn_mask),
        jnp.asarray(g.h_onehot, dtype=jnp.float32),
        jnp.asarray(nb_decode._hadamard(g.q)), g.dc, g.q))
    for row in (0, 7, g.M - 1):
        ref = _brute_cn_update(code, v2c[0, row], row)
        np.testing.assert_allclose(out[0, row], ref, rtol=2e-3, atol=2e-3)


def test_qspa_noiseless_decodes_zero():
    code = NBCode.from_registry("BDS.576.288.GF.64")
    sigma = 0.3
    L = demod.nb_channel_llr(jax.random.PRNGKey(3),
                             np.zeros(code.bit_length, int),
                             constellation(2), sigma, batch=8, q=code.q)
    res = nb_decode.decode_qspa(L, code, max_iters=20)
    assert bool(np.asarray(res.ok).all())
    assert not np.asarray(res.hard).any()
    assert int(np.asarray(res.iters).max()) <= 3


def test_layered_qspa_noiseless_decodes_zero():
    code = NBCode.from_registry("BDS.576.288.GF.64")
    L = demod.nb_channel_llr(jax.random.PRNGKey(4),
                             np.zeros(code.bit_length, int),
                             constellation(2), 0.3, batch=8, q=code.q)
    res = nb_decode.decode_layered_qspa(L, code, max_iters=20)
    assert bool(np.asarray(res.ok).all())
    assert not np.asarray(res.hard).any()
    assert int(np.asarray(res.iters).max()) <= 3


def test_row_groups_partition_and_conflict_free():
    """Greedy coloring: groups partition the rows; no two rows in a group
    share a VN; the QC-lifted Tanner code recovers its 9 block rows."""
    for name, expect_groups in [("BDS.576.288.GF.64", None),
                                ("Tanner_74_9_Z128_GF16", 9)]:
        code = NBCode.from_registry(name)
        g = nb_decode.build_graph(code)
        groups = nb_decode.row_groups(g.cn_links, g.cn_mask)
        assert sorted(int(m) for rows in groups for m in rows) == list(range(g.M))
        for rows in groups:
            vns = [int(v) for m in rows
                   for v, ok in zip(g.cn_links[m], g.cn_mask[m]) if ok]
            assert len(vns) == len(set(vns))
        if expect_groups is not None:
            assert len(groups) == expect_groups
            assert all(len(rows) == g.M // expect_groups for rows in groups)


@pytest.mark.parametrize("method", ["glayered_qspa", "glayered_tmm"])
def test_glayered_noiseless_decodes_zero(method):
    code = NBCode.from_registry("BDS.576.288.GF.64")
    L = demod.nb_channel_llr(jax.random.PRNGKey(4),
                             np.zeros(code.bit_length, int),
                             constellation(2), 0.3, batch=8, q=code.q)
    res = nb_decode.decode(L, code, method, max_iters=20)
    assert bool(np.asarray(res.ok).all())
    assert not np.asarray(res.hard).any()
    assert int(np.asarray(res.iters).max()) <= 4


def test_glayered_qspa_tracks_layered_qspa():
    """Grouped-layered must converge like serial layered (same information
    flow granularity up to group boundaries): comparable mean iterations and
    binomially-compatible FER on the same channel draws."""
    from cuda_ldpc_tpu.utils import stats as st
    code = NBCode.from_registry("BDS.576.288.GF.64")
    sigma = channel.sigma_from_snr(1.0, code.rate, "ebn0", 1.0)
    L = demod.nb_channel_llr(jax.random.PRNGKey(11),
                             np.zeros(code.bit_length, int),
                             constellation(2), sigma, batch=512, q=code.q)
    a = nb_decode.decode(L, code, "layered_qspa", max_iters=10)
    b = nb_decode.decode(L, code, "glayered_qspa", max_iters=10)
    fa = int((np.asarray(a.hard) != 0).any(axis=1).sum())
    fb = int((np.asarray(b.hard) != 0).any(axis=1).sum())
    assert st.rates_compatible(fa, 512, fb, 512)
    ita = float(np.asarray(a.iters).mean())
    itb = float(np.asarray(b.iters).mean())
    assert abs(ita - itb) < 1.0


def test_layered_qspa_converges_faster_or_equal():
    """Layered schedule propagates fresh messages within an iteration, so it
    must need no more iterations than flooding on the same realizations."""
    code = NBCode.from_registry("BDS.576.288.GF.64")
    sigma = channel.sigma_from_snr(2.5, code.rate, "ebn0", 1.0)
    L = demod.nb_channel_llr(jax.random.PRNGKey(6),
                             np.zeros(code.bit_length, int),
                             constellation(2), sigma, batch=64, q=code.q)
    rf = nb_decode.decode_qspa(L, code, max_iters=20)
    rl = nb_decode.decode_layered_qspa(L, code, max_iters=20)
    ok_f, ok_l = np.asarray(rf.ok), np.asarray(rl.ok)
    assert ok_l.sum() >= ok_f.sum() - 1   # never meaningfully worse
    both = ok_f & ok_l
    assert (np.asarray(rl.iters)[both].mean()
            <= np.asarray(rf.iters)[both].mean())


def test_layered_qspa_first_sweep_row0_matches_flooding():
    """Before any write-back, row 0's first c2v update is identical to
    flooding's (the schedules only diverge after the first row write)."""
    code = NBCode.from_registry("LDPC_N96_K48_GF256_d1_exp")
    g = nb_decode.build_graph(code)
    rng = np.random.default_rng(2)
    L = rng.normal(size=(2, code.n_sym, code.q)).astype(np.float32)
    L[..., 0] = 0.0
    v2c = jnp.asarray(L)[:, g.cn_links]          # c2v = 0 at sweep start
    full = nb_decode._qspa_cn_core(
        v2c, jnp.asarray(g.cn_mask),
        jnp.asarray(g.h_onehot, dtype=jnp.float32),
        jnp.asarray(nb_decode._hadamard(g.q)), g.dc, g.q)
    row0 = nb_decode._qspa_cn_core(
        v2c[:, :1], jnp.asarray(g.cn_mask[:1]),
        jnp.asarray(g.h_onehot[:1], dtype=jnp.float32),
        jnp.asarray(nb_decode._hadamard(g.q)), g.dc, g.q)
    np.testing.assert_allclose(np.asarray(full[:, 0]), np.asarray(row0[:, 0]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_qspa_fer_not_worse_than_ems_full():
    code = NBCode.from_registry("BDS.576.288.GF.64")
    sigma = channel.sigma_from_snr(1.0, code.rate, "ebn0", 1.0)
    L = demod.nb_channel_llr(jax.random.PRNGKey(11),
                             np.zeros(code.bit_length, int),
                             constellation(2), sigma, batch=512, q=code.q)
    fer_q = float((np.asarray(nb_decode.decode_qspa(
        L, code, max_iters=20).hard) != 0).any(axis=1).mean())
    fer_e = float((np.asarray(nb_decode.decode_ems(
        L, code, max_iters=20, full=True).hard) != 0).any(axis=1).mean())
    # exact sum-product should match or beat the max-sum approximation
    # (allow Monte-Carlo slack on 512 frames)
    assert fer_q <= fer_e + 0.05
