"""Parity tests: vectorized NB decoders vs loop-based NumPy oracles."""

import numpy as np
import pytest

from cuda_ldpc_tpu.models.nb_code import NBCode
from cuda_ldpc_tpu.ops import demod, nb_decode
from cuda_ldpc_tpu.utils.io import NBCodeFile

import oracle_nb


def synthetic_code(q=8, N=10, M=5, dv=2, dc=4, seed=0) -> NBCode:
    """Random regular NB code (dv*N == dc*M edges), valid adjacency."""
    rng = np.random.default_rng(seed)
    for _ in range(200):
        vn_of_edge = np.repeat(np.arange(N), dv)
        cn_of_edge = np.repeat(np.arange(M), dc)
        rng.shuffle(cn_of_edge)
        pairs = set(zip(vn_of_edge.tolist(), cn_of_edge.tolist()))
        if len(pairs) != N * dv:
            continue  # duplicate edge; resample
        vn_links = np.full((N, dv), -1, dtype=np.int64)
        vn_gf = np.zeros((N, dv), dtype=np.int64)
        cn_links = np.full((M, dc), -1, dtype=np.int64)
        cn_gf = np.zeros((M, dc), dtype=np.int64)
        vslot = np.zeros(N, dtype=int)
        cslot = np.zeros(M, dtype=int)
        for vn, cn in zip(vn_of_edge, cn_of_edge):
            h = int(rng.integers(1, q))
            vn_links[vn, vslot[vn]] = cn
            vn_gf[vn, vslot[vn]] = h
            vslot[vn] += 1
            cn_links[cn, cslot[cn]] = vn
            cn_gf[cn, cslot[cn]] = h
            cslot[cn] += 1
        f = NBCodeFile(N, M, q, dv, dc,
                       np.full(N, dv, dtype=np.int64),
                       np.full(M, dc, dtype=np.int64),
                       vn_links, vn_gf, cn_links, cn_gf)
        return NBCode.from_file(f, name=f"synthetic_gf{q}")
    raise RuntimeError("failed to build a synthetic code")


def noisy_zero_llr(code, rng, batch, scale=3.0):
    """Positive-domain LLRs favouring the all-zero codeword, with noise strong
    enough that some frames need several iterations."""
    L = -scale + rng.normal(size=(batch, code.n_sym, code.q)) * 2.5
    L[..., 0] = 0.0
    return L.astype(np.float32)


def run_oracle(code, L, method, max_iters, **kw):
    outs = [oracle_nb.decode_nb(code, L[b], method, max_iters, **kw)
            for b in range(L.shape[0])]
    hard = np.stack([o[0] for o in outs])
    ok = np.array([o[1] for o in outs])
    iters = np.array([o[2] for o in outs])
    return hard, ok, iters


@pytest.fixture(scope="module")
def small_code():
    return synthetic_code()


@pytest.mark.parametrize("method,kw", [
    ("ems", dict(nm=2, nc=2)),
    ("ems", dict(nm=3, nc=2)),
    ("ems", dict(nm=2, nc=1)),
    ("ems", dict(nm=2, nc=3)),      # the reference's Nc == maxdc-1 sentinel
    ("ems", dict(nm=3, nc=3)),
    ("tmm", {}),
    ("layered_tmm", {}),
])
def test_decoder_matches_oracle(small_code, method, kw):
    code = small_code
    rng = np.random.default_rng(42)
    L = noisy_zero_llr(code, rng, batch=8)
    dec = nb_decode.make_decoder(code, method=method, max_iters=6, **kw)
    res = dec(L)
    hard, ok, iters = run_oracle(code, L, method, 6, **kw)
    np.testing.assert_array_equal(np.asarray(res.ok), ok)
    np.testing.assert_array_equal(np.asarray(res.iters), iters)
    np.testing.assert_array_equal(np.asarray(res.hard), hard)


@pytest.mark.parametrize("nm,nc", [(3, 3), (2, 4), (4, 3)])
def test_ems_general_nc_matches_oracle(nm, nc):
    """2 < Nc < dc-1 exercises the budgeted (max,+) DP branch of
    _ems_cn_core (arbitrary EMS_NC, like the reference's recursive
    ConstructConf, myNBLDPC/src/LDPC_Decoder.cpp:319-359)."""
    code = synthetic_code(q=8, N=12, M=4, dv=2, dc=6, seed=5)
    rng = np.random.default_rng(11)
    L = noisy_zero_llr(code, rng, batch=4)
    dec = nb_decode.make_decoder(code, method="ems", max_iters=4, nm=nm, nc=nc)
    res = dec(L)
    hard, ok, iters = run_oracle(code, L, "ems", 4, nm=nm, nc=nc)
    np.testing.assert_array_equal(np.asarray(res.ok), ok)
    np.testing.assert_array_equal(np.asarray(res.iters), iters)
    np.testing.assert_array_equal(np.asarray(res.hard), hard)


def test_ems_full_matches_bruteforce(small_code):
    code = small_code
    rng = np.random.default_rng(7)
    L = noisy_zero_llr(code, rng, batch=3)
    dec = nb_decode.make_decoder(code, method="ems_full", max_iters=3)
    res = dec(L)
    hard, ok, iters = run_oracle(code, L, "ems_full", 3)
    np.testing.assert_array_equal(np.asarray(res.ok), ok)
    np.testing.assert_array_equal(np.asarray(res.iters), iters)
    np.testing.assert_array_equal(np.asarray(res.hard), hard)


def test_clean_channel_zero_iters(small_code):
    code = small_code
    L = np.zeros((2, code.n_sym, code.q), dtype=np.float32)
    L[..., 1:] = -10.0
    for method in ("ems", "tmm", "layered_tmm"):
        dec = nb_decode.make_decoder(code, method=method, max_iters=5)
        res = dec(L)
        assert bool(np.all(np.asarray(res.ok)))
        np.testing.assert_array_equal(np.asarray(res.iters), 0)
        np.testing.assert_array_equal(np.asarray(res.hard), 0)


@pytest.mark.parametrize("method", ["ems", "tmm"])
def test_shipped_gf64_code(method):
    """Parity on the reference's flagship GF(64) code (irregular adjacency)."""
    code = NBCode.from_registry("BDS.576.288.GF.64")
    rng = np.random.default_rng(3)
    L = noisy_zero_llr(code, rng, batch=2, scale=4.0)
    dec = nb_decode.make_decoder(code, method=method, max_iters=3)
    res = dec(L)
    hard, ok, iters = run_oracle(code, L, method, 3)
    np.testing.assert_array_equal(np.asarray(res.ok), ok)
    np.testing.assert_array_equal(np.asarray(res.iters), iters)
    np.testing.assert_array_equal(np.asarray(res.hard), hard)


def test_demod_bpsk_formula():
    """Symbol LLR composition matches the reference formula
    (myNBLDPC/src/LDPC_Decoder.cpp:139-158)."""
    q, q_bit, sigma = 16, 4, 0.8
    rng = np.random.default_rng(0)
    y = rng.normal(size=(2, 3, q_bit)).astype(np.float32)
    L = np.asarray(demod.llr_bpsk(y, sigma, q))
    bit_llr = -2.0 * y / sigma**2
    for b in range(2):
        for s in range(3):
            for sym in range(q):
                want = sum(bit_llr[b, s, j] for j in range(q_bit)
                           if sym & (1 << j))
                assert abs(L[b, s, sym] - want) < 2e-3
    assert np.all(L[..., 0] == 0)


def test_demod_qam_distance_form():
    """QAM LLR equals (|y-c0|^2 - |y-cs|^2) / (2 sigma^2)."""
    from cuda_ldpc_tpu.utils.constellations import constellation
    pts = constellation(64)
    sigma = 0.5
    rng = np.random.default_rng(1)
    y = rng.normal(size=(4, 2)).astype(np.float32)
    L = np.asarray(demod.llr_qam(y[None], sigma, pts))[0]
    yc = y[:, 0] + 1j * y[:, 1]
    want = (np.abs(yc[:, None] - pts[0]) ** 2
            - np.abs(yc[:, None] - pts[None, :]) ** 2) / (2 * sigma**2)
    np.testing.assert_allclose(L, want, atol=1e-3)


def test_qam_channel_end_to_end():
    """GF(64) code over 64-QAM (one symbol per constellation point, like the
    reference's Modulate) decodes cleanly at high SNR, fails at very low."""
    import jax
    from cuda_ldpc_tpu.models.nb_code import NBCode
    from cuda_ldpc_tpu.ops import channel
    from cuda_ldpc_tpu.utils.constellations import constellation

    code = NBCode.from_registry("BDS.576.288.GF.64")
    pts = constellation(64)
    tx = np.zeros(code.n_sym, dtype=int)
    dec = nb_decode.make_decoder(code, method="ems_full", max_iters=10)
    for ebn0, want_ok in [(16.0, True), (-5.0, False)]:
        sigma = channel.sigma_from_snr(ebn0, code.rate, "ebn0", 6.0)
        L = demod.nb_channel_llr(jax.random.PRNGKey(2), tx, pts, sigma,
                                 batch=4, q=code.q)
        res = dec(L)
        assert bool(np.all(np.asarray(res.ok))) == want_ok


def test_nb_channel_clean_decodes():
    """End-to-end: modulate the all-zero codeword, tiny noise, EMS decodes in
    0 iterations."""
    import jax
    from cuda_ldpc_tpu.utils.constellations import constellation
    code = synthetic_code(q=16, N=8, M=4, dv=2, dc=4, seed=3)
    pts = constellation(2)
    bits = np.zeros(code.n_sym * code.q_bit, dtype=int)
    L = demod.nb_channel_llr(jax.random.PRNGKey(0), bits, pts, 0.05,
                             batch=2, q=code.q)
    dec = nb_decode.make_decoder(code, method="ems", max_iters=5)
    res = dec(L)
    assert bool(np.all(np.asarray(res.ok)))
    np.testing.assert_array_equal(np.asarray(res.hard), 0)
