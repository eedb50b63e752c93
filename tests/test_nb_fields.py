"""NB decoders across the full shipped GF table range.

The reference ships arithmetic tables for q in {4..512}
(myNBLDPC/GF/Arith.Table.GF.*.txt) but code files only for GF(16/64/256);
its decoders are nonetheless generic in GFQ (myNBLDPC/src/GF.cpp:68-117).
These tests pin the same property here: every decoder works over every
table order, on synthetic (dv=2, dc=4)-regular codes like the shipped BDS
GF(64) code's profile (BDS.576.288.GF.64.txt header).
"""

import jax
import numpy as np
import pytest

from cuda_ldpc_tpu.models.nb_code import NBCode
from cuda_ldpc_tpu.ops import channel, demod, nb_decode
from cuda_ldpc_tpu.utils.constellations import constellation
from cuda_ldpc_tpu.utils.io import NBCodeFile


def make_regular_code(q: int, M: int = 6, dv: int = 2, dc: int = 4,
                      seed: int = 0) -> NBCode:
    """Random (dv, dc)-regular GF(q) code via stub matching (no double edges)."""
    N = M * dc // dv
    rng = np.random.default_rng(seed)
    for _ in range(500):
        stubs = np.repeat(np.arange(N), dv)
        rng.shuffle(stubs)
        cn_links = stubs.reshape(M, dc)
        if all(len(set(row)) == dc for row in cn_links.tolist()):
            break
    else:
        raise RuntimeError("no simple graph found")
    cn_gf = rng.integers(1, q, size=(M, dc))
    vn_links = [[] for _ in range(N)]
    vn_gf = [[] for _ in range(N)]
    for m in range(M):
        for d in range(dc):
            v = int(cn_links[m, d])
            vn_links[v].append(m)
            vn_gf[v].append(int(cn_gf[m, d]))
    f = NBCodeFile(
        n_sym=N, m_sym=M, q=q, max_dv=dv, max_dc=dc,
        vn_weight=np.full(N, dv, dtype=np.int64),
        cn_weight=np.full(M, dc, dtype=np.int64),
        vn_links=np.array(vn_links, dtype=np.int64),
        vn_gf=np.array(vn_gf, dtype=np.int64),
        cn_links=cn_links.astype(np.int64),
        cn_gf=cn_gf.astype(np.int64))
    return NBCode.from_file(f, name=f"synthetic-GF{q}")


@pytest.mark.parametrize("q", [4, 8, 16, 32, 64, 128, 256, 512])
def test_qspa_decodes_every_field_order(q):
    code = make_regular_code(q)
    sigma = channel.sigma_from_snr(7.0, code.rate, "ebn0", 1.0)
    L = demod.nb_channel_llr(jax.random.PRNGKey(q),
                             np.zeros(code.bit_length, int),
                             constellation(2), sigma, batch=16, q=q)
    res = nb_decode.make_decoder(code, method="qspa", max_iters=10)(L)
    assert bool(np.asarray(res.ok).all())
    assert not np.asarray(res.hard).any()


@pytest.mark.parametrize("q", [4, 32, 512])
@pytest.mark.parametrize("method", ["ems", "ems_full", "tmm", "layered_tmm"])
def test_all_methods_on_unshipped_orders(method, q):
    """The field orders with tables but no shipped code file."""
    code = make_regular_code(q, seed=1)
    sigma = channel.sigma_from_snr(8.0, code.rate, "ebn0", 1.0)
    L = demod.nb_channel_llr(jax.random.PRNGKey(3 * q),
                             np.zeros(code.bit_length, int),
                             constellation(2), sigma, batch=8, q=q)
    res = nb_decode.make_decoder(code, method=method, max_iters=10)(L)
    assert bool(np.asarray(res.ok).all()), method
    assert not np.asarray(res.hard).any()


def test_syndrome_consistency_random_words(q=32):
    """NBCode.syndrome on random symbol vectors: zero iff decoder's on-device
    check agrees (spot check of the static graph tensors for synthetic codes)."""
    code = make_regular_code(q, seed=2)
    rng = np.random.default_rng(5)
    words = rng.integers(0, q, size=(32, code.n_sym))
    # craft genuinely valid codewords by zeroing: all-zero is valid
    words[0] = 0
    syn = np.stack([code.syndrome(w) for w in words])
    assert (syn[0] == 0).all()
    # decoder-side check via a 0-iteration decode: feed certain LLRs for each
    # word and confirm ok == (syndrome == 0)
    onehot = np.zeros((32, code.n_sym, q), dtype=np.float32)
    for b in range(32):
        onehot[b, np.arange(code.n_sym), words[b]] = 50.0
    res = nb_decode.make_decoder(code, method="qspa", max_iters=1,
                                 early_stop=True)(onehot)
    np.testing.assert_array_equal(np.asarray(res.ok),
                                  (syn == 0).all(axis=1))
