"""Circulant-aware fused QC QSPA kernel parity (interpret mode on CPU).

The kernel (ops/pallas_qspa_qc.py) block-row-parallel layered schedule is the
grouped-layered schedule at full lane width, so its reference is
nb_decode's 'glayered_qspa' (whose greedy coloring recovers exactly the block
rows of a QC code, asserted below); flooding is plain 'qspa'.  Decisions /
ok / per-frame iteration accounting must match exactly; float messages agree
to ~1e-5 (summation order differs: stacked log-ordered matmuls vs
natural-order einsums), which the integer outputs absorb on non-degenerate
inputs.
"""

import numpy as np
import pytest

from cuda_ldpc_tpu.models.nb_code import NBCode
from cuda_ldpc_tpu.ops import nb_decode, pallas_qspa_qc
from cuda_ldpc_tpu.utils.io import NBCodeFile

from test_nb_decode import noisy_zero_llr

Z = 128


def synthetic_qc_code(q=16, NB=6, MB=2, seed=0) -> NBCode:
    """Random fully-QC NB code: every (block-row, block-col) pair is one full
    circulant with a random shift and arbitrary per-z GF coefficients —
    the structure of the shipped Tanner_74_9_Z128_GF16 file."""
    rng = np.random.default_rng(seed)
    N, M = NB * Z, MB * Z
    dv, dc = MB, NB
    vn_links = np.zeros((N, dv), dtype=np.int64)
    vn_gf = np.zeros((N, dv), dtype=np.int64)
    cn_links = np.zeros((M, dc), dtype=np.int64)
    cn_gf = np.zeros((M, dc), dtype=np.int64)
    vslot = np.zeros(N, dtype=int)
    for r in range(MB):
        for ci, c in enumerate(range(NB)):
            s = int(rng.integers(0, Z))
            g = rng.integers(1, q, size=Z)
            for z in range(Z):
                m = r * Z + z
                v = c * Z + (z + s) % Z
                cn_links[m, ci] = v
                cn_gf[m, ci] = g[z]
                vn_links[v, vslot[v]] = m
                vn_gf[v, vslot[v]] = g[z]
                vslot[v] += 1
    f = NBCodeFile(N, M, q, dv, dc,
                   np.full(N, dv, dtype=np.int64),
                   np.full(M, dc, dtype=np.int64),
                   vn_links, vn_gf, cn_links, cn_gf)
    return NBCode.from_file(f, name=f"synthetic_qc_gf{q}")


@pytest.fixture(scope="module")
def qc_code():
    return synthetic_qc_code()


def _llr(code, batch, seed=0, scale=2.2):
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp
    return jnp.asarray(noisy_zero_llr(code, rng, batch, scale=scale))


def test_plan_structure(qc_code):
    plan = pallas_qspa_qc.make_plan(qc_code)
    assert plan is not None and pallas_qspa_qc.supports(qc_code)
    assert plan.EB == 12 and plan.Z == Z and plan.NB == 6 and plan.MB == 2
    # log tables: sym[1+j] = alpha^j covers GF(q)* exactly once
    assert sorted(plan.sym.tolist()) == list(range(qc_code.q))
    # greedy coloring of a QC code == its block rows in order (the layered
    # kernel's parity reference, see decode_layered docstring)
    groups = nb_decode.row_groups(qc_code.cn_links, qc_code.cn_mask)
    assert len(groups) == plan.MB
    for r, g in enumerate(groups):
        np.testing.assert_array_equal(g, np.arange(r * Z, (r + 1) * Z))


def test_flooding_matches_jnp_qspa(qc_code):
    L = _llr(qc_code, batch=4)
    ref = nb_decode.decode(L, qc_code, "qspa", 6)
    got = pallas_qspa_qc.decode_flooding(L, qc_code, 6, tile_b=2,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hard), np.asarray(ref.hard))
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
    np.testing.assert_array_equal(np.asarray(got.iters),
                                  np.asarray(ref.iters))


def test_layered_matches_jnp_glayered(qc_code):
    L = _llr(qc_code, batch=4, seed=3)
    ref = nb_decode.decode(L, qc_code, "glayered_qspa", 6)
    got = pallas_qspa_qc.decode_layered(L, qc_code, 6, tile_b=2,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hard), np.asarray(ref.hard))
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
    np.testing.assert_array_equal(np.asarray(got.iters),
                                  np.asarray(ref.iters))


def test_padded_batch(qc_code):
    """B not a multiple of tile_b: padded frames must not perturb results."""
    L = _llr(qc_code, batch=3, seed=5)
    ref = nb_decode.decode(L, qc_code, "qspa", 5)
    got = pallas_qspa_qc.decode_flooding(L, qc_code, 5, tile_b=2,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hard), np.asarray(ref.hard))
    np.testing.assert_array_equal(np.asarray(got.iters),
                                  np.asarray(ref.iters))


def test_zero_iters(qc_code):
    L = _llr(qc_code, batch=2, seed=7)
    got = pallas_qspa_qc.decode_flooding(L, qc_code, 0, tile_b=2,
                                         interpret=True)
    assert not np.asarray(got.ok).any()
    assert (np.asarray(got.hard) == 0).all()
    assert (np.asarray(got.iters) == 0).all()


def test_tanner_plan():
    code = NBCode.from_registry("Tanner_74_9_Z128_GF16")
    assert pallas_qspa_qc.supports(code)
    plan = pallas_qspa_qc.make_plan(code)
    assert (plan.NB, plan.MB, plan.EB, plan.q) == (74, 9, 185, 16)
    # every block edge of every block-row appears exactly once
    assert sum(len(r) for r in plan.row_edges) == 185
    # non-QC codes are rejected (BDS GF(64) is a random adjacency file)
    bds = NBCode.from_registry("BDS.576.288.GF.64")
    assert not pallas_qspa_qc.supports(bds)


@pytest.mark.slow
def test_tpu_compiled_parity_tanner():
    """Mosaic-compiled QC kernel parity on the real device (skips off-TPU)."""
    import jax
    if jax.devices()[0].platform == "cpu":
        pytest.skip("needs TPU")
    from cuda_ldpc_tpu.ops import channel, demod
    from cuda_ldpc_tpu.utils.constellations import constellation
    code = NBCode.from_registry("Tanner_74_9_Z128_GF16")
    sigma = channel.sigma_from_snr(4.5, code.rate, "ebn0", 1.0)
    tx = np.zeros(code.bit_length, dtype=np.int64)
    L = demod.nb_channel_llr(jax.random.PRNGKey(3), tx, constellation(2),
                             sigma, batch=8, q=code.q)
    got = jax.jit(lambda x: pallas_qspa_qc.decode_layered(x, code, 10))(L)
    ref = jax.jit(lambda x: nb_decode.decode(x, code, "glayered_qspa", 10))(L)
    np.testing.assert_array_equal(np.asarray(got.hard), np.asarray(ref.hard))
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
    di = np.asarray(got.iters).astype(int) - np.asarray(ref.iters)
    assert (np.abs(di) <= 1).all()
