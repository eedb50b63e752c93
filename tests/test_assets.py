"""Loaders: BlockH matrices, NB adjacency files, constellations."""

import numpy as np
import pytest

from cuda_ldpc_tpu.models.qc_binary import QCBinaryCode
from cuda_ldpc_tpu.utils import constellations, io as ldpc_io, registry


@pytest.mark.parametrize("name", registry.BINARY_CODES)
def test_binary_codes_load(name):
    try:
        code = QCBinaryCode.from_registry(name)
    except FileNotFoundError:
        pytest.skip(f"{name} assets not available")
    assert code.n == code.L * code.Z
    assert code.m == code.J * code.Z
    assert code.k == code.n - code.m
    assert code.num_edges == (code.base != -1).sum()
    # weight ranges of the reference's validation (Simulation.cu:342-353) hold
    # for its own shipped PON config
    if name == "PON_LDPC":
        assert code.J == 12 and code.L == 69 and code.Z == 256
        assert code.row_weights.max() == 23 and code.row_weights.min() >= 22
        assert 3 <= code.col_weights.min() and code.col_weights.max() <= 12


@pytest.mark.parametrize("name,dims", [
    ("BDS.576.288.GF.64", (96, 48, 64, 2, 4)),
    ("LDPC_N96_K48_GF256_d1_exp", (12, 6, 256, 2, 4)),
    ("LDPC_N576_K480_GF256_exp", (72, 12, 256, 2, 12)),
    ("Tanner_74_9_Z128_GF16", (9472, 1152, 16, 3, 21)),
])
def test_nb_codes_load(name, dims):
    try:
        f = registry.load_nb_code_file(name)
    except FileNotFoundError:
        pytest.skip(f"{name} assets not available")
    n, m, q, max_dv, max_dc = dims
    assert (f.n_sym, f.m_sym, f.q) == (n, m, q)
    assert f.max_dv == max_dv and f.max_dc == max_dc
    # adjacency consistency: VN->CN edges must mirror CN->VN edges w/ same coeff
    for i in range(min(8, f.n_sym)):
        for d in range(f.vn_weight[i]):
            cn = f.vn_links[i, d]
            slots = np.nonzero(f.cn_links[cn] == i)[0]
            assert len(slots) == 1
            assert f.cn_gf[cn, slots[0]] == f.vn_gf[i, d]


def test_constellation_bpsk():
    pts = constellations.constellation(2)
    np.testing.assert_allclose(pts, [1, -1])


@pytest.mark.parametrize("n_qam,fname,atol", [
    (2, "BPSK.txt", 0),
    (64, "GRAY_64QAM.txt", 1e-7),
    (256, "GRAY_256QAM.txt", 1e-4),   # shipped file rounds to 4 decimals
])
def test_constellations_match_reference(n_qam, fname, atol):
    path = f"/root/reference/myNBLDPC/Constellation/{fname}"
    import os
    if not os.path.isfile(path):
        pytest.skip("reference constellations not available")
    ref = ldpc_io.parse_constellation(path, n_qam)
    gen = constellations.constellation(n_qam)
    np.testing.assert_allclose(gen, ref, atol=atol)
    if n_qam > 2:
        assert abs(np.mean(np.abs(gen) ** 2) - 1.0) < 1e-12
