"""Native host library vs the pure-Python reference-RNG implementation."""

import numpy as np
import pytest

from cuda_ldpc_tpu.utils import lcg as pylcg
from cuda_ldpc_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_lcg_stream_matches_python():
    got, seeds = native.lcg_uniforms(1000)
    ref = pylcg.ReferenceLCG().uniforms(1000)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)
    # seeds advance deterministically and continue the stream
    got2, _ = native.lcg_uniforms(10, seeds=seeds)
    ref2 = pylcg.ReferenceLCG(seeds).uniforms(10)
    np.testing.assert_allclose(got2, ref2, atol=1e-12)


def test_awgn_binary_matches_python():
    cw = np.zeros(64, dtype=np.uint8)
    cw[::3] = 1
    got, _ = native.awgn_binary(cw, 0.7, 5)
    ref = pylcg.awgn_binary(pylcg.ReferenceLCG(), cw, 0.7, 5)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_awgn_complex_matches_python():
    tx = np.array([1 + 1j, -1 + 0.5j, 0.25 - 1j])
    got, _ = native.awgn_complex(tx, 0.5)
    ref = pylcg.awgn_nb(pylcg.ReferenceLCG(), tx, 0.5)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_scan_ints_matches_python(tmp_path):
    """Native integer-file scanner vs Python tokenization, incl. negatives,
    arbitrary separators, and buffer growth."""
    p = tmp_path / "ints.txt"
    rng = np.random.default_rng(0)
    vals = rng.integers(-5000, 5000, size=4096)
    p.write_text("  ".join(str(v) for v in vals[:100]) + "\n" +
                 "\n".join(str(v) for v in vals[100:]))
    got = native.scan_ints(str(p))
    np.testing.assert_array_equal(got, vals)
    # forced buffer growth path
    got2 = native.scan_ints(str(p), max_out=7)
    np.testing.assert_array_equal(got2, vals)


def test_scan_ints_on_shipped_codes():
    """Every registry code file parses identically through the native scan
    and the Python fallback (parse_* call whichever is available; this pins
    both paths)."""
    import pathlib

    from cuda_ldpc_tpu.utils import io as ldpc_io
    for name, sub in [("J4_L24_Z96_BlockH", "bldpc_实习"),
                      ("BDS.576.288.GF.64", "myNBLDPC")]:
        p = pathlib.Path("/root/reference") / sub / f"{name}.txt"
        if not p.is_file():
            pytest.skip("reference assets unavailable")
        a = native.scan_ints(str(p))
        b = np.array(p.read_text().split(), dtype=np.int64)
        np.testing.assert_array_equal(a, b)


def test_native_is_fast():
    import time
    cw = np.zeros(2304, dtype=np.uint8)
    t0 = time.time()
    native.awgn_binary(cw, 0.7, 100)   # 230k samples
    assert time.time() - t0 < 1.0
