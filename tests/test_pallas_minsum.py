"""Fused Pallas min-sum kernel vs the jnp reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_ldpc_tpu import QCBinaryCode
from cuda_ldpc_tpu.ops import channel, minsum, pallas_minsum


@pytest.fixture(scope="module")
def code():
    return QCBinaryCode.from_registry("J4_L24_Z256")


def _chan(code, sigma, batch, seed=0):
    cw = jnp.zeros((code.L, code.Z))
    return channel.bpsk_awgn_llr(jax.random.PRNGKey(seed), cw, sigma, batch)


@pytest.mark.parametrize("check,early", [("zero", True), ("zero", False),
                                         ("syndrome", True), ("none", False)])
def test_matches_jnp(code, check, early):
    chan = _chan(code, 0.55, 16)
    a = minsum.decode_flooding(chan, code, 6, check=check, early_stop=early)
    b = pallas_minsum.decode_flooding(chan, code, 6, check=check,
                                      early_stop=early, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
    np.testing.assert_array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert int(a.iters) == int(b.iters)


@pytest.mark.parametrize("check", ["zero", "syndrome"])
def test_layered_matches_jnp(code, check):
    chan = _chan(code, 0.55, 16, seed=7)
    a = minsum.decode_layered(chan, code, 5, check=check)
    b = pallas_minsum.decode_layered(chan, code, 5, check=check,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
    np.testing.assert_array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert int(a.iters) == int(b.iters)


@pytest.mark.parametrize("name", ["J4_L24_Z256", "J4_L24_Z96"])
def test_bp_rule_matches_jnp(name):
    """rule='bp' (exact sum-product, phi domain) in the fused kernel vs the
    jnp path — flooding and layered, full-lane and padded-lane codes.  BP
    needs true LLRs 2y/sigma^2 (minsum._cn_bp docstring)."""
    c = QCBinaryCode.from_registry(name)
    sigma = 0.62
    chan = _chan(c, sigma, 12, seed=21) * (2.0 / sigma ** 2)
    a = minsum.decode_flooding(chan, c, 5, check="zero", rule="bp")
    b = pallas_minsum.decode_flooding(chan, c, 5, check="zero", rule="bp",
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
    np.testing.assert_array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert int(a.iters) == int(b.iters)
    d = minsum.decode_layered(chan, c, 4, check="syndrome", rule="bp")
    e = pallas_minsum.decode_layered(chan, c, 4, check="syndrome", rule="bp",
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(d.hard), np.asarray(e.hard))
    np.testing.assert_array_equal(np.asarray(d.ok), np.asarray(e.ok))


def test_alpha_beta(code):
    chan = _chan(code, 0.6, 8, seed=3)
    a = minsum.decode_flooding(chan, code, 4, alpha=0.8, beta=0.1,
                               check="zero")
    b = pallas_minsum.decode_flooding(chan, code, 4, alpha=0.8, beta=0.1,
                                      check="zero", interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))


def test_bf16_storage_close_to_f32(code):
    """bf16 VMEM storage (f32 compute) quantizes messages; decisions should
    agree on nearly every bit at a comfortable SNR."""
    chan = _chan(code, 0.5, 16, seed=9)
    a = pallas_minsum.decode_flooding(chan, code, 6, check="zero",
                                      interpret=True)
    b = pallas_minsum.decode_flooding(chan, code, 6, check="zero",
                                      msg_dtype=jnp.bfloat16, interpret=True)
    agree = np.mean(np.asarray(a.hard) == np.asarray(b.hard))
    assert agree > 0.999
    assert abs(np.asarray(a.ok).mean() - np.asarray(b.ok).mean()) <= 0.25


def test_ragged_batch_padding(code):
    chan = _chan(code, 0.6, 11, seed=5)   # not a multiple of tile_b
    a = minsum.decode_flooding(chan, code, 4, check="zero")
    b = pallas_minsum.decode_flooding(chan, code, 4, check="zero",
                                      interpret=True)
    assert np.asarray(b.hard).shape[0] == 11
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
    np.testing.assert_array_equal(np.asarray(a.ok), np.asarray(b.ok))


def test_unsupported_z_raises():
    tiny = QCBinaryCode(name="tiny", base=np.array([[0, 1, 2, -1],
                                                    [3, -1, 0, 1]]), Z=4)
    assert not pallas_minsum.supports(tiny)
    with pytest.raises(ValueError, match="Z % 128"):
        pallas_minsum.decode_flooding(jnp.zeros((2, tiny.L, tiny.Z)),
                                      tiny, 2, interpret=True)


@pytest.mark.parametrize("name", ["J4_L24_Z96", "J10_L60_Z160",
                                  "J32_L64_Z64"])
def test_padded_lanes_match_jnp(name):
    """Z not a multiple of 128 runs with padded lanes (two-roll + lane-select
    circulant); results must equal the jnp path bit-exactly.  Covers all three
    non-128-multiple shipped lifting factors (96, 160, 64)."""
    c = QCBinaryCode.from_registry(name)
    assert pallas_minsum.supports(c)
    chan = _chan(c, 0.62, 9, seed=13)   # 9: also exercises batch padding
    a = minsum.decode_flooding(chan, c, 3, check="zero")
    b = pallas_minsum.decode_flooding(chan, c, 3, check="zero",
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
    np.testing.assert_array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert int(a.iters) == int(b.iters)


def test_padded_lanes_layered_and_syndrome():
    """Layered schedule + true syndrome check on a padded-lane code (the
    syndrome reduction must mask the garbage lanes)."""
    c = QCBinaryCode.from_registry("J4_L24_Z96")
    chan = _chan(c, 0.62, 9, seed=17)
    a = minsum.decode_layered(chan, c, 3, check="syndrome")
    b = pallas_minsum.decode_layered(chan, c, 3, check="syndrome",
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
    np.testing.assert_array_equal(np.asarray(a.ok), np.asarray(b.ok))


def test_zero_iters_matches_jnp(code):
    chan = _chan(code, 0.55, 8)
    a = minsum.decode_flooding(chan, code, 0, check="zero")
    b = pallas_minsum.decode_flooding(chan, code, 0, check="zero",
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
    np.testing.assert_array_equal(np.asarray(a.ok), np.asarray(b.ok))
    c = minsum.decode_layered(chan, code, 0, check="zero")
    d = pallas_minsum.decode_layered(chan, code, 0, check="zero",
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(c.hard), np.asarray(d.hard))
    np.testing.assert_array_equal(np.asarray(c.ok), np.asarray(d.ok))


def test_col_major_matches_row_major(code):
    chan = _chan(code, 0.55, 8)
    a = pallas_minsum.decode_flooding(chan, code, 5, check="zero",
                                      interpret=True)
    b = pallas_minsum.decode_flooding(chan.transpose(1, 0, 2), code, 5,
                                      check="zero", interpret=True,
                                      col_major=True)
    np.testing.assert_array_equal(np.asarray(a.hard),
                                  np.asarray(b.hard.transpose(1, 0, 2)))
    np.testing.assert_array_equal(np.asarray(a.ok), np.asarray(b.ok))
    c = pallas_minsum.decode_layered(chan.transpose(1, 0, 2), code, 5,
                                     check="zero", interpret=True,
                                     col_major=True)
    d = pallas_minsum.decode_layered(chan, code, 5, check="zero",
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(d.hard),
                                  np.asarray(c.hard.transpose(1, 0, 2)))


@pytest.mark.slow
def test_tpu_compiled_parity():
    """Mosaic-COMPILED kernel vs jnp reference on the real TPU (the interpret
    tests above cannot catch layout/roll lowering regressions).  Runs in a
    subprocess because conftest pins this process to CPU; skips cleanly when
    no TPU is reachable.  1-4 min (remote pallas compile)."""
    import os
    import pathlib
    import subprocess
    import sys
    script = r"""
import sys
import jax, numpy as np, jax.numpy as jnp
if jax.default_backend() not in ("tpu", "axon") and \
        jax.devices()[0].platform not in ("tpu", "axon"):
    print("NO_TPU"); sys.exit(0)
from cuda_ldpc_tpu import QCBinaryCode
from cuda_ldpc_tpu.ops import channel, minsum, pallas_minsum
code = QCBinaryCode.from_registry("J4_L24_Z256")
cw = jnp.zeros((code.L, code.Z))
chan = channel.bpsk_awgn_llr(jax.random.PRNGKey(11), cw, 0.55, 16)
a = minsum.decode_flooding(chan, code, 6, check="zero", early_stop=False)
b = pallas_minsum.decode_flooding(chan, code, 6, check="zero",
                                  early_stop=False)
np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
np.testing.assert_array_equal(np.asarray(a.ok), np.asarray(b.ok))
c = minsum.decode_layered(chan, code, 4, check="syndrome")
d = pallas_minsum.decode_layered(chan, code, 4, check="syndrome")
np.testing.assert_array_equal(np.asarray(c.hard), np.asarray(d.hard))
np.testing.assert_array_equal(np.asarray(c.ok), np.asarray(d.ok))
pad = QCBinaryCode.from_registry("J4_L24_Z96")   # padded-lane (Z=96 -> 128)
chan = channel.bpsk_awgn_llr(jax.random.PRNGKey(23),
                             jnp.zeros((pad.L, pad.Z)), 0.62, 16)
e = minsum.decode_flooding(chan, pad, 4, check="zero", early_stop=False)
f = pallas_minsum.decode_flooding(chan, pad, 4, check="zero",
                                  early_stop=False)
np.testing.assert_array_equal(np.asarray(e.hard), np.asarray(f.hard))
g = minsum.decode_layered(chan, pad, 4, check="syndrome")
h = pallas_minsum.decode_layered(chan, pad, 4, check="syndrome")
np.testing.assert_array_equal(np.asarray(g.hard), np.asarray(h.hard))
np.testing.assert_array_equal(np.asarray(g.ok), np.asarray(h.ok))
print("TPU_PARITY_OK")
"""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = (str(pathlib.Path(__file__).resolve().parents[1])
                         + os.pathsep + env.get("PYTHONPATH", ""))
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    if "NO_TPU" in out.stdout:
        pytest.skip("no TPU backend reachable")
    assert "TPU_PARITY_OK" in out.stdout, out.stdout + out.stderr
