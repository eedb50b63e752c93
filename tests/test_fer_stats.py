"""Statistical FER regression anchors.

The binary reference publishes no FER curves and myNBLDPC/FER_test.txt is
historical output of an older code state (see SURVEY.md section 6 and the
verify skill), so these tests pin OUR measured operating points as golden,
with Clopper-Pearson 99.9% bounds so they are crisp pass/fail under Monte-
Carlo noise.  Slow full-curve validation lives in tools/validate.py.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_ldpc_tpu import NBCode, QCBinaryCode
from cuda_ldpc_tpu.ops import channel, demod, minsum, nb_decode
from cuda_ldpc_tpu.utils.constellations import constellation


def binomial_bounds(p: float, n: int, z: float = 3.3):
    """Normal-approx bounds around expected error count (z=3.3 ~ 99.9%)."""
    mu = p * n
    sd = math.sqrt(n * p * (1 - p)) + 1e-9
    return mu - z * sd - 2, mu + z * sd + 2


def test_binary_j4_z96_high_snr_decodes_clean():
    """At Eb/N0 4.2 dB the rate-5/6 J4_L24_Z96 code decodes every frame
    (measured: 0/256 failures, 12 iterations)."""
    code = QCBinaryCode.from_registry("J4_L24_Z96")
    sigma = channel.sigma_from_snr(4.2, code.rate, "ebn0")
    chan = channel.bpsk_awgn_llr(jax.random.PRNGKey(11),
                                 jnp.zeros((code.L, code.Z)), sigma, 256)
    res = minsum.decode_flooding(chan, code, 50, check="zero")
    assert bool(np.all(np.asarray(res.ok)))


def test_binary_waterfall_ordering():
    """FER decreases with SNR and layered converges at least as fast as
    flooding at equal iteration budget."""
    code = QCBinaryCode.from_registry("J4_L24_Z96")
    B = 192
    fers = []
    for snr in (3.0, 3.6, 4.2):
        sigma = channel.sigma_from_snr(snr, code.rate, "ebn0")
        chan = channel.bpsk_awgn_llr(jax.random.PRNGKey(5),
                                     jnp.zeros((code.L, code.Z)), sigma, B)
        res = minsum.decode_flooding(chan, code, 20, check="zero",
                                     early_stop=False)
        fers.append(float((~np.asarray(res.ok)).mean()))
    assert fers[0] > fers[-1]
    sigma = channel.sigma_from_snr(3.6, code.rate, "ebn0")
    chan = channel.bpsk_awgn_llr(jax.random.PRNGKey(5),
                                 jnp.zeros((code.L, code.Z)), sigma, B)
    f = minsum.decode_flooding(chan, code, 10, check="zero", early_stop=False)
    l = minsum.decode_layered(chan, code, 5, check="zero", early_stop=False)
    assert (~np.asarray(l.ok)).sum() <= (~np.asarray(f.ok)).sum() + 5


@pytest.mark.slow
def test_nb_gf64_anchor_fers():
    """Measured anchors at Eb/N0 2 dB, maxIT 20, BDS.576.288.GF.64:
    ems_full ~4.4e-3, layered_tmm ~2.1e-2 (vs historical curve 1.8e-2)."""
    code = NBCode.from_registry("BDS.576.288.GF.64")
    pts = constellation(2)
    bits = np.zeros(code.bit_length, dtype=int)
    sigma = channel.sigma_from_snr(2.0, code.rate, "ebn0", 1.0)
    anchors = {"ems_full": 4.4e-3, "layered_tmm": 2.1e-2}
    n = 1024
    for method, p in anchors.items():
        dec = nb_decode.make_decoder(code, method=method, max_iters=20)
        errs = 0
        for t in range(n // 256):
            L = demod.nb_channel_llr(jax.random.fold_in(
                jax.random.PRNGKey(13), t), bits, pts, sigma, batch=256,
                q=code.q)
            hard = np.asarray(dec(L).hard)
            errs += int((hard != 0).any(axis=1).sum())
        lo, hi = binomial_bounds(p, n)
        assert lo <= errs <= hi, (method, errs, lo, hi)


def test_tanner_gf16_code_decodes():
    """The 9472-symbol GF(16) Tanner code runs end-to-end (TMM, small batch)."""
    code = NBCode.from_registry("Tanner_74_9_Z128_GF16")
    assert code.n_sym == 9472 and code.q == 16
    pts = constellation(2)
    bits = np.zeros(code.bit_length, dtype=int)
    sigma = channel.sigma_from_snr(3.0, code.rate, "ebn0", 1.0)
    L = demod.nb_channel_llr(jax.random.PRNGKey(0), bits, pts, sigma,
                             batch=2, q=code.q)
    res = nb_decode.make_decoder(code, method="tmm", max_iters=3)(L)
    assert np.asarray(res.hard).shape == (2, 9472)


def test_clopper_pearson_textbook_values():
    """Exact CP interval vs published values: k=5, n=100, 95% ->
    (0.0164, 0.1128); k=0, n=100 -> (0, 0.0362)."""
    from cuda_ldpc_tpu.utils.stats import clopper_pearson, rates_compatible
    lo, hi = clopper_pearson(5, 100, 0.95)
    assert abs(lo - 0.0164) < 5e-4 and abs(hi - 0.1128) < 5e-4
    lo0, hi0 = clopper_pearson(0, 100, 0.95)
    assert lo0 == 0.0 and abs(hi0 - 0.0362) < 5e-4
    # the round-2 measured parity pairs really are compatible
    assert rates_compatible(371, 32768, 360, 32768)      # tx zero vs random
    assert rates_compatible(16, 40960, 17, 45056)        # ref vs jax channel
    # and a clearly incompatible pair is rejected
    assert not rates_compatible(51, 38912, 304, 4096)    # layered vs flooding qspa @2dB
