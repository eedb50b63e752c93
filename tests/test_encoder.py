"""Encoders: every encoded word must satisfy the parity checks."""

import numpy as np
import pytest

from cuda_ldpc_tpu.models.encoder import BinaryEncoder, NBEncoder
from cuda_ldpc_tpu.models.nb_code import NBCode
from cuda_ldpc_tpu.models.qc_binary import QCBinaryCode


def test_binary_encoder_valid_codewords():
    code = QCBinaryCode.from_registry("J4_L24_Z96")
    enc = BinaryEncoder.from_code(code, cache=False)
    assert enc.k_eff >= code.k          # rank deficiencies only add dimension
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, size=(5, enc.k_eff))
    cw = enc.encode(msg)
    H = code.dense_H
    syn = (cw @ H.T) & 1
    assert not syn.any()
    # message bits embedded systematically
    np.testing.assert_array_equal(cw[:, enc.free], msg)


def test_binary_encoder_jax_matches_numpy():
    code = QCBinaryCode.from_registry("J4_L24_Z96")
    enc = BinaryEncoder.from_code(code, cache=False)
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 2, size=(3, enc.k_eff))
    np.testing.assert_array_equal(np.asarray(enc.encode_jax(msg)),
                                  enc.encode(msg))


def test_binary_encode_decode_roundtrip():
    import jax
    import jax.numpy as jnp
    from cuda_ldpc_tpu.ops import channel, minsum

    code = QCBinaryCode.from_registry("J4_L24_Z96")
    enc = BinaryEncoder.from_code(code, cache=False)
    rng = np.random.default_rng(2)
    msg = rng.integers(0, 2, size=(4, enc.k_eff))
    cw = enc.encode(msg).reshape(4, code.L, code.Z)
    x = 1.0 - 2.0 * cw.astype(np.float32)
    chan = x + 0.45 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), x.shape))
    res = minsum.decode_flooding(jnp.asarray(chan), code, 30,
                                 check="syndrome")
    assert bool(np.all(np.asarray(res.ok)))
    np.testing.assert_array_equal(np.asarray(res.hard).reshape(4, -1),
                                  cw.reshape(4, -1))


def test_nb_encoder_valid_codewords():
    code = NBCode.from_registry("BDS.576.288.GF.64")
    enc = NBEncoder.from_code(code)
    assert enc.k_eff >= code.k_sym
    rng = np.random.default_rng(3)
    msg = rng.integers(0, code.q, size=(4, enc.k_eff))
    cw = enc.encode(msg)
    for b in range(4):
        assert not code.syndrome(cw[b]).any()
    np.testing.assert_array_equal(cw[:, enc.free], msg)


def test_nb_fixture_is_valid_codeword():
    """The reference's pinned GF(64) fixture should satisfy the BDS code."""
    from cuda_ldpc_tpu.utils import registry
    code = NBCode.from_registry("BDS.576.288.GF.64")
    cw = registry.load_test_codeword(96)
    assert not code.syndrome(cw).any()
