"""Source / modulation / AWGN channel / demodulation ops (jax).

Sigma formulas match the reference exactly:
* binary   Eb/N0: sqrt(0.5 / (rate * 10^(SNR/10)))           (bldpc_实习/main.cu:120-127)
* binary   Es/N0: sqrt(0.5 / 10^(SNR/10))
* NB       Eb/N0: sqrt(0.5 / (log2(n_QAM) * rate * 10^(SNR/10)))  (myNBLDPC/src/main.cu:221-228)
* NB       Es/N0: sqrt(0.5 / (log2(n_QAM) * 10^(SNR/10)))

Noise uses ``jax.random`` (threefry) with caller-folded keys instead of the
reference's mutex-serialized 3-seed LCG; parity is statistical (FER curves
within Monte-Carlo confidence), with the LCG preserved in utils/lcg.py for
golden-vector tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sigma_from_snr(snr_db: float, rate: float, snr_type: str = "ebn0",
                   bits_per_sym: float = 1.0) -> float:
    """Noise sigma per real dimension for a given SNR point."""
    es = 10.0 ** (snr_db / 10.0)
    if snr_type == "ebn0":
        return float(np.sqrt(0.5 / (bits_per_sym * rate * es)))
    if snr_type == "esn0":
        return float(np.sqrt(0.5 / (bits_per_sym * es)))
    raise ValueError(f"unknown snr_type {snr_type!r}")


def bpsk(bits: jax.Array) -> jax.Array:
    """BPSK map y = 1 - 2c (bldpc_实习/LDPC_Encoder.cu:10-19)."""
    return 1.0 - 2.0 * bits.astype(jnp.float32)


def awgn(key: jax.Array, x: jax.Array, sigma: float) -> jax.Array:
    """Real AWGN: y = x + sigma * n."""
    return x + sigma * jax.random.normal(key, x.shape, dtype=x.dtype)


def awgn_complex(key: jax.Array, x: jax.Array, sigma: float) -> jax.Array:
    """Complex AWGN with ``sigma`` per real dimension; x: [..., 2] (re, im)."""
    return x + sigma * jax.random.normal(key, x.shape, dtype=x.dtype)


def bpsk_awgn_llr(key: jax.Array, codeword: jax.Array, sigma: float,
                  batch: int) -> jax.Array:
    """All-in-one binary channel for a [L, Z] codeword -> [batch, L, Z] samples.

    The binary reference feeds raw channel samples to the decoder (its 'LLR' is
    y itself, a positive scaling of 2y/sigma^2 — scale-invariant for min-sum)."""
    x = bpsk(codeword)[None]
    noise = jax.random.normal(key, (batch,) + codeword.shape, dtype=jnp.float32)
    return x + sigma * noise
