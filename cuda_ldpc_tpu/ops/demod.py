"""Non-binary modulation and symbol-LLR demodulation (jax).

Capability parity with the reference's encoder/demodulator pair
(myNBLDPC/src/LDPC_Encoder.cpp:6-36, myNBLDPC/src/LDPC_Decoder.cpp:132-171):

* ``bit_to_sym`` packs bits LSB-first into GF(q) symbol labels.
* ``modulate`` maps symbols (QAM) or bits (BPSK) through a constellation.
* ``llr_bpsk`` composes per-bit LLRs ``-2 Re(y)/sigma^2`` into symbol LLRs
  ``L[s] = sum of bit LLRs over the set bits of s``.
* ``llr_qam`` computes the direct distance-difference LLR against symbol 0
  from constellation geometry.

LLR convention (the reference's): ``L[s] = log P(s)/P(0)`` so ``L[0] = 0``;
we carry the full q-vector with the 0 entry included (the reference stores
``L_ch[s-1]`` for s>=1 and treats symbol 0 implicitly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bit_to_sym(bits: np.ndarray, q_bit: int) -> np.ndarray:
    """Pack bits LSB-first into symbols: s = sum_j bit[i*q_bit+j] << j
    (myNBLDPC/src/LDPC_Encoder.cpp:6-17)."""
    bits = np.asarray(bits).reshape(-1, q_bit)
    return (bits << np.arange(q_bit)).sum(axis=1)


def sym_to_bit(syms: np.ndarray, q_bit: int) -> np.ndarray:
    """Unpack symbols into LSB-first bits, [N] -> [N*q_bit]."""
    syms = np.asarray(syms)
    return ((syms[:, None] >> np.arange(q_bit)) & 1).reshape(-1)


def modulate(labels: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Map integer labels through constellation points (complex[n_qam]).
    For BPSK, labels are bits; for QAM, labels are symbols
    (myNBLDPC/src/LDPC_Encoder.cpp:19-36)."""
    return points[np.asarray(labels)]


def _bit_masks(q: int) -> np.ndarray:
    """[q, q_bit] 0/1 matrix: row s has the LSB-first bits of s."""
    q_bit = q.bit_length() - 1
    return ((np.arange(q)[:, None] >> np.arange(q_bit)) & 1).astype(np.float32)


def llr_bpsk(y_real: jax.Array, sigma, q: int) -> jax.Array:
    """BPSK symbol LLRs. y_real: [..., N, q_bit] real channel samples (one per
    bit, symbol-major LSB-first).  Returns [..., N, q] with L[..., 0] = 0.
    ``sigma``: scalar or broadcastable (e.g. [B, 1, 1] for per-frame noise).

    Per-bit LLR is -2 y / sigma^2, symbol LLR the sum over set bits
    (myNBLDPC/src/LDPC_Decoder.cpp:139-158)."""
    bit_llr = -2.0 * y_real / (sigma * sigma)
    masks = jnp.asarray(_bit_masks(q))               # [q, q_bit]
    return jnp.einsum("...b,qb->...q", bit_llr, masks,
                      precision=jax.lax.Precision.HIGHEST)


def llr_qam(y: jax.Array, sigma, points: np.ndarray) -> jax.Array:
    """QAM symbol LLRs from constellation geometry. y: [..., N, 2] (re, im).
    L[s] = ((2Re(y)-Re(c0)-Re(cs))(Re(cs)-Re(c0)) + (same for Im)) / (2 sigma^2)
    == (|y-c0|^2 - |y-cs|^2) / (2 sigma^2)   (myNBLDPC/src/LDPC_Decoder.cpp:162-168).
    Returns [..., N, q] with L[..., 0] = 0."""
    re = jnp.asarray(points.real, dtype=y.dtype)     # [q]
    im = jnp.asarray(points.imag, dtype=y.dtype)
    yr, yi = y[..., 0:1], y[..., 1:2]
    num = ((2.0 * yr - re[0] - re) * (re - re[0])
           + (2.0 * yi - im[0] - im) * (im - im[0]))
    return num / (2.0 * sigma * sigma)


def nb_channel_llr_tx(key: jax.Array, tx_syms: jax.Array, points: np.ndarray,
                      sigma, q: int) -> jax.Array:
    """Per-frame transmit symbols -> modulate -> complex AWGN -> symbol LLRs.

    Device-side counterpart of ``nb_channel_llr`` for random-codeword
    transmission (tx='random'): tx_syms is a [B, N] int32 device array (one
    codeword per frame, from NBEncoder.encode_jax).  ``sigma``: scalar or [B]
    vector.  Returns [B, N, q].  The reference cannot do this at all — it
    pins a fixture codeword because it lacks an encoder
    (myNBLDPC/include/codeword_test.h:1, src/main.cu:190-212)."""
    B, N = tx_syms.shape
    sig = jnp.asarray(sigma, dtype=jnp.float32)
    per_frame = sig.ndim == 1
    if len(points) == 2:                             # BPSK: one sample per bit
        q_bit = q.bit_length() - 1
        bits = ((tx_syms[..., None] >> jnp.arange(q_bit)) & 1)
        bits = bits.reshape(B, N * q_bit).astype(jnp.float32)
        re0 = float(points[0].real)
        re1 = float(points[1].real)
        x = re0 + bits * (re1 - re0)                 # gather-free modulate
        noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
        y = x + (sig[:, None] if per_frame else sig) * noise
        return llr_bpsk(y.reshape(B, N, q_bit),
                        sig[:, None, None] if per_frame else sig, q)
    re = jnp.take(jnp.asarray(points.real, jnp.float32), tx_syms)
    im = jnp.take(jnp.asarray(points.imag, jnp.float32), tx_syms)
    x = jnp.stack([re, im], axis=-1)                 # [B, N, 2]
    noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
    y = x + (sig[:, None, None] if per_frame else sig) * noise
    return llr_qam(y, sig[:, None, None] if per_frame else sig, points)


def nb_channel_llr(key: jax.Array, tx_labels: np.ndarray, points: np.ndarray,
                   sigma, batch: int, q: int) -> jax.Array:
    """Modulate a fixed symbol/bit label sequence, add complex AWGN, demap to
    symbol LLRs.  tx_labels: [N] symbols (QAM) or [N*q_bit] bits (BPSK).
    ``sigma``: scalar, or a [batch] vector for per-frame noise levels (packed
    multi-SNR sweeps).  Returns [batch, N, q].

    BPSK only uses the real noise component for the LLR (the reference draws a
    complex sample per bit but demaps from .Real only, LDPC_Decoder.cpp:142)."""
    tx = modulate(tx_labels, points)
    sig = jnp.asarray(sigma, dtype=jnp.float32)
    per_frame = sig.ndim == 1
    if len(points) == 2:                             # BPSK: one sample per bit
        q_bit = q.bit_length() - 1
        x = jnp.asarray(tx.real, dtype=jnp.float32)  # [N*q_bit]
        noise = jax.random.normal(key, (batch, x.shape[0]), dtype=jnp.float32)
        y = x[None] + (sig[:, None] if per_frame else sig) * noise
        return llr_bpsk(y.reshape(batch, -1, q_bit),
                        sig[:, None, None] if per_frame else sig, q)
    x = jnp.stack([jnp.asarray(tx.real), jnp.asarray(tx.imag)], axis=-1)
    x = x.astype(jnp.float32)                        # [N, 2]
    noise = jax.random.normal(key, (batch,) + x.shape, dtype=jnp.float32)
    y = x[None] + (sig[:, None, None] if per_frame else sig) * noise
    return llr_qam(y, sig[:, None, None] if per_frame else sig, points)
