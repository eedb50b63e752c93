"""Bit-faithful NumPy port of the reference's combined 3-seed LCG and Box-Muller
AWGN generators, for golden-vector tests of the channel/demod math.

The production channel uses ``jax.random`` (threefry) with per-shard folded keys;
bit parity with this serial LCG across devices is impossible (the reference's NB
build already serializes it under a mutex), so curve parity is statistical.  This
module reproduces the exact sequences for small deterministic fixtures:

* ``RandomModule``: seeds x{249,251,252} mod {61967,63443,63599}, sum of fractional
  parts (bldpc_实习/LDPC_Encoder.cu:46-56 == myNBLDPC/src/LDPC_Encoder.cpp:71-79).
* binary AWGN: sin-variant Box-Muller, y = sigma*sin(2*pi*u2)*sqrt(-2*ln(1-u1)) + (1-2c)
  (bldpc_实习/LDPC_Encoder.cu:25-41), frame-interleaved [bit][frame] layout.
* NB AWGN: cos-variant Box-Muller per complex component
  (myNBLDPC/src/LDPC_Encoder.cpp:41-69).
"""

from __future__ import annotations

import numpy as np

PI = 3.1415926  # the reference's PI macro (define.cuh:58), NOT np.pi
DEFAULT_SEEDS = (173, 173, 173)


class ReferenceLCG:
    def __init__(self, seeds=DEFAULT_SEEDS):
        self.seed = list(seeds)

    def next(self) -> float:
        s = self.seed
        s[0] = (s[0] * 249) % 61967
        s[1] = (s[1] * 251) % 63443
        s[2] = (s[2] * 252) % 63599
        t = (np.float32(s[0]) / np.float32(61967) + np.float32(s[1]) / np.float32(63443)
             + np.float32(s[2]) / np.float32(63599))
        return float(t - int(t))

    def uniforms(self, n: int) -> np.ndarray:
        return np.array([self.next() for _ in range(n)], dtype=np.float64)


def awgn_binary(lcg: ReferenceLCG, codeword: np.ndarray, sigma: float,
                n_frames: int) -> np.ndarray:
    """Channel output [CW_Len, n_frames] (frame-interleaved like the reference)."""
    cw_len = codeword.shape[0]
    out = np.zeros((cw_len, n_frames), dtype=np.float64)
    for f in range(n_frames):
        for b in range(cw_len):
            u1 = lcg.next()
            u2 = lcg.next()
            temp = np.sqrt(-2.0 * np.log(1.0 - u1))
            out[b, f] = sigma * np.sin(2 * PI * u2) * temp + 1.0 - 2.0 * codeword[b, f] \
                if codeword.ndim == 2 else \
                sigma * np.sin(2 * PI * u2) * temp + 1.0 - 2.0 * codeword[b]
    return out


def awgn_nb(lcg: ReferenceLCG, tx: np.ndarray, sigma: float) -> np.ndarray:
    """Complex AWGN, cos-variant Box-Muller, matching the NB reference."""
    out = np.zeros_like(tx, dtype=np.complex128)
    for i in range(tx.shape[0]):
        u1, u2 = lcg.next(), lcg.next()
        re = sigma * np.cos(2 * PI * u2) * np.sqrt(-2.0 * np.log(1.0 - u1)) + tx[i].real
        u1, u2 = lcg.next(), lcg.next()
        im = sigma * np.cos(2 * PI * u2) * np.sqrt(-2.0 * np.log(1.0 - u1)) + tx[i].imag
        out[i] = re + 1j * im
    return out
