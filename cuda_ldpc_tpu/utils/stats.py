"""Statistical acceptance bounds for Monte-Carlo FER/BER estimates.

The reference accepts curves by eyeball against an external table
(myNBLDPC/FER_test.txt); SURVEY.md §7 calls for crisp pass/fail instead.
``clopper_pearson`` gives the exact binomial confidence interval for an
observed error count, so "FER parity" between two runs/decoders is the
well-defined question "do the intervals overlap".
"""

from __future__ import annotations


def _betainc_inv(a: float, b: float, y: float) -> float:
    """Inverse regularized incomplete beta via bisection (monotone in x).
    Uses jax.scipy.special.betainc; 80 halvings reach ~1e-24 interval."""
    import jax.numpy as jnp
    from jax.scipy.special import betainc

    lo, hi = 0.0, 1.0
    aj = jnp.asarray(a, jnp.float64 if _x64() else jnp.float32)
    bj = jnp.asarray(b, aj.dtype)
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if float(betainc(aj, bj, jnp.asarray(mid, aj.dtype))) < y:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def _x64() -> bool:
    import jax

    return bool(jax.config.read("jax_enable_x64"))


def clopper_pearson(errors: int, frames: int,
                    confidence: float = 0.95) -> tuple[float, float]:
    """Exact (Clopper-Pearson) two-sided confidence interval for a binomial
    rate given ``errors`` observed in ``frames`` trials.

    Returns (lo, hi) with lo = 0 when errors == 0 and hi = 1 when
    errors == frames (the standard one-sided degenerate cases).
    """
    if not 0 <= errors <= frames or frames <= 0:
        raise ValueError(f"need 0 <= errors <= frames, got {errors}/{frames}")
    alpha = 1.0 - confidence
    lo = (0.0 if errors == 0
          else _betainc_inv(errors, frames - errors + 1, alpha / 2))
    hi = (1.0 if errors == frames
          else _betainc_inv(errors + 1, frames - errors, 1 - alpha / 2))
    return lo, hi


def rates_compatible(errors_a: int, frames_a: int, errors_b: int,
                     frames_b: int, confidence: float = 0.999) -> bool:
    """True when two observed error rates are statistically compatible:
    their exact confidence intervals overlap.  The acceptance test used for
    decoder-vs-decoder and channel-vs-channel FER parity claims."""
    lo_a, hi_a = clopper_pearson(errors_a, frames_a, confidence)
    lo_b, hi_b = clopper_pearson(errors_b, frames_b, confidence)
    return lo_a <= hi_b and lo_b <= hi_a
