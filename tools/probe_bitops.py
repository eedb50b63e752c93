"""Probe Mosaic support for the bit-trick ops the sign-bit min-sum variant
needs: f32<->i32 bitcast, bitwise and/or/xor on i32, integer compare +
minimum on i32 magnitudes, and pltpu.roll on i32 lanes.

Motivation (BENCH.md roofline): the fused binary kernel is VPU-op-bound at
~90% of f32 elementwise peak; the only f32-domain saving left is replacing
the per-edge sign bookkeeping (q<0 compare, sign-xor, negate-select) with
bitwise ops on the IEEE sign bit (sign product = XOR of sign bits; output
sign = OR of magnitude with product^edge-sign).  That removes ~3 of ~18 VPU
ops per edge-lane-iteration IF Mosaic compiles these ops at vector rate.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_bitops.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB, Z = 8, 256
SIGN = np.int32(-2**31)          # 0x80000000
MAG = np.int32(0x7FFFFFFF)


def run(name, kernel, x, ref):
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((TB, Z), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TB, Z), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TB, Z), jnp.float32),
        )(x)
        got = np.asarray(out)
        exact = np.array_equal(got, ref) or np.array_equal(
            np.nan_to_num(got), np.nan_to_num(ref))
        print(f"PASS {name}  exact={exact}  maxerr="
              f"{np.abs(got - ref).max():.3e}", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:180] if str(e) else repr(e)[:180]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((TB, Z)) * 3).astype(np.float32)
    w = x.view(np.int32)

    # 1. bitcast + sign/mag masks + integer two-way min + reassemble
    def k_signmag(x_ref, o_ref):
        v = pltpu.bitcast(x_ref[...], jnp.int32)
        sign = v & SIGN
        mag = v & MAG
        magr = pltpu.roll(mag, 1, axis=1)
        signr = pltpu.roll(sign, 1, axis=1)
        m = jnp.minimum(mag, magr)          # int compare == f32 compare on mags
        s = sign ^ signr                    # sign product
        o_ref[...] = pltpu.bitcast(m | s, jnp.float32)

    mag = w & MAG
    sign = (w & SIGN)
    m = np.minimum(mag, np.roll(mag, 1, axis=1))
    s = sign ^ np.roll(sign, 1, axis=1)
    ref = (m | s).view(np.float32)
    run("signmag_min_xor_or", k_signmag, x, ref)

    # 2. integer compare feeding a where (two-min style) + argmin slot int
    def k_intcmp(x_ref, o_ref):
        v = pltpu.bitcast(x_ref[...], jnp.int32)
        mag = v & MAG
        magr = pltpu.roll(mag, 3, axis=1)
        newmin = magr < mag
        am = jnp.where(newmin, 3, 0)
        out = jnp.where(am == 3, jnp.minimum(mag, magr), mag)
        o_ref[...] = out.astype(jnp.float32)

    mag = w & MAG
    magr = np.roll(mag, 3, axis=1)
    ref = np.where(magr < mag, np.minimum(mag, magr), mag).astype(np.float32)
    run("intcmp_where", k_intcmp, x, ref)

    # 3. f32 compare of bit-masked magnitudes (mixed domain: float min chain
    #    on cleared-sign floats, bitwise sign handling)
    def k_mixed(x_ref, o_ref):
        v = pltpu.bitcast(x_ref[...], jnp.int32)
        magf = pltpu.bitcast(v & MAG, jnp.float32)
        magr = pltpu.roll(magf, 1, axis=1)
        m1 = jnp.minimum(magf, magr)
        sign = v & SIGN
        o_ref[...] = pltpu.bitcast(
            pltpu.bitcast(m1, jnp.int32) | sign, jnp.float32)

    magf = (w & MAG).view(np.float32)
    m1 = np.minimum(magf, np.roll(magf, 1, axis=1))
    ref = (m1.view(np.int32) | (w & SIGN)).view(np.float32)
    run("mixed_f32min_bitsign", k_mixed, x, ref)


if __name__ == "__main__":
    main()
