"""Measure sustained per-op-class VPU issue rates on the real chip, on the
exact tile shape the fused min-sum kernel uses ([8, 1280] f32).

Motivation (BENCH.md round-4 roofline, VERDICT-r4 item 5): the flagship
kernel executes ~3.6e12 f32 VPU ops/s against a quoted ~6e12 elementwise
issue peak, with the gap attributed loosely to "compare/select chains and
cross-lane rolls not dual-issuing".  This probe replaces the hand-wave with
numbers: for each op class the kernel is built from, a Pallas kernel runs a
long dependent chain of that op in a fori_loop over VMEM-resident tiles and
reports achieved ops/s.  Op classes:

  add        — f32 add (the VN accumulate)
  min        — f32 minimum (CN two-min)
  cmp_sel    — compare + select pair (the two-min newmin/where update)
  sel        — select against a precomputed mask
  bitand     — i32 bitwise and (sign/magnitude masks)
  bitxor     — i32 bitwise xor (sign product)
  roll       — pltpu.roll by a constant (the circulant rotation)
  minsum_mix — the kernel's real per-edge CN pass-1 mix (sub, roll, 2 ands,
               two-min update, xor), for a direct ns/edge-lane number

Each chain is data-dependent (no ILP across chain steps), so the measured
rate is the per-op issue+latency throughput the real kernel sees — NOT the
multi-ALU peak of independent streams.  A second variant (`par4`) runs four
independent chains to expose how much dual/quad-issue the compiler finds.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_oprate.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB, Z = 8, 1280
# Per-call dispatch through the relay costs a FLAT ~26 ms (measured: K=2000
# of ANY op returns 26-28 ms — pure dispatch).  Rates are therefore taken
# from the MARGINAL time between two chain lengths, cancelling dispatch.
K_LO, K_HI = 50_000, 250_000
SIGN = np.int32(-2**31)
MAG = np.int32(0x7FFFFFFF)


def _chain(op_builder, n_par: int, K: int):
    """Kernel: n_par independent dependent-chains of the op, K steps each."""
    def kernel(x_ref, o_ref):
        xs = [x_ref[...] * (1.0 + 0.125 * i) for i in range(n_par)]

        def body(i, xs):
            return tuple(op_builder(x, i) for x in xs)

        xs = jax.lax.fori_loop(0, K, body, tuple(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[...] = acc
    return kernel


def _ops_per_step(name: str) -> int:
    return {"add": 1, "min": 1, "cmp_sel": 2, "sel": 1, "bitand": 1,
            "bitxor": 1, "roll": 1, "minsum_mix": 9}[name]


def _builder(name: str):
    if name == "add":
        return lambda x, i: x + 1.0000001
    if name == "min":
        # plain Python floats only: jnp scalars become captured constants,
        # which pallas_call rejects
        return lambda x, i: jnp.minimum(x * 1.0000001 + 1e-30, 3.4e38)
    if name == "cmp_sel":
        def f(x, i):
            m = x < 1.5
            return jnp.where(m, x + 1.0000001, x * 0.9999999)
        return f
    if name == "sel":
        return lambda x, i: jnp.where(x > 0, x + 1e-7, x - 1e-7)
    if name == "bitand":
        def f(x, i):
            v = pltpu.bitcast(x, jnp.int32)
            return pltpu.bitcast(v & MAG, jnp.float32) + 1e-7
        return f
    if name == "bitxor":
        def f(x, i):
            v = pltpu.bitcast(x, jnp.int32)
            return pltpu.bitcast(v ^ SIGN, jnp.float32)
        return f
    if name == "roll":
        return lambda x, i: pltpu.roll(x, 17, axis=1)
    if name == "minsum_mix":
        # the CN pass-1 per-edge pattern: sub, roll, bitcast+2 masks,
        # two-min update (cmp + 2 selects + min), sign xor  (~9 ops)
        def f(x, i):
            q = x - 0.001
            q = pltpu.roll(q, 17, axis=1)
            w = pltpu.bitcast(q, jnp.int32)
            mag = pltpu.bitcast(w & MAG, jnp.float32)
            sgn = w & SIGN
            newmin = mag < x
            m2 = jnp.where(newmin, x, jnp.minimum(mag, x))
            m1 = jnp.minimum(mag, x)
            out = pltpu.bitcast(pltpu.bitcast(m2 + m1, jnp.int32) ^ sgn,
                                jnp.float32)
            return out
        return f
    raise ValueError(name)


def _timed(name, n_par, K, reps):
    kernel = _chain(_builder(name), n_par, K)
    fn = jax.jit(lambda x: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((TB, Z), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TB, Z), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TB, Z), jnp.float32),
    )(x))
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0.5, 1.5, (TB, Z)).astype(np.float32))
    np.asarray(fn(x))                      # compile + warm (relay fetch)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(x))
    return (time.perf_counter() - t0) / reps


def measure(name: str, n_par: int, reps: int = 4) -> dict:
    dt_lo = _timed(name, n_par, K_LO, reps)
    dt_hi = _timed(name, n_par, K_HI, reps)
    dk = K_HI - K_LO
    marg = (dt_hi - dt_lo) / dk            # seconds per chain step
    lanes = TB * Z * n_par
    rate = lanes * _ops_per_step(name) / marg if marg > 0 else float("nan")
    return {"op": name, "par": n_par,
            "call_ms_lo": round(dt_lo * 1e3, 3),
            "call_ms_hi": round(dt_hi * 1e3, 3),
            "marginal_ns_per_step": round(marg * 1e9, 3),
            "ops_per_s": f"{rate:.3e}"}


def main() -> int:
    print(f"# op-rate probe, backend={jax.default_backend()}, "
          f"tile [{TB},{Z}] f32, marginal K={K_LO}->{K_HI}", flush=True)
    names = ["add", "min", "cmp_sel", "sel", "bitand", "bitxor", "roll",
             "minsum_mix"]
    for name in names:
        for n_par in (1, 4):
            try:
                row = measure(name, n_par)
            except Exception as e:
                row = {"op": name, "par": n_par,
                       "error": str(e).splitlines()[0][:160]}
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
