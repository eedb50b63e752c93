"""Probe which Mosaic ops the QC NB QSPA kernel design needs actually
compile on this TPU (leading-axis slicing/concat, dim-0 iota, rank-3
dot_general over the leading axis, minormost rolls on rank-3, leading-axis
reductions).  Run on the real device; each probe compiles a tiny kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mosaic.py
"""

import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q, TB, Z = 16, 2, 128


def run(name, kernel, extra_in=None):
    try:
        ins = [np.arange(Q * TB * Z, dtype=np.float32).reshape(Q, TB, Z) / 97.0]
        specs = [pl.BlockSpec((Q, TB, Z), lambda: (0, 0, 0),
                              memory_space=pltpu.VMEM)]
        if extra_in is not None:
            ins.append(extra_in)
            specs.append(pl.BlockSpec(extra_in.shape,
                                      lambda: (0,) * extra_in.ndim,
                                      memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kernel,
            in_specs=specs,
            out_specs=pl.BlockSpec((Q, TB, Z), lambda: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, TB, Z), jnp.float32),
        )(*ins)
        got = np.asarray(out)
        print(f"PASS {name}  sum={got.sum():.3f}", flush=True)
        return got
    except Exception as e:
        msg = str(e).splitlines()[0][:200] if str(e) else repr(e)[:200]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return None


# 1. leading-axis static slice + concat (row permutation machinery)
def k_slice_concat(x_ref, o_ref):
    x = x_ref[...]
    o_ref[...] = jnp.concatenate([x[0:1], x[8:16], x[1:8]], axis=0)


# 2. broadcasted_iota over dim 0 + where (row masks)
def k_iota0(x_ref, o_ref):
    x = x_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Q, TB, Z), 0)
    o_ref[...] = jnp.where((rows & 4) != 0, -x, x)


# 3. rank-3 dot_general: [Q,Q] x [Q,TB,Z] contracting leading axis
def k_dot3(x_ref, m_ref, o_ref):
    x = x_ref[...]
    m = m_ref[...]
    o_ref[...] = jax.lax.dot_general(
        m, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


# 4. pltpu.roll on minormost axis of rank-3
def k_roll2(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], 37, axis=2)


# 5. leading-axis max reduction via halving slices + broadcast subtract
def k_reduce0(x_ref, o_ref):
    x = x_ref[...]
    m = jnp.maximum(x[0:8], x[8:16])
    m = jnp.maximum(m[0:4], m[4:8])
    m = jnp.maximum(m[0:2], m[2:4])
    m = jnp.maximum(m[0:1], m[1:2])       # [1, TB, Z]
    o_ref[...] = x - m


# 6. jnp.max over axis 0 directly (rank-3)
def k_reduce0_native(x_ref, o_ref):
    x = x_ref[...]
    o_ref[...] = x - jnp.max(x, axis=0, keepdims=True)


# 7. exp/log on rank-3 + where with [1,TB,1]-broadcast mask
def k_trans(x_ref, o_ref):
    x = x_ref[...]
    cont = x[0:1, :, 0:1] > 0.5
    o_ref[...] = jnp.where(cont, jnp.log(jnp.exp(x) + 1.0), x)


# 8. per-lane select mask input [1, 1, Z] broadcast over rows+TB
def k_lanemask(x_ref, m_ref, o_ref):
    x = x_ref[...]
    m = m_ref[...]
    o_ref[...] = jnp.where(m != 0.0, -x, x)


# 9. stack of per-row [TB, Z] slices back to [Q, TB, Z] (dense transform)
def k_rowstack(x_ref, o_ref):
    x = x_ref[...]
    rows = [x[i] for i in range(Q)]
    acc = [rows[0] + ((-1.0) ** i) * rows[i % 8] for i in range(Q)]
    o_ref[...] = jnp.stack(acc, axis=0)


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    x = np.arange(Q * TB * Z, dtype=np.float32).reshape(Q, TB, Z) / 97.0

    got = run("slice_concat", k_slice_concat)
    if got is not None:
        ref = np.concatenate([x[0:1], x[8:16], x[1:8]], axis=0)
        assert np.array_equal(got, ref), "slice_concat WRONG VALUES"

    run("iota_dim0", k_iota0)

    m = np.where((np.arange(Q)[:, None] & np.arange(Q)[None, :]) % 2 == 0,
                 1.0, -1.0).astype(np.float32)
    got = run("dot_general_rank3", k_dot3, extra_in=m)
    if got is not None:
        ref = np.einsum("uk,ktz->utz", m, x)
        err = np.abs(got - ref).max()
        print(f"   dot3 maxerr={err:.2e}", flush=True)

    got = run("roll_axis2", k_roll2)
    if got is not None:
        assert np.array_equal(got, np.roll(x, 37, axis=2)), "roll WRONG"

    run("reduce0_slices", k_reduce0)
    run("reduce0_native", k_reduce0_native)
    run("transcendental_where", k_trans)

    lm = np.tile(np.arange(Z) % 2, (1, 1, 1)).astype(np.float32)
    run("lane_mask_bcast", k_lanemask, extra_in=lm)

    run("row_stack", k_rowstack)


if __name__ == "__main__":
    main()
