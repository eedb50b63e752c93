"""Per-phase cost attribution for the binary decode pipeline on device.

The fused kernel is ONE Mosaic kernel, so a profiler cannot split VN vs CN
vs syndrome inside it; this tool attributes cost by differential timing
instead (the method BENCH.md's iteration-scaling decomposition established):

  * iteration scaling   — decode at 2 vs 12 iterations with early_stop off:
                          slope = pure per-iteration cost, intercept = fixed
                          dispatch + epilogue.
  * check ablation      — check='none' vs 'zero' vs 'syndrome' at equal
                          iterations: the early-stop check's per-iteration
                          price.
  * channel generation  — the jitted AWGN draw alone.
  * jnp path VN vs CN   — the phases are separate XLA computations there:
                          time VN-only vs a full iteration.

Optionally wraps one decode call in ``jax.profiler.trace`` (--trace DIR) —
the sweep drivers expose the same via ``--profile DIR`` (one traced batch
per SNR point).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_phases.py
         [--code J15_L30_Z1280] [--batch 4096] [--trace DIR]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _timeit(fn, *args, reps=3):
    import numpy as np
    fn(*args)                       # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax_leaf(out))   # force through the relay
        best = min(best, time.perf_counter() - t0)
    return best


def jax_leaf(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    return leaves[0].ravel()[:1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="J15_L30_Z1280")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--snr", type=float, default=2.2)
    ap.add_argument("--trace", default="")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cuda_ldpc_tpu.models.qc_binary import QCBinaryCode
    from cuda_ldpc_tpu.ops import channel, minsum, pallas_minsum

    code = QCBinaryCode.from_registry(args.code)
    sigma = channel.sigma_from_snr(args.snr, code.rate, "ebn0")
    B = args.batch

    chan_fn = jax.jit(lambda k: 1.0 + sigma * jax.random.normal(
        k, (code.L, B, code.Z), dtype=jnp.float32))
    chan = chan_fn(jax.random.PRNGKey(0))
    np.asarray(chan[0, 0, :1])
    rows = {}
    rows["channel_gen_s"] = _timeit(chan_fn, jax.random.PRNGKey(1))

    def dec(n, check):
        return jax.jit(functools.partial(
            pallas_minsum.decode_flooding, code=code, num_iters=n,
            check=check, early_stop=False, col_major=True))

    t2 = _timeit(dec(2, "none"), chan)
    t12 = _timeit(dec(12, "none"), chan)
    per_iter = (t12 - t2) / 10
    rows["fused_per_iter_s"] = per_iter
    rows["fused_fixed_s"] = t2 - 2 * per_iter
    for check in ("zero", "syndrome"):
        tc = _timeit(dec(12, check), chan)
        rows[f"fused_check_{check}_per_iter_s"] = (tc - t12) / 12

    # jnp path VN vs CN (small batch: the jnp path is HBM-bound)
    Bj = 256
    chj = jnp.asarray(np.asarray(chan)[:, :Bj].transpose(1, 0, 2))
    R0 = jnp.zeros((Bj, code.num_edges, code.Z), jnp.float32)
    vn = jax.jit(lambda c, R: minsum._vn_update(code, c, R)[0])

    def full_iter(c, R):
        total, hard, Q = minsum._vn_update(code, c, R)
        newR = [None] * code.num_edges
        for j in range(code.J):
            Rr = minsum._cn_minsum(minsum._row_stack(code, Q, j), 1.0, 0.0)
            for i, e in enumerate(code.row_edges[j]):
                newR[e] = jnp.roll(Rr[:, i], int(code.edges[e, 2]), axis=-1)
        return jnp.stack(newR, axis=1)

    fi = jax.jit(full_iter)
    tv = _timeit(vn, chj, R0)
    tf = _timeit(fi, chj, R0)
    rows["jnp_vn_s_b256"] = tv
    rows["jnp_cn_s_b256"] = tf - tv

    if args.trace:
        try:
            with jax.profiler.trace(args.trace):
                out = dec(12, "zero")(chan)
                np.asarray(jax_leaf(out))
            rows["trace_dir"] = args.trace
        except Exception as e:  # the axon relay may not support profiling
            rows["trace_error"] = str(e).splitlines()[0][:160]

    print(json.dumps(rows), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
