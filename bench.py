"""Headline benchmark: decoded info Mb/s per chip, binary QC-LDPC
J15_L30_Z1280 (n=38400, k=19200), flooding min-sum, 10 fixed iterations
(BASELINE.json north star; baseline target 1000 Mb/s per chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mb/s", "vs_baseline": N/1000}
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_MBPS = 1000.0


def main() -> int:
    import jax
    import jax.numpy as jnp

    from cuda_ldpc_tpu import QCBinaryCode
    from cuda_ldpc_tpu.ops import minsum

    code = QCBinaryCode.from_registry(os.environ.get("BENCH_CODE",
                                                     "J15_L30_Z1280"))
    platform = jax.devices()[0].platform
    # Per-call dispatch through the device runtime costs ~25-30 ms flat, so
    # throughput is batch-amortized: B=256 -> 0.18 Gb/s, B=8192 -> 1.8 Gb/s,
    # B=16384 -> 2.16 Gb/s, B=32768 -> 2.36 Gb/s synchronous / 2.7 Gb/s
    # pipelined (marginal cost ~6-7 us/frame; B=49152 pipelined measures the
    # same number, i.e. the pipeline fully hides dispatch at 32768 already).
    # 32768 fits in ~12.5 GB of the 16 GB HBM with the two col-major channel
    # buffers below plus two in-flight hard outputs (no transpose temp); the
    # reference's own batch is 4096 (define.cuh:60).
    B = int(os.environ.get("BENCH_BATCH",
                           "32768" if platform != "cpu" else "8"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    # f32 TB=8 measured fastest (160 Mb/s): bf16 storage costs boundary casts
    # without helping the VPU-op-bound kernel (see memory/ablation notes)
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE",
                                           "float32") == "bfloat16" else jnp.float32

    kernel = os.environ.get("BENCH_KERNEL", "auto")
    schedule = os.environ.get("BENCH_SCHEDULE", "flooding")
    tile_b = int(os.environ.get("BENCH_TILE", "8"))
    import functools

    from cuda_ldpc_tpu.ops import pallas_minsum
    use_pallas = (kernel in ("auto", "pallas")
                  and jax.default_backend() == "tpu"
                  and pallas_minsum.supports(code))
    if use_pallas:
        fn = (pallas_minsum.decode_layered if schedule == "layered"
              else pallas_minsum.decode_flooding)
        # col_major: feed the kernel's native [L, B, Z] layout directly
        # (production zero-tx sweeps do the same), skipping two HBM transposes
        decode = jax.jit(functools.partial(
            fn, code=code, num_iters=iters, check="zero", early_stop=False,
            msg_dtype=dtype, tile_b=tile_b, col_major=True))
        chan_shape = (code.L, B, code.Z)
    else:
        fn = (minsum.decode_layered if schedule == "layered"
              else minsum.decode_flooding)
        decode = jax.jit(functools.partial(
            fn, code=code, num_iters=iters, check="zero", early_stop=False,
            msg_dtype=dtype))
        chan_shape = (B, code.L, code.Z)

    reps = int(os.environ.get("BENCH_REPS", "8"))
    # alternating channel buffers keep device memory bounded at large B
    # (B=32768 is ~5 GB/buffer); above that a single buffer must be reused
    # (2 buffers + the int8 hard output would exceed the 16 GB HBM).  JAX
    # does not memoize executions, so reuse does not skew timing.
    n_bufs = 1 if B > 32768 else 2
    bufs = [1.0 + 0.6 * jax.random.normal(jax.random.PRNGKey(i),
                                          chan_shape, dtype=jnp.float32)
            for i in range(min(reps, n_bufs))]
    chans = [bufs[i % len(bufs)] for i in range(reps)]
    import numpy as np

    # warm up / compile.  NOTE: completion is forced by fetching the tiny
    # per-frame ok vector to host — block_until_ready alone does not reliably
    # fence execution through the axon remote-TPU relay.
    res = decode(chans[0])
    np.asarray(res.ok)

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    # Sustained pipelined throughput: keep ONE decode in flight (launch k+1,
    # then fetch k's ok) exactly like the production sweep loops in sim.py,
    # so the ~25-30 ms flat per-call dispatch/fetch through the device
    # runtime overlaps kernel execution instead of serializing with it.
    # Peak HBM with one batch in flight: chan buffers + 2 live hard outputs
    # (B=32768: 2x5 GB chan + 2x1.26 GB hard ~= 12.5 GB of 16 GB).
    t0 = time.perf_counter()
    prev = decode(chans[0])
    for chan in chans[1:]:
        nxt = decode(chan)
        np.asarray(prev.ok)          # fetch batch k while k+1 runs
        prev = nxt
    np.asarray(prev.ok)
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()

    info_bits = B * code.k
    mbps = reps * info_bits / dt / 1e6
    print(json.dumps({
        "metric": "binary_minsum_info_throughput_per_chip",
        "value": round(mbps, 2),
        "unit": "Mb/s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
