"""Mosaic-compiled kernel parity vs the jnp paths, ON THE REAL DEVICE.

The interpret-mode tests in tests/ prove kernel math on CPU; the only checks
that a real Mosaic compile matches the oracle are slow-marked pytest tests
that the conftest's forced-CPU backend always skips.  This tool runs those
checks as a standalone device job (VERDICT r3 item 7): one line per kernel
with exact-match status, plus the documented layered avgIT drift tolerance
(matmul accumulation order; tests/test_pallas_qspa.py:119).

Run each round; paste the table into VALIDATION.md:

  PYTHONPATH=/root/repo:/root/.axon_site python tools/device_parity.py
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def _report(name, got, ref, iter_tol=0):
    gh, rh = np.asarray(got.hard), np.asarray(ref.hard)
    hard_ok = bool(np.array_equal(gh, rh))
    gok, rok = np.asarray(got.ok), np.asarray(ref.ok)
    ok_ok = bool(np.array_equal(gok, rok))
    di = np.asarray(got.iters).astype(int) - np.asarray(ref.iters).astype(int)
    it_exact = bool((di == 0).all())
    it_tol = bool((np.abs(di) <= iter_tol).all())
    # per-frame decision mismatches: last-ulp float drift (matmul/select
    # accumulation order under Mosaic) can flip bits only in frames the
    # decoder did NOT converge — converged decisions are anchored by the
    # discrete syndrome.  Mismatches confined to non-ok frames are the
    # documented device tolerance; a mismatch in an ok frame is a bug.
    if gh.ndim > 2:                  # binary [B?, ...] / col-major [L, B, Z]
        mism = (gh != rh).reshape(gh.shape[0], -1).any(axis=1) \
            if gh.shape[0] == gok.shape[0] else \
            (gh != rh).transpose(1, 0, 2).reshape(gok.shape[0], -1).any(axis=1)
    else:
        mism = (gh != rh).any(axis=1)
    in_ok = bool((mism & gok & rok).any())
    row = {"kernel": name, "hard_exact": hard_ok, "ok_exact": ok_ok,
           "iters_exact": it_exact,
           "iters_within_tol": it_tol, "iter_tol": iter_tol,
           "drift_frames": int((di != 0).sum()),
           "hard_mismatch_frames": int(mism.sum()),
           "mismatch_in_converged_frame": in_ok,
           "frames": int(mism.size),
           "pass": ok_ok and (it_exact or it_tol) and not in_ok}
    print(json.dumps(row), flush=True)
    return row


def binary_cases():
    from cuda_ldpc_tpu.models.qc_binary import QCBinaryCode
    from cuda_ldpc_tpu.ops import channel, minsum, pallas_minsum
    rows = []
    # 3.2 dB on the flagship: a production point where nearly every frame
    # converges, bounding the non-converged-drift tolerance with a mostly
    # converged population (VERDICT-r4 weak item 3)
    for name, snr in (("J15_L30_Z1280", 2.2), ("J15_L30_Z1280", 3.2),
                      ("J10_L60_Z160", 3.0)):
        code = QCBinaryCode.from_registry(name)
        sigma = channel.sigma_from_snr(snr, code.rate, "ebn0")
        chan = 1.0 + sigma * jax.random.normal(
            jax.random.PRNGKey(5), (32, code.L, code.Z), dtype=np.float32)
        for sched, pfn, jfn in (
                ("flooding", pallas_minsum.decode_flooding,
                 minsum.decode_flooding),
                ("layered", pallas_minsum.decode_layered,
                 minsum.decode_layered)):
            # check='syndrome': ok means the WHOLE codeword satisfies H x=0,
            # so a hard mismatch between two ok frames would mean the two
            # paths converged to different codewords (a real bug); the
            # reference's 'zero' check only constrains message bits, which
            # let benign parity-region drift read as a converged-frame
            # mismatch
            got = jax.jit(lambda x, f=pfn: f(x, code, 12,
                                             check="syndrome"))(chan)
            ref = jax.jit(lambda x, f=jfn: f(x, code, 12,
                                             check="syndrome"))(chan)
            # (binary iters is a batch-global scalar; _report handles it)
            rows.append(_report(f"pallas_minsum/{sched}/{name}@{snr}dB",
                                got, ref))
    return rows


class _Res:
    def __init__(self, hard, ok, iters):
        self.hard, self.ok, self.iters = hard, ok, iters


def binary_stream_cases():
    """Mosaic-compiled pallas_minsum_stream vs the jnp BinaryCore driven
    with the kernel's exact per-iteration accounting (the loop-level spec
    from tests/test_minsum_stream.py), on device — the one kernel family
    round 4 validated only in interpret mode (VERDICT-r4 weak item 3)."""
    import jax.numpy as jnp

    from cuda_ldpc_tpu.models.qc_binary import QCBinaryCode
    from cuda_ldpc_tpu.ops import channel, minsum, pallas_minsum_stream
    from cuda_ldpc_tpu.ops.pallas_minsum import _lane_pad
    rows = []
    code = QCBinaryCode.from_registry("J15_L30_Z1280")
    B, k, max_it = 32, 8, 12
    sigma = channel.sigma_from_snr(2.6, code.rate, "ebn0")
    chan = np.asarray(1.0 + sigma * jax.random.normal(
        jax.random.PRNGKey(11), (B, code.L, code.Z), dtype=np.float32))
    Zp = _lane_pad(code.Z)
    chan_cm = np.zeros((code.L, B, Zp), np.float32)
    chan_cm[:, :, :code.Z] = chan.transpose(1, 0, 2)
    for layered in (False, True):
        sched = "layered" if layered else "flooding"
        z = jnp.zeros((B, 128), jnp.int32)
        R0 = jnp.zeros((code.num_edges, B, Zp), jnp.float32)
        step = jax.jit(functools.partial(
            pallas_minsum_stream.stream_step, code=code, k=k,
            max_iters=max_it, check="syndrome", layered=layered))
        # two chained calls: state round-trips through HBM on device
        c1, R1, h1, t1, d1, o1 = step(jnp.asarray(chan_cm), R0, z, z, z)
        c2, R2, h2, t2, d2, o2 = step(c1, R1, t1, d1, o1)
        got = _Res(np.asarray(h2)[:, :, :code.Z].transpose(1, 0, 2),
                   np.asarray(o2)[:, 0].astype(bool),
                   np.asarray(t2)[:, 0])
        # loop-level jnp reference with identical accounting
        core = minsum.build_core(code, schedule=sched)
        carry = core.init(jnp.asarray(chan))
        t = np.zeros(B, np.int32)
        done = np.zeros(B, bool)
        okf = np.zeros(B, bool)
        hard = None
        dec = jax.jit(lambda c: core.decide(c))
        stp = jax.jit(lambda c, tot, cont: core.step(c, tot, cont))
        for _ in range(2 * k):
            if done.all():
                break
            hard_new, totals = dec(carry)
            hard = (np.asarray(hard_new) if hard is None else
                    np.where(done[:, None, None], hard, np.asarray(hard_new)))
            ok = np.asarray(minsum._check(code, jnp.asarray(hard),
                                          "syndrome"))
            fin = ~done & (ok | (t >= max_it))
            okf = np.where(fin, ok, okf)
            done |= fin
            t = t + ~done
            carry = stp(carry, totals, jnp.asarray(~done))
        ref = _Res(hard, okf, t)
        rows.append(_report(f"pallas_minsum_stream/{sched}/J15_L30_Z1280",
                            got, ref))
    return rows


def nbms_cases():
    """Fused EMS/TMM kernels (ops/pallas_nbms) vs the jnp decoders on
    device (round 5)."""
    from cuda_ldpc_tpu.models.nb_code import NBCode
    from cuda_ldpc_tpu.ops import channel, demod, nb_decode, pallas_nbms
    from cuda_ldpc_tpu.utils.constellations import constellation
    code = NBCode.from_registry("BDS.576.288.GF.64")
    sigma = channel.sigma_from_snr(2.0, code.rate, "ebn0", 1.0)
    tx = np.zeros(code.bit_length, dtype=np.int64)
    L = demod.nb_channel_llr(jax.random.PRNGKey(13), tx, constellation(2),
                             sigma, batch=64, q=code.q)
    rows = []
    for meth, fn in (("ems", pallas_nbms.decode_ems),
                     ("tmm", pallas_nbms.decode_tmm),
                     ("layered_tmm", pallas_nbms.decode_layered_tmm)):
        got = jax.jit(lambda x, f=fn: f(x, code, 20))(L)
        ref = jax.jit(lambda x, m=meth: nb_decode.decode(x, code, m, 20,
                                                         nm=2, nc=2))(L)
        rows.append(_report(f"pallas_nbms/{meth}/BDS.576.288.GF.64",
                            got, ref, iter_tol=1))
    return rows


def nb_stream_cases():
    """Fused NB stream step (ops/pallas_qspa_stream) vs the loop-level jnp
    core with the kernel's accounting, on device (round 5)."""
    import jax.numpy as jnp

    from cuda_ldpc_tpu.models.nb_code import NBCode
    from cuda_ldpc_tpu.ops import (channel, demod, nb_decode, pallas_qspa,
                                   pallas_qspa_stream)
    from cuda_ldpc_tpu.utils.constellations import constellation
    code = NBCode.from_registry("BDS.576.288.GF.64")
    plan = pallas_qspa.make_plan(code)
    B, k, max_it = 32, 5, 8
    sigma = channel.sigma_from_snr(2.0, code.rate, "ebn0", 1.0)
    tx = np.zeros(code.bit_length, dtype=np.int64)
    L = demod.nb_channel_llr(jax.random.PRNGKey(17), tx, constellation(2),
                             sigma, batch=B, q=code.q)
    rows = []
    qp = pallas_qspa_stream._lane_pad(code.q)
    for meth in ("qspa", "layered_qspa"):
        layered = meth == "layered_qspa"
        chan = pallas_qspa_stream.pack_chan(jnp.asarray(L), code)
        C = jnp.zeros((plan.E, B, qp), jnp.float32)
        z = jnp.zeros((B, 128), jnp.int32)
        step = jax.jit(functools.partial(
            pallas_qspa_stream.stream_step, code=code, k=k, max_iters=max_it,
            layered=layered))
        chan, C, hoh, t2, d2, o2 = step(chan, C, z, z, z)
        chan, C, hoh, t2, d2, o2 = step(chan, C, t2, d2, o2)
        got = _Res(np.argmax(np.asarray(hoh), axis=2).astype(np.int32).T,
                   np.asarray(o2)[:, 0].astype(bool), np.asarray(t2)[:, 0])
        core = nb_decode.build_core(code, meth)
        carry = core.init(jnp.asarray(L))
        t = np.zeros(B, np.int32)
        done = np.zeros(B, bool)
        okf = np.zeros(B, bool)
        hard = None
        dec = jax.jit(lambda c: core.decide(c))
        stp = jax.jit(lambda c, llr, cont: core.step(c, llr, cont))
        for _ in range(2 * k):
            if done.all():
                break
            hard_new, llr = dec(carry)
            hard = (np.asarray(hard_new) if hard is None else
                    np.where(done[:, None], hard, np.asarray(hard_new)))
            ok = np.asarray(nb_decode._syndrome_ok(core.g,
                                                   jnp.asarray(hard)))
            fin = ~done & (ok | (t >= max_it))
            okf = np.where(fin, ok, okf)
            done |= fin
            t = t + ~done
            carry = stp(carry, llr, jnp.asarray(~done))
        ref = _Res(hard, okf, t)
        rows.append(_report(f"pallas_qspa_stream/{meth}/BDS.576.288.GF.64",
                            got, ref, iter_tol=1))
    return rows


def nb_cases():
    from cuda_ldpc_tpu.models.nb_code import NBCode
    from cuda_ldpc_tpu.ops import channel, demod, nb_decode, pallas_qspa
    from cuda_ldpc_tpu.utils.constellations import constellation
    rows = []
    cases = [("BDS.576.288.GF.64", 2.0, 64, "astack"),
             ("LDPC_N96_K48_GF256_d1_exp", 3.0, 64, "logrot"),
             ("LDPC_N576_K480_GF256_exp", 4.0, 32, "logrot")]
    for name, snr, B, scheme in cases:
        code = NBCode.from_registry(name)
        sigma = channel.sigma_from_snr(snr, code.rate, "ebn0", 1.0)
        tx = np.zeros(code.bit_length, dtype=np.int64)
        L = demod.nb_channel_llr(jax.random.PRNGKey(7), tx, constellation(2),
                                 sigma, batch=B, q=code.q)
        for meth, fn in (("qspa", pallas_qspa.decode_flooding),
                         ("layered_qspa", pallas_qspa.decode_layered)):
            got = jax.jit(lambda x, f=fn: f(x, code, 20))(L)
            ref = jax.jit(lambda x, m=meth: nb_decode.decode(x, code, m,
                                                             20))(L)
            tol = 1 if meth == "layered_qspa" else 0
            rows.append(_report(f"pallas_qspa[{scheme}]/{meth}/{name}",
                                got, ref, iter_tol=tol))
    return rows


def qc_cases():
    from cuda_ldpc_tpu.models.nb_code import NBCode
    from cuda_ldpc_tpu.ops import channel, demod, nb_decode, pallas_qspa_qc
    from cuda_ldpc_tpu.utils.constellations import constellation
    code = NBCode.from_registry("Tanner_74_9_Z128_GF16")
    sigma = channel.sigma_from_snr(4.5, code.rate, "ebn0", 1.0)
    tx = np.zeros(code.bit_length, dtype=np.int64)
    L = demod.nb_channel_llr(jax.random.PRNGKey(3), tx, constellation(2),
                             sigma, batch=8, q=code.q)
    rows = []
    for meth, fn in (("qspa", pallas_qspa_qc.decode_flooding),
                     ("glayered_qspa", pallas_qspa_qc.decode_layered)):
        got = jax.jit(lambda x, f=fn: f(x, code, 10))(L)
        ref = jax.jit(lambda x, m=meth: nb_decode.decode(x, code, m, 10))(L)
        rows.append(_report(f"pallas_qspa_qc/{meth}/Tanner_74_9_Z128_GF16",
                            got, ref, iter_tol=1))
    return rows


def main():
    print(f"# device parity run, backend={jax.default_backend()}, "
          f"{time.strftime('%Y-%m-%d %H:%M')}", flush=True)
    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — this validates nothing about "
              "Mosaic; run on the TPU.", flush=True)
    rows = []
    groups = [("binary", binary_cases),
              ("binary_stream", binary_stream_cases),
              ("nb", nb_cases), ("qc", qc_cases),
              ("nbms", nbms_cases), ("nb_stream", nb_stream_cases)]
    only = sys.argv[1:] or None
    if only:
        groups = [g for g in groups if g[0] in only]
    for gname, g in groups:
        try:
            rows += g()
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            row = {"kernel": f"{gname}/*", "pass": False, "error": msg}
            rows.append(row)
            print(json.dumps(row), flush=True)
    npass = sum(1 for r in rows if r.get("pass"))
    print(f"# {npass}/{len(rows)} kernels pass", flush=True)
    return 0 if npass == len(rows) else 1


if __name__ == "__main__":
    sys.exit(main())
