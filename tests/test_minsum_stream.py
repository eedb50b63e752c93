"""Stateful fused binary stream step (interpret mode on CPU) vs a
loop-level reference driving minsum.build_core with the stream engine's
per-iteration semantics (decide -> check -> account -> frozen step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_ldpc_tpu.models.qc_binary import QCBinaryCode
from cuda_ldpc_tpu.ops import minsum, pallas_minsum_stream
from cuda_ldpc_tpu.ops.pallas_minsum import _lane_pad


@pytest.fixture(scope="module")
def code():
    return QCBinaryCode.from_registry("J4_L24_Z96")


def _chan(code, B, sigma, seed=0):
    rng = np.random.default_rng(seed)
    return (1.0 + sigma * rng.normal(size=(B, code.L, code.Z))
            ).astype(np.float32)


def _ref_stream(code, chan_bLZ, k, max_iters, check, schedule):
    """Python loop over minsum.build_core with the kernel's accounting."""
    B = chan_bLZ.shape[0]
    core = minsum.build_core(code, schedule=schedule)
    carry = core.init(jnp.asarray(chan_bLZ))
    t = np.zeros(B, np.int32)
    done = np.zeros(B, bool)
    okf = np.zeros(B, bool)
    hard = None
    for _ in range(k):
        if done.all():
            break
        hard, totals = core.decide(carry)
        ok = np.asarray(minsum._check(code, hard, check))
        fin = ~done & (ok | (t >= max_iters))
        okf = np.where(fin, ok, okf)
        done |= fin
        cont = ~done
        t = t + cont
        carry = core.step(carry, totals, jnp.asarray(cont))
    return np.asarray(hard), t, done, okf


@pytest.mark.parametrize("schedule", ["flooding", "layered"])
@pytest.mark.parametrize("check", ["zero", "syndrome"])
def test_stream_step_matches_core(code, schedule, check):
    B, k, max_it = 8, 6, 12
    chan = _chan(code, B, sigma=0.42, seed=3)
    Zp = _lane_pad(code.Z)
    # kernel state: col-major, lane-padded with zeros
    chan_cm = np.zeros((code.L, B, Zp), np.float32)
    chan_cm[:, :, :code.Z] = chan.transpose(1, 0, 2)
    R0 = jnp.zeros((code.num_edges, B, Zp), jnp.float32)
    z = jnp.zeros((B, 128), jnp.int32)
    chan2, R2, hard, t2, d2, o2 = pallas_minsum_stream.stream_step(
        jnp.asarray(chan_cm), R0, z, z, z, code, k=k, max_iters=max_it,
        check=check, layered=(schedule == "layered"), interpret=True)
    rh, rt, rd, ro = _ref_stream(code, chan, k, max_it, check, schedule)
    got_hard = np.asarray(hard)[:, :, :code.Z].transpose(1, 0, 2)
    np.testing.assert_array_equal(np.asarray(t2)[:, 0], rt)
    np.testing.assert_array_equal(np.asarray(d2)[:, 0], rd.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(o2)[:, 0], ro.astype(np.int32))
    np.testing.assert_array_equal(got_hard.astype(bool), rh.astype(bool))
    # finished slots leave with zeroed messages (driver contract)
    Rn = np.asarray(R2)
    assert (Rn[:, rd, :] == 0).all()


def test_stream_step_state_persists(code):
    """Two k=3 calls == one k=6 call (state round-trips through HBM)."""
    B, max_it = 8, 12
    chan = _chan(code, B, sigma=0.60, seed=9)
    Zp = _lane_pad(code.Z)
    chan_cm = np.zeros((code.L, B, Zp), np.float32)
    chan_cm[:, :, :code.Z] = chan.transpose(1, 0, 2)
    z = jnp.zeros((B, 128), jnp.int32)
    R0 = jnp.zeros((code.num_edges, B, Zp), jnp.float32)
    one = pallas_minsum_stream.stream_step(
        jnp.asarray(chan_cm), R0, z, z, z, code, k=6, max_iters=max_it,
        check="syndrome", interpret=True)
    st = (jnp.asarray(chan_cm), R0, z, z, z)
    d1 = None
    for _ in range(2):
        c, R, hard, t, d, o = pallas_minsum_stream.stream_step(
            *st, code, k=3, max_iters=max_it, check="syndrome",
            interpret=True)
        if d1 is None:
            d1 = np.asarray(d)[:, 0] == 1
        st = (c, R, t, d, o)
    np.testing.assert_array_equal(np.asarray(one[3])[:, 0],
                                  np.asarray(t)[:, 0])
    np.testing.assert_array_equal(np.asarray(one[4])[:, 0],
                                  np.asarray(d)[:, 0])
    # frames that finished in call 1 had their messages zeroed (the driver
    # refills them before the next call, so their later hard is undefined);
    # frames alive into call 2 must match the single-call decode exactly
    alive = ~d1
    np.testing.assert_array_equal(np.asarray(one[2])[:, alive],
                                  np.asarray(hard)[:, alive])
    assert alive.any()
