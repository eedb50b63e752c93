"""shard_map parity: the fused Pallas kernels partitioned over the 8-device
CPU mesh must reproduce the single-call jnp path bit-exactly (interpret mode
stands in for Mosaic on CPU, as in every kernel test).

Covers VERDICT-r4 item 1: multi-device meshes now run the fused kernels via
parallel/shard.py instead of falling back to jnp (sim._shard_decode /
_nb_decoder_fn / _make_binary_stream_pallas)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_ldpc_tpu import config as cfg, sim
from cuda_ldpc_tpu.models.nb_code import NBCode
from cuda_ldpc_tpu.models.qc_binary import QCBinaryCode
from cuda_ldpc_tpu.ops import (demod, minsum, nb_decode, pallas_minsum,
                               pallas_minsum_stream, pallas_qspa)
from cuda_ldpc_tpu.parallel import (get_mesh, shard_binary_decode,
                                    shard_nb_decode, shard_stream_step)
from cuda_ldpc_tpu.utils.constellations import constellation


@pytest.fixture(scope="module")
def mesh():
    m = get_mesh()
    assert m.devices.size == 8
    return m


def _chan(code, B, seed=0, sigma=0.8):
    return 1.0 + sigma * jax.random.normal(
        jax.random.PRNGKey(seed), (B, code.L, code.Z), dtype=jnp.float32)


@pytest.mark.parametrize("sched", ["flooding", "layered"])
def test_binary_shard_map_parity(mesh, sched):
    code = QCBinaryCode.from_registry("J4_L24_Z96")
    B = 16                      # 2 frames per device
    chan = _chan(code, B)
    base = functools.partial(
        pallas_minsum.decode_layered if sched == "layered"
        else pallas_minsum.decode_flooding, interpret=True)
    sharded = shard_binary_decode(base, mesh, col_major=False)
    got = jax.jit(lambda c: sharded(c, code, 6, check="syndrome"))(chan)
    jfn = (minsum.decode_layered if sched == "layered"
           else minsum.decode_flooding)
    ref = jax.jit(lambda c: jfn(c, code, 6, check="syndrome"))(chan)
    np.testing.assert_array_equal(np.asarray(got.hard), np.asarray(ref.hard))
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
    # iters: pmax over shards of per-shard tile maxima == global tile max
    assert int(got.iters) == int(ref.iters)


def test_binary_shard_map_col_major(mesh):
    code = QCBinaryCode.from_registry("J4_L24_Z96")
    B = 16
    chan = _chan(code, B).transpose(1, 0, 2)
    base = functools.partial(pallas_minsum.decode_flooding, interpret=True)
    sharded = shard_binary_decode(base, mesh, col_major=True)
    got = jax.jit(lambda c: sharded(c, code, 6, check="zero",
                                    col_major=True))(chan)
    ref = jax.jit(lambda c: minsum.decode_flooding(
        c.transpose(1, 0, 2), code, 6, check="zero"))(chan)
    np.testing.assert_array_equal(
        np.asarray(got.hard).transpose(1, 0, 2), np.asarray(ref.hard))
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
    with pytest.raises(ValueError):
        sharded(chan, code, 6)          # wrap is layout-pinned


def test_nb_shard_map_parity(mesh):
    code = NBCode.from_registry("BDS.576.288.GF.64")
    B = 8
    sigma = 0.9
    L = demod.nb_channel_llr(jax.random.PRNGKey(1),
                             np.zeros(code.bit_length, int),
                             constellation(2), sigma, batch=B, q=code.q)
    base = functools.partial(pallas_qspa.decode_layered, code=code,
                             max_iters=3, interpret=True)
    sharded = shard_nb_decode(lambda x: base(x), mesh)
    got = jax.jit(sharded)(L)
    ref = jax.jit(lambda x: nb_decode.decode(x, code, "layered_qspa", 3))(L)
    np.testing.assert_array_equal(np.asarray(got.hard), np.asarray(ref.hard))
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
    np.testing.assert_array_equal(np.asarray(got.iters),
                                  np.asarray(ref.iters))


def test_stream_step_shard_map_parity(mesh):
    """One sharded fused stream step == the same step run unsharded."""
    code = QCBinaryCode.from_registry("J4_L24_Z96")
    from cuda_ldpc_tpu.ops.pallas_minsum import _lane_pad
    B = 64                      # 8 slots per device (tile_b=8)
    Zp = _lane_pad(code.Z)
    chan = np.zeros((code.L, B, Zp), np.float32)
    chan[:, :, :code.Z] = np.asarray(_chan(code, B, seed=3)).transpose(1, 0, 2)
    chan = jnp.asarray(chan)
    R = jnp.zeros((code.num_edges, B, Zp), jnp.float32)
    z = jnp.zeros((B, 128), jnp.int32)
    step = functools.partial(pallas_minsum_stream.stream_step, code=code,
                             k=3, max_iters=6, check="zero", interpret=True)
    ref = jax.jit(lambda *a: step(*a))(chan, R, z, z, z)
    sh = shard_stream_step(step, mesh, n_state3=2, n_flags=3)
    got = jax.jit(lambda *a: sh(*a))(chan, R, z, z, z)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_sim_dispatch_wraps_on_multidevice(mesh, monkeypatch):
    """kernel='pallas' + an 8-device mesh end-to-end through make_binary_step
    (sim.PALLAS_INTERPRET routes the fused dispatch through the callback-free
    interpreter on the CPU backend)."""
    monkeypatch.setattr(sim, "PALLAS_INTERPRET", True)
    scfg = cfg.BinarySimConfig(
        code="J4_L24_Z96", batch_per_device=2,
        decoder=cfg.BinaryDecoderConfig(max_iters=4, kernel="pallas"))
    fn, B = sim.make_binary_step(QCBinaryCode.from_registry("J4_L24_Z96"),
                                 scfg, mesh)
    assert B == 16
    out = np.asarray(fn(jax.random.PRNGKey(0), 0.7))
    assert out.shape == (5,) and out[1] <= B
