"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

import libpoporon_tpu as pp
from libpoporon_tpu.config import LdpcConfig, LdpcRate
from libpoporon_tpu.parallel import ShardedCodec, batch_mesh
from libpoporon_tpu.parallel.mesh import shard_batch


needs_multi = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple devices"
)


@needs_multi
def test_mesh_has_8_devices():
    mesh = batch_mesh()
    assert mesh.shape["batch"] == 8


@needs_multi
def test_sharded_rs_decode():
    codec = pp.create(pp.rs_config_default())
    sc = ShardedCodec(codec)
    rng = np.random.default_rng(0)
    B = 24  # not divisible by 8 — exercises padding
    data = rng.integers(0, 256, (B, 223), dtype=np.uint8)
    parity = np.asarray(codec.encode(data).parity)
    bad = data.copy()
    bad[:, 17] ^= 0x3C
    res = sc.decode(bad, parity)
    assert np.asarray(res.ok).shape == (B,)
    assert bool(np.asarray(res.ok).all())
    np.testing.assert_array_equal(np.asarray(res.data), data)


@needs_multi
def test_sharded_matches_single_device():
    codec = pp.create(pp.rs_config_default())
    sc = ShardedCodec(codec)
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, (16, 223), dtype=np.uint8)
    parity = np.asarray(codec.encode(data).parity)
    bad = data.copy()
    bad[:, 3] ^= 0x77
    r_sharded = sc.decode(bad, parity)
    r_local = codec.decode(bad, parity)
    np.testing.assert_array_equal(np.asarray(r_sharded.data), np.asarray(r_local.data))
    np.testing.assert_array_equal(np.asarray(r_sharded.ok), np.asarray(r_local.ok))


@needs_multi
def test_ldpc_shard_map_step_with_psum_stats():
    codec = pp.create(LdpcConfig(block_size=32, rate=LdpcRate.RATE_1_2))
    sc = ShardedCodec(codec)
    rng = np.random.default_rng(2)
    B = 16
    info = rng.integers(0, 256, (B, 32), dtype=np.uint8)
    parity = np.asarray(codec._ldpc.encode(info))
    cw = np.concatenate([info, parity], axis=1)
    bad = cw.copy()
    bad[:, 5] ^= 0x08
    ok, out, iters, stats = sc.ldpc_decode_step(bad)
    assert stats["converged"] == B
    np.testing.assert_array_equal(np.asarray(out), cw)


@needs_multi
def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as g
    g.dryrun_multichip(len(jax.devices()))
