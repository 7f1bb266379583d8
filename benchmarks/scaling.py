"""Scaling benchmark: the five BASELINE.json configs at 1 device vs the
full mesh.

Codewords are independent, so the data path generates zero cross-device
traffic and codewords/s should scale linearly with devices (>90% target,
BASELINE.json:5).  Each config is measured two ways at each device
count: the decode is wrapped in shard_map so every device runs the
identical local program on its batch shard (the explicit-SPMD execution
style of parallel/pipeline.py), and efficiency is
full_mesh_cws / (one_device_cws * n).

On real hardware this runs over all visible TPU chips/hosts (call
`libpoporon_tpu.parallel.distributed_init` per host first); without a
pod it runs on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py

Results are printed as JSON and written to
benchmarks/scaling_results_<platform><n>.json for BASELINE.md.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment pre-imports jax with JAX_PLATFORMS=axon via
# sitecustomize, so env vars alone don't switch platforms; mirror
# tests/conftest.py and go through jax.config.  PPTPU_SCALING_PLATFORM
# selects the platform (default cpu = the 8-device virtual mesh).
_plat = os.environ.get("PPTPU_SCALING_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax as _jax_early

if _plat:
    _jax_early.config.update("jax_platforms", _plat)

import numpy as np


def _measure(fn, warmup=1, iters=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _shard_run(dev_list, local_fn, arrays, out_specs):
    """shard_map local_fn over a 1-D batch mesh; returns a timed callable."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from libpoporon_tpu.parallel.mesh import batch_mesh, BATCH_AXIS

    mesh = batch_mesh(dev_list)
    in_specs = tuple(P(BATCH_AXIS) if a.ndim == 1 else P(BATCH_AXIS, None)
                     for a in arrays)
    step = jax.jit(shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs))
    sharded = [
        jax.device_put(a, NamedSharding(mesh, s))
        for a, s in zip(arrays, in_specs)
    ]
    return lambda: step(*sharded)


def main():
    import jax
    from jax.sharding import PartitionSpec as P

    import libpoporon_tpu as pp
    from libpoporon_tpu.config import LdpcConfig, LdpcRate
    from libpoporon_tpu.models.ldpc import LDPCCodec
    from libpoporon_tpu.parallel.mesh import BATCH_AXIS
    from libpoporon_tpu.utils import bits as bitutils
    from libpoporon_tpu.utils.faults import awgn_llrs

    devices = jax.devices()
    n = len(devices)
    platform = devices[0].platform
    results = {"devices": n, "platform": platform}
    # per-device batch sizes (scaled up on real TPU)
    big = platform == "tpu"
    RS_B = 16384 if big else 2048
    BCH_B = 16384 if big else 4096
    LDPC_B = 16384 if big else 2048

    rng = np.random.default_rng(0)
    pb = P(BATCH_AXIS)
    pb2 = P(BATCH_AXIS, None)

    # ---- config 1: RS(255,223) decode, 2 symbol errors ----
    codec = pp.create(pp.rs_config_default())
    rs = codec._rs

    def mk_rs(dev_list):
        B = RS_B * len(dev_list)
        data = rng.integers(0, 256, (B, 223), dtype=np.uint8)
        parity = np.asarray(rs.encode(data))
        bad = data.copy()
        bad[:, 5] ^= 0x1F
        bad[:, 99] ^= 0xE3
        fn = _shard_run(
            dev_list,
            lambda d, p: rs._decode_plain(d, p),
            [bad, parity],
            (pb, pb2, pb2, pb),
        )
        return fn, B

    # ---- config 2: RS erasure decode, 32 known positions ----
    def mk_rs_erasure(dev_list):
        B = RS_B * len(dev_list)
        data = rng.integers(0, 256, (B, 223), dtype=np.uint8)
        parity = np.asarray(rs.encode(data))
        epos = np.sort(rng.choice(223, 32, replace=False)).astype(np.int32)
        bad = data.copy()
        bad[:, epos] ^= 0xFF
        posb = np.broadcast_to(epos[None], (B, 32)).copy()
        cnts = np.full(B, 32, dtype=np.int32)
        fn = _shard_run(
            dev_list,
            lambda d, p, e, c: rs._decode_erasure(d, p, e, c),
            [bad, parity, posb, cnts],
            (pb, pb2, pb2, pb),
        )
        return fn, B

    # ---- config 3: BCH(15,5) t=3 ----
    bch = pp.create(pp.bch_config_default())._bch

    def mk_bch(dev_list):
        B = BCH_B * len(dev_list)
        words = rng.integers(0, 1 << 15, (B,), dtype=np.int32)
        wbits = ((words[:, None] >> np.arange(15)) & 1).astype(np.int32)
        fn = _shard_run(
            dev_list,
            lambda w: bch._decode_bits(w),
            [wbits],
            (pb, pb2, pb),
        )
        return fn, B

    # ---- config 4: LDPC r=1/2 n=128B hard ----
    lc = LDPCCodec(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2))

    def mk_ldpc_hard(dev_list):
        B = LDPC_B * len(dev_list)
        info = rng.integers(0, 256, (B, lc.info_bytes), dtype=np.uint8)
        par = np.asarray(lc.encode(info))
        cw = np.concatenate([info, par], axis=1)
        fl = np.argsort(rng.random((B, lc.codeword_bits)), axis=1)[:, :4]
        rows4 = np.repeat(np.arange(B), 4)
        np.bitwise_xor.at(
            cw, (rows4, fl.reshape(-1) // 8),
            (1 << (7 - (fl.reshape(-1) % 8))).astype(np.uint8),
        )
        chunk = min(lc.DECODE_CHUNK, LDPC_B)
        fn = _shard_run(
            dev_list,
            lambda c: lc._chunked_scan(lc._decode_hard_body, c, 50, chunk),
            [cw],
            (pb, pb2, pb),
        )
        return fn, B

    # ---- config 5: LDPC r=1/2 soft at ~1e-2 raw BER ----
    def mk_ldpc_soft(dev_list):
        B = LDPC_B * len(dev_list)
        info = rng.integers(0, 256, (B, lc.info_bytes), dtype=np.uint8)
        par = np.asarray(lc.encode(info))
        cw = np.concatenate([info, par], axis=1)
        cb = bitutils.unpack_np(cw, lc.codeword_bits)
        llr = awgn_llrs(cb, snr_db=4.3, rng=2)
        chunk = min(lc.DECODE_CHUNK, LDPC_B)
        fn = _shard_run(
            dev_list,
            lambda l: lc._chunked_scan(lc._decode_soft_body, l, 50, chunk),
            [llr],
            (pb, pb2, pb),
        )
        return fn, B

    configs = [
        ("rs_decode_2err", mk_rs),
        ("rs_erasure_32", mk_rs_erasure),
        ("bch15", mk_bch),
        ("ldpc_hard_128B", mk_ldpc_hard),
        ("ldpc_soft_128B", mk_ldpc_soft),
    ]
    for name, mk in configs:
        fn1, B1 = mk(devices[:1])
        one = B1 / _measure(fn1)
        if n > 1:
            fnN, BN = mk(devices)
            full = BN / _measure(fnN)
        else:
            full = one
        eff = full / (one * n)
        results[name] = {
            "one_device_cws": round(one, 1),
            f"{n}_device_cws": round(full, 1),
            "scaling_efficiency": round(eff, 4),
        }
        print(f"# {name}: 1dev={one:,.0f} cw/s  {n}dev={full:,.0f} cw/s  "
              f"eff={eff:.1%}", file=sys.stderr, flush=True)

    print(json.dumps(results, indent=2))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"scaling_results_{platform}{n}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
