"""Scaling benchmark: the five BASELINE.json configs at 1 device vs the
full mesh.

Codewords are independent, so the data path generates zero cross-device
traffic and codewords/s should scale linearly with devices (>90% target,
BASELINE.json:5).  On real hardware this runs over all visible TPU
chips/hosts (call `libpoporon_tpu.parallel.distributed_init` per host
first); without a pod it can be exercised on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import libpoporon_tpu as pp
    from libpoporon_tpu.config import LdpcConfig, LdpcRate
    from libpoporon_tpu.models.ldpc import LDPCCodec
    from libpoporon_tpu.parallel.mesh import batch_mesh
    from libpoporon_tpu.utils import bits as bitutils
    from libpoporon_tpu.utils.faults import awgn_llrs

    devices = jax.devices()
    n = len(devices)
    results = {"devices": n, "platform": devices[0].platform}

    def run_rs(dev_list):
        mesh = batch_mesh(dev_list)
        sh = NamedSharding(mesh, P("batch", None))
        codec = pp.create(pp.rs_config_default())
        rs = codec._rs
        B = 2048 * len(dev_list)
        rng = np.random.default_rng(0)
        data = rng.integers(0, 256, (B, 223), dtype=np.uint8)
        parity = np.asarray(rs.encode(data))
        bad = data.copy()
        bad[:, 5] ^= 0x1F
        bad[:, 99] ^= 0xE3
        dj = jax.device_put(bad, sh)
        pj = jax.device_put(parity, sh)
        dt = _measure(lambda: rs._decode_plain(dj, pj))
        return B / dt

    def run_ldpc_soft(dev_list):
        mesh = batch_mesh(dev_list)
        sh = NamedSharding(mesh, P("batch", None))
        lc = LDPCCodec(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2))
        B = 1024 * len(dev_list)
        rng = np.random.default_rng(1)
        info = rng.integers(0, 256, (B, lc.info_bytes), dtype=np.uint8)
        par = np.asarray(lc.encode(info))
        cw = np.concatenate([info, par], axis=1)
        cb = bitutils.unpack_np(cw, lc.codeword_bits)
        # ~1e-2 raw BER channel (BASELINE config #5)
        llr = awgn_llrs(cb, snr_db=4.3, rng=2)
        lj = jax.device_put(llr, sh)
        dt = _measure(lambda: lc._decode_soft(lj, 50))
        return B / dt

    for name, fn in [("rs_decode", run_rs), ("ldpc_soft", run_ldpc_soft)]:
        one = fn(devices[:1])
        full = fn(devices) if n > 1 else one
        eff = full / (one * n)
        results[name] = {
            "one_device_cws": one,
            f"{n}_device_cws": full,
            "scaling_efficiency": eff,
        }

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
