"""Static-unrolled vs dynamic gathers in the fused BP kernel."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from libpoporon_tpu.config import LdpcConfig, LdpcRate
from libpoporon_tpu.models.ldpc import LDPCCodec, LLR_MAX, LLR_INFINITY
from libpoporon_tpu.models import ldpc_pallas as lp

lc = LDPCCodec(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2, use_pallas="off"))
rng = np.random.default_rng(7)
B = 131072
info = rng.integers(0, 256, (B, lc.info_bytes), dtype=np.uint8)
par = np.asarray(lc.encode(info))
cw = np.concatenate([info, par], axis=1)
pos = rng.integers(0, lc.codeword_bits, (B, 4))
cwf = cw.copy()
for k in range(4):
    cwf[np.arange(B), pos[:, k] // 8] ^= (1 << (7 - pos[:, k] % 8)).astype(np.uint8)
cw_j = jnp.asarray(cwf)

def timeit(fn, n=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n

def make(kern):
    @jax.jit
    def run(cwb, MI):
        bits_in = lc._unpack_cw_T(cwb)
        work = lc.deinterleave_bits_T(bits_in)
        Bt = work.shape[1]
        llr0 = jnp.where(work == 1, -LLR_INFINITY, LLR_INFINITY).astype(jnp.int32)
        llr0_p = jnp.concatenate([llr0, jnp.full((1, Bt), LLR_MAX, jnp.int32)], axis=0)
        return kern.bp(llr0_p, None, MI)
    return run

ref = None
for mode in ("dynamic", "static"):
    lp.BPPallasKernel._static_gathers = (mode == "static")
    kern = lp.BPPallasKernel(lc.structure)
    run = make(kern)
    t0 = time.perf_counter()
    try:
        jax.block_until_ready(run(cw_j, 2))
    except Exception as e:
        print(f"{mode}: COMPILE FAIL {str(e)[:300]}")
        continue
    tc = time.perf_counter() - t0
    t2 = timeit(lambda: run(cw_j, 2))
    t5 = timeit(lambda: run(cw_j, 5))
    t50 = timeit(lambda: run(cw_j, 50), n=1)
    per_trip = (t5 - t2) / 3 / 128 * 1e6
    out = tuple(map(np.asarray, run(cw_j, 50)))
    if ref is None:
        ref = out
        exact = "-"
    else:
        exact = all((a == b).all() for a, b in zip(ref, out))
    print(f"{mode:8s} compile {tc:6.1f}s  MI2 {t2*1e3:7.2f}ms  MI5 {t5*1e3:7.2f}ms  "
          f"MI50 {t50*1e3:8.2f}ms  per-block-trip {per_trip:6.1f}us  exact={exact}")
lp.BPPallasKernel._static_gathers = False
