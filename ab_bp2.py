"""Per-iteration cost: plain XLA chunked BP vs fused Pallas kernel."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from libpoporon_tpu.config import LdpcConfig, LdpcRate
from libpoporon_tpu.models.ldpc import LDPCCodec, LLR_MAX, LLR_INFINITY
from libpoporon_tpu.models import ldpc_pallas as lp

lc = LDPCCodec(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2))
kern = lp.BPPallasKernel(lc.structure)
rng = np.random.default_rng(7)

B = 131072
info = rng.integers(0, 256, (B, lc.info_bytes), dtype=np.uint8)
par = np.asarray(lc.encode(info))
cw = np.concatenate([info, par], axis=1)
pos = rng.integers(0, lc.codeword_bits, (B, 4))
cwf = cw.copy()
byte = pos // 8
bit = 7 - pos % 8
for k in range(4):
    cwf[np.arange(B), byte[:, k]] ^= (1 << bit[:, k]).astype(np.uint8)
cw_j = jnp.asarray(cwf)

def timeit(fn, n=3):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n

@jax.jit
def pallas_hard(cwb, MI):
    bits_in = lc._unpack_cw_T(cwb)
    work = lc.deinterleave_bits_T(bits_in)
    Bt = work.shape[1]
    llr0 = jnp.where(work == 1, -LLR_INFINITY, LLR_INFINITY).astype(jnp.int32)
    llr0_p = jnp.concatenate([llr0, jnp.full((1, Bt), LLR_MAX, jnp.int32)], axis=0)
    ok, out, iters = kern.bp(llr0_p, None, MI)
    return ok, lc._pack_cw_T(out[: lc.codeword_bits]), iters

# convergence profile
ok, _, it = map(np.asarray, pallas_hard(cw_j, 50))
print("conv rate:", ok.mean(), "mean iters:", it[ok].mean(), "p99:", np.percentile(it[ok], 99))

for MI in (1, 2, 5, 50):
    t_x = timeit(lambda: lc._decode_hard(cw_j, MI))
    t_p = timeit(lambda: pallas_hard(cw_j, MI))
    print(f"MI={MI:3d}  XLA plain {t_x*1e3:8.2f} ms   Pallas {t_p*1e3:8.2f} ms")

# prep-only cost (MI=0 -> one detect trip)
t_p0 = timeit(lambda: pallas_hard(cw_j, 0))
print(f"Pallas MI=0 (prep + 1 detect trip): {t_p0*1e3:.2f} ms")
