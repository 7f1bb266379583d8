"""A/B: XLA BP loop vs fused Pallas BP kernel, 128B rate-1/2, hard+soft."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from libpoporon_tpu.config import LdpcConfig, LdpcRate
from libpoporon_tpu.models.ldpc import LDPCCodec, LLR_MAX, LLR_INFINITY
from libpoporon_tpu.models import ldpc_pallas as lp

print(jax.devices())
lc = LDPCCodec(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2))
kern = lp.BPPallasKernel(lc.structure)
rng = np.random.default_rng(7)

B = 131072
MI = 50
info = rng.integers(0, 256, (B, lc.info_bytes), dtype=np.uint8)
par = np.asarray(lc.encode(info))
cw = np.concatenate([info, par], axis=1)
# 4 random bit flips per codeword (the bench's noise model)
for _ in range(1):
    pass
pos = rng.integers(0, lc.codeword_bits, (B, 4))
for k in range(4):
    np.add.at  # noop
cwf = cw.copy()
rows = np.arange(B)[:, None]
byte = pos // 8
bit = 7 - pos % 8
for k in range(4):
    cwf[rows[:, 0], byte[:, k]] ^= (1 << bit[:, k]).astype(np.uint8)

cw_j = jnp.asarray(cwf)

def timeit(fn, n=5):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n

# --- XLA adaptive (the current product path) ---
def xla_adaptive():
    return lc.decode_hard_adaptive(cw_j, MI)

t_x = timeit(xla_adaptive)
mbit = B * lc.codeword_bits / t_x / 1e6
print(f"XLA adaptive hard : {t_x*1e3:8.2f} ms  {B/t_x/1e3:9.1f} kcw/s  {mbit:8.0f} Mbit/s")

# --- Pallas raw kernel (prep on XLA, loop in Pallas) ---
@jax.jit
def pallas_hard(cwb):
    bits_in = lc._unpack_cw_T(cwb)
    work = lc.deinterleave_bits_T(bits_in)
    Bt = work.shape[1]
    llr0 = jnp.where(work == 1, -LLR_INFINITY, LLR_INFINITY).astype(jnp.int32)
    llr0_p = jnp.concatenate([llr0, jnp.full((1, Bt), LLR_MAX, jnp.int32)], axis=0)
    ok, out, iters = kern.bp(llr0_p, None, MI)
    return ok, lc._pack_cw_T(out[: lc.codeword_bits]), iters

t_p = timeit(lambda: pallas_hard(cw_j))
mbit_p = B * lc.codeword_bits / t_p / 1e6
print(f"Pallas fused hard : {t_p*1e3:8.2f} ms  {B/t_p/1e3:9.1f} kcw/s  {mbit_p:8.0f} Mbit/s")

# verify identical
ok_x, cw_x, it_x = map(np.asarray, xla_adaptive())
ok_p, cw_p, it_p = map(np.asarray, pallas_hard(cw_j))
print("hard bitexact:", (ok_x == ok_p).all(), (cw_x == cw_p).all(), (it_x == it_p).all())

# --- soft ---
cb = np.unpackbits(cw, axis=1)[:, : lc.codeword_bits]
llr8 = np.where(cb == 1, -90, 90).astype(np.int16)
llr8 = (llr8 + rng.integers(-75, 76, llr8.shape)).clip(-127, 127).astype(np.int8)
llr_j = jnp.asarray(llr8)

def xla_soft():
    return lc.decode_soft_adaptive(llr_j, MI)

t_xs = timeit(xla_soft)
print(f"XLA adaptive soft : {t_xs*1e3:8.2f} ms  {B/t_xs/1e3:9.1f} kcw/s  {B*lc.codeword_bits/t_xs/1e6:8.0f} Mbit/s")

@jax.jit
def pallas_soft(l8):
    work = l8.astype(jnp.int32).T
    if lc.inner_inv is not None:
        g = lc.deinter_g
        work = jnp.where((g >= 0)[:, None], jnp.take(work, jnp.clip(g, 0, None), axis=0), 0)
    Bt = work.shape[1]
    work_p = jnp.concatenate([work, jnp.full((1, Bt), 125, work.dtype)], axis=0)
    channel = work_p * 256
    llr0 = jnp.clip(work_p * 256, -LLR_MAX, LLR_MAX)
    ok, out, iters = kern.bp(llr0, channel, MI)
    return ok, lc._pack_cw_T(out[: lc.codeword_bits]), iters

t_ps = timeit(lambda: pallas_soft(llr_j))
print(f"Pallas fused soft : {t_ps*1e3:8.2f} ms  {B/t_ps/1e3:9.1f} kcw/s  {B*lc.codeword_bits/t_ps/1e6:8.0f} Mbit/s")

ok_x, cw_x, it_x = map(np.asarray, xla_soft())
ok_p, cw_p, it_p = map(np.asarray, pallas_soft(llr_j))
print("soft bitexact:", (ok_x == ok_p).all(), (cw_x == cw_p).all(), (it_x == it_p).all())
print("soft conv rate:", ok_x.mean(), "mean iters:", it_x.mean())
