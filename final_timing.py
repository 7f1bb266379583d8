import time, numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
from libpoporon_tpu.config import LdpcConfig, LdpcRate
from libpoporon_tpu.models.ldpc import LDPCCodec
rng = np.random.default_rng(7)
B = 131072
lc = LDPCCodec(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2))
lx = LDPCCodec(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2, use_pallas="off"))
info = rng.integers(0, 256, (B, lc.info_bytes), dtype=np.uint8)
par = np.asarray(lc.encode(info))
cw = np.concatenate([info, par], axis=1)
pos = rng.integers(0, lc.codeword_bits, (B, 4))
for k in range(4):
    cw[np.arange(B), pos[:,k]//8] ^= (1 << (7 - pos[:,k]%8)).astype(np.uint8)
cwj = jax.device_put(cw)
cb = np.unpackbits(cw, axis=1)[:, :lc.codeword_bits]
clean = np.where(cb == 1, -90.0, 90.0)
noisy = clean + rng.normal(0, 38.6, clean.shape)
llr = np.clip(np.round(noisy), -127, 127).astype(np.int8)
lj = jax.device_put(llr)
def timeit(fn, n=3):
    jax.block_until_ready(fn()); jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n): r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n
bits = lc.codeword_bits
for name, f in (("hard", lambda c=lc: c.decode_hard_adaptive(cwj, 50)),
                ("soft", lambda c=lc: c.decode_soft_adaptive(lj, 50))):
    a = tuple(map(np.asarray, f(lc)))
    b = tuple(map(np.asarray, f(lx)))
    ex = all((x==y).all() for x,y in zip(a,b))
    t = timeit(lambda: f(lc))
    tx = timeit(lambda: f(lx))
    print(f"{name}: pallas {t*1e3:7.2f} ms ({B*bits/t/1e6:5.0f} Mb/s)  xla {tx*1e3:7.2f} ms ({B*bits/tx/1e6:5.0f} Mb/s)  x{tx/t:.2f} exact={ex}", flush=True)
t = timeit(lambda: lc._decode_hard(cwj, 50), n=2)
print(f"plain hard: {t*1e3:7.2f} ms ({B*bits/t/1e6:5.0f} Mb/s)", flush=True)
