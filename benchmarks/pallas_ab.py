"""End-to-end adaptive decode: XLA-only vs Pallas-wired, bench noise + 1e-2 BER soft."""
import time
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from libpoporon_tpu.config import LdpcConfig, LdpcRate
from libpoporon_tpu.models.ldpc import LDPCCodec

rng = np.random.default_rng(7)
B = 131072

lc_off = LDPCCodec(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2, use_pallas="off"))
lc_on = LDPCCodec(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2, use_pallas="auto"))
print("pallas kern:", lc_on.pallas_kern is not None)

info = rng.integers(0, 256, (B, lc_off.info_bytes), dtype=np.uint8)
par = np.asarray(lc_off.encode(info))
cw = np.concatenate([info, par], axis=1)
pos = rng.integers(0, lc_off.codeword_bits, (B, 4))
cwf = cw.copy()
for k in range(4):
    cwf[np.arange(B), pos[:, k] // 8] ^= (1 << (7 - pos[:, k] % 8)).astype(np.uint8)
cw_j = jnp.asarray(cwf)

def timeit(fn, n=5):
    jax.block_until_ready(fn())
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n

bits = lc_off.codeword_bits
for name, f_off, f_on in [
    ("adaptive hard", lambda: lc_off.decode_hard_adaptive(cw_j, 50),
     lambda: lc_on.decode_hard_adaptive(cw_j, 50)),
    ("plain hard", lambda: lc_off._decode_hard(cw_j, 50),
     lambda: lc_on._decode_hard(cw_j, 50)),
]:
    t0v = timeit(f_off, n=3)
    t1v = timeit(f_on, n=3)
    a = tuple(map(np.asarray, f_off()))
    b = tuple(map(np.asarray, f_on()))
    ex = all((x == y).all() for x, y in zip(a, b))
    print(f"{name:14s} XLA {t0v*1e3:8.2f}ms ({B*bits/t0v/1e6:6.0f} Mb/s)  "
          f"Pallas {t1v*1e3:8.2f}ms ({B*bits/t1v/1e6:6.0f} Mb/s)  "
          f"x{t0v/t1v:.2f}  exact={ex}")

# soft at ~1e-2 channel BER: llr = +/-90 + N(0, 38.6) -> P(flip) ~ 1e-2
cb = np.unpackbits(cw, axis=1)[:, :bits]
clean = np.where(cb == 1, -90, 90).astype(np.float64)
noisy = clean + rng.normal(0, 38.6, clean.shape)
print("channel BER:", (np.sign(noisy) != np.sign(clean)).mean())
llr8 = np.clip(np.round(noisy), -127, 127).astype(np.int8)
lj = jnp.asarray(llr8)

for name, f_off, f_on in [
    ("adaptive soft", lambda: lc_off.decode_soft_adaptive(lj, 50),
     lambda: lc_on.decode_soft_adaptive(lj, 50)),
]:
    t0v = timeit(f_off, n=3)
    t1v = timeit(f_on, n=3)
    a = tuple(map(np.asarray, f_off()))
    b = tuple(map(np.asarray, f_on()))
    ex = all((x == y).all() for x, y in zip(a, b))
    print(f"{name:14s} XLA {t0v*1e3:8.2f}ms ({B*bits/t0v/1e6:6.0f} Mb/s)  "
          f"Pallas {t1v*1e3:8.2f}ms ({B*bits/t1v/1e6:6.0f} Mb/s)  "
          f"x{t0v/t1v:.2f}  exact={ex}")
ok, _, it = a
print("soft conv:", np.asarray(ok).mean(), "mean iters:", np.asarray(it)[np.asarray(ok)].mean())
