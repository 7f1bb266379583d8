"""Probe: serial fori_loop gather vs static-unrolled gather in Pallas on v5e."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANES = 8, 128
V1 = 1025
NC = 5533
rng = np.random.default_rng(0)
idx_np = rng.integers(0, V1, NC).astype(np.int32)
idx = jnp.asarray(idx_np)

REP = 20  # gathers per kernel call (amortize launch)

def make_dyn():
    def kern(idx_ref, src_hbm, out_ref, src_ref, dst_ref, sem):
        cp = pltpu.make_async_copy(src_hbm, src_ref, sem)
        cp.start(); cp.wait()
        def one(r, _):
            def body(k, _):
                j = idx_ref[k]
                dst_ref[pl.ds(SUB * k, SUB), :] = src_ref[pl.ds(SUB * j, SUB), :]
                return 0
            jax.lax.fori_loop(0, NC, body, 0)
            return r
        jax.lax.fori_loop(0, REP, one, 0)
        out_ref[:] = dst_ref[:SUB, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((V1 * SUB, LANES), jnp.int32),
            pltpu.VMEM((NC * SUB, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    @jax.jit
    def run(src):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((SUB, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128*1024*1024),
        )(idx, src)
    return run

def make_static(n_unroll=NC):
    def kern(src_hbm, out_ref, src_ref, dst_ref, sem):
        cp = pltpu.make_async_copy(src_hbm, src_ref, sem)
        cp.start(); cp.wait()
        def one(r, _):
            for k in range(n_unroll):
                j = int(idx_np[k])
                dst_ref[SUB * k : SUB * (k + 1), :] = src_ref[SUB * j : SUB * (j + 1), :]
            return r
        jax.lax.fori_loop(0, REP, one, 0)
        out_ref[:] = dst_ref[:SUB, :]
    @jax.jit
    def run(src):
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SUB, LANES), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((V1 * SUB, LANES), jnp.int32),
                pltpu.VMEM((NC * SUB, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128*1024*1024),
        )(src)
    return run

src = jnp.asarray(rng.integers(-1000, 1000, (V1 * SUB, LANES), dtype=np.int32))

for name, mk in [("dynamic", make_dyn), ("static", make_static)]:
    t0 = time.perf_counter()
    run = mk()
    try:
        jax.block_until_ready(run(src))
    except Exception as e:
        print(f"{name}: COMPILE FAIL {str(e)[:200]}")
        continue
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        r = run(src)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / N
    per_row = dt / (REP * NC) * 1e9
    print(f"{name}: compile {tc:.1f}s  run {dt*1e3:.3f} ms  {per_row:.2f} ns/row-copy")
