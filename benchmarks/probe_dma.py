"""Measure pipelined row-gather DMA throughput HBM -> VMEM on the TPU.

Design probe for the big-block streaming BP kernel (PROFILING.md "Big
blocks"): the var-side gather/scatter moves R random [8k, 128] int32
rows per iteration between HBM-resident message planes and VMEM.  The
kernel is viable iff row-granular async copies sustain a useful
fraction of HBM bandwidth; this probe measures rows/s and GB/s for

  * row heights 8/16/32 sublanes (4/8/16 KB per row at 128 lanes i32)
  * a one-semaphore flood (start all R, wait once at the end)
  * a depth-D ring (start k, wait k-D) for comparison
  * the contiguous-plane DMA upper bound (one big copy)

Run: python benchmarks/probe_dma.py  (real TPU via the axon tunnel)
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _time(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# --------------------------------------------------------------- gather


def gather_flood(idx, src, rows, sub, repeat):
    """Gather `rows` rows of height `sub`; one sem, wait-all at end.
    Repeats `repeat` times inside the kernel to amortize launch cost."""

    def kern(idx_ref, src_ref, out_ref, dst, sem):
        def rep(r, _):
            def body(k, _):
                j = idx_ref[k]
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(j * sub, sub), :],
                    dst.at[pl.ds(k * sub, sub), :],
                    sem,
                ).start()
                return 0

            jax.lax.fori_loop(0, rows, body, 0)
            # wait for all `rows` completions on the single semaphore
            def wbody(k, _):
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(idx_ref[k] * sub, sub), :],
                    dst.at[pl.ds(k * sub, sub), :],
                    sem,
                ).wait()
                return 0

            jax.lax.fori_loop(0, rows, wbody, 0)
            return 0

        jax.lax.fori_loop(0, repeat, rep, 0)
        out_ref[:] = dst[pl.ds(0, 8), :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows * sub, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(idx, src)


def gather_ring(idx, src, rows, sub, repeat, depth=8):
    """Same gather with a depth-D semaphore ring (start k, wait k-D)."""

    def kern(idx_ref, src_ref, out_ref, dst, sems):
        def mk(k):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[k] * sub, sub), :],
                dst.at[pl.ds(k * sub, sub), :],
                sems.at[k % depth],
            )

        def rep(r, _):
            def body(k, _):
                @pl.when(k >= depth)
                def _():
                    mk(k - depth).wait()

                mk(k).start()
                return 0

            jax.lax.fori_loop(0, rows, body, 0)

            def drain(k, _):
                mk(k).wait()
                return 0

            jax.lax.fori_loop(rows - depth, rows, drain, 0)
            return 0

        jax.lax.fori_loop(0, repeat, rep, 0)
        out_ref[:] = dst[pl.ds(0, 8), :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows * sub, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(idx, src)


def plane_copy(src, rows, sub, repeat):
    """Contiguous upper bound: one DMA of rows*sub sublanes."""

    def kern(src_ref, out_ref, dst, sem):
        def rep(r, _):
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(0, rows * sub), :], dst, sem
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, repeat, rep, 0)
        out_ref[:] = dst[pl.ds(0, 8), :]

    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows * sub, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(src)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    N = 65536          # source rows (8-sublane units) ~ big-code scale
    ROWS = 2048        # rows gathered per repeat
    REPEAT = 50

    for sub in (8, 16, 32):
        nsrc = N // (sub // 8)
        src = jnp.asarray(
            rng.integers(0, 1 << 30, (nsrc * sub, LANES), dtype=np.int32)
        )
        idx = jnp.asarray(
            rng.integers(0, nsrc, (ROWS,), dtype=np.int32)
        )
        row_bytes = sub * LANES * 4
        total = ROWS * REPEAT * row_bytes

        dt = _time(functools.partial(gather_flood, idx, src, ROWS, sub, REPEAT))
        print(
            f"flood sub={sub:2d} ({row_bytes//1024:3d}KB/row): "
            f"{ROWS*REPEAT/dt/1e6:8.2f} Mrows/s  {total/dt/1e9:8.1f} GB/s  "
            f"{dt/(ROWS*REPEAT)*1e9:7.1f} ns/row"
        )

        dt = _time(functools.partial(gather_ring, idx, src, ROWS, sub, REPEAT))
        print(
            f"ring8 sub={sub:2d} ({row_bytes//1024:3d}KB/row): "
            f"{ROWS*REPEAT/dt/1e6:8.2f} Mrows/s  {total/dt/1e9:8.1f} GB/s  "
            f"{dt/(ROWS*REPEAT)*1e9:7.1f} ns/row"
        )

        dt = _time(functools.partial(plane_copy, src, ROWS, sub, REPEAT))
        print(
            f"plane sub={sub:2d} ({ROWS*row_bytes//1024} KB/copy): "
            f"{total/dt/1e9:8.1f} GB/s"
        )


if __name__ == "__main__":
    main()
