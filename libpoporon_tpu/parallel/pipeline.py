"""Sharded end-to-end codec pipelines.

`ShardedCodec` wraps a facade `Codec` and runs its batched kernels with
the codeword batch sharded over a device mesh.  Two execution styles:

1. `encode` / `decode`: jit with NamedSharding-annotated inputs — XLA
   partitions the program; since every op is batch-elementwise or a
   matmul against replicated constants, no communication is generated
   on the data path.
2. `decode_with_stats`: an explicit shard_map step that decodes the
   local shard and psum-reduces BER/iteration statistics across the
   mesh — the only collectives in the framework (SURVEY.md §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .mesh import BATCH_AXIS, batch_mesh, pad_to_multiple
from ..config import FecType


class ShardedCodec:
    def __init__(self, codec, mesh=None):
        self.codec = codec
        self.mesh = mesh if mesh is not None else batch_mesh()
        self.n_devices = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
        self._sharding = NamedSharding(self.mesh, P(BATCH_AXIS))

    def _put(self, x):
        return jax.device_put(jnp.asarray(x), self._sharding)

    def encode(self, data):
        data, n = pad_to_multiple(np.asarray(data), self.n_devices)
        res = self.codec.encode(self._put(data))
        return type(res)(res.data[:n], res.parity[:n])

    def decode(self, data, parity, **kw):
        data, n = pad_to_multiple(np.asarray(data), self.n_devices)
        parity, _ = pad_to_multiple(np.asarray(parity), self.n_devices)
        if kw.get("soft_llr") is not None:
            kw = dict(kw)
            kw["soft_llr"], _ = pad_to_multiple(np.asarray(kw["soft_llr"]), self.n_devices)
            kw["soft_llr"] = self._put(kw["soft_llr"])
        res = self.codec.decode(self._put(data), self._put(parity), **kw)
        return type(res)(res.ok[:n], res.data[:n], res.parity[:n], res.corrected[:n])

    # ------------------------------------------------- explicit shard_map

    def ldpc_decode_step(self, codeword, reference_bits=None):
        """One explicit-SPMD LDPC hard-decode step with psum statistics.

        codeword: uint8 [B, codeword_bytes], B divisible by the mesh.
        Returns (ok, codeword_out, iters, stats) where stats are GLOBAL
        (psum over the batch axis).
        """
        assert self.codec.fec_type == FecType.LDPC
        ldpc = self.codec._ldpc
        mesh = self.mesh
        max_it = ldpc.max_iterations

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(BATCH_AXIS, None),),
            out_specs=(P(BATCH_AXIS), P(BATCH_AXIS, None), P(BATCH_AXIS), P(), P()),
            # Pallas outputs carry no vma metadata; out_specs are explicit
            check_rep=False,
        )
        def step(cw):
            ok, out, iters = ldpc._decode_hard(cw, max_it)
            n_ok = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)), BATCH_AXIS)
            it_sum = jax.lax.psum(jnp.sum(iters), BATCH_AXIS)
            return ok, out, iters, n_ok, it_sum

        cw, n = pad_to_multiple(np.asarray(codeword), self.n_devices)
        ok, out, iters, n_ok, it_sum = jax.jit(step)(self._put(cw))
        stats = dict(converged=int(n_ok), iterations_total=int(it_sum))
        return ok[:n], out[:n], iters[:n], stats
