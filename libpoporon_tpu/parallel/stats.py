"""Collective statistics: the only cross-device traffic in the framework.

BER / iteration statistics ride ICI (intra-slice) or DCN (multi-host)
via psum; codeword payloads never cross devices (SURVEY.md §2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import BATCH_AXIS


def ber_stats(bits_ref, bits_out, axis_name: str | None = BATCH_AXIS):
    """Bit-error-rate over a (possibly sharded) batch.

    Inside shard_map/pjit with `axis_name` bound, reduces with psum;
    otherwise reduces locally.
    Returns dict(errors, total, ber).
    """
    err = jnp.sum(bits_ref != bits_out)
    tot = jnp.asarray(bits_ref.size, dtype=jnp.int32)
    if axis_name is not None:
        try:
            err = jax.lax.psum(err, axis_name)
            tot = jax.lax.psum(tot, axis_name)
        except NameError:
            pass
    return dict(errors=err, total=tot, ber=err / jnp.maximum(tot, 1))


def iteration_histogram(iters, max_iterations: int, axis_name: str | None = BATCH_AXIS):
    """Histogram of BP iteration counts [0..max_iterations], psum-reduced."""
    hist = jnp.sum(
        jax.nn.one_hot(iters, max_iterations + 1, dtype=jnp.int32), axis=0
    )
    if axis_name is not None:
        try:
            hist = jax.lax.psum(hist, axis_name)
        except NameError:
            pass
    return hist
