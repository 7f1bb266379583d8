"""Mod-2 matrix multiplication — the MXU workhorse of this framework.

All GF(2^m)-linear maps with *fixed* constants (RS encode, RS syndromes,
Chien evaluation, BCH syndromes, dense LDPC ops) reduce to
``bits @ M mod 2`` with a 0/1 matrix M.  On TPU this runs on the MXU:
0/1 bf16 inputs with float32 accumulation are exact for inner dimensions
up to 2^24, and the final mod-2 is a cheap elementwise op on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gf2_matmul(x_bits, mat_bits):
    """(x_bits @ mat_bits) mod 2.

    x_bits:  [..., K] 0/1 (any integer/float dtype)
    mat_bits:[K, N]    0/1
    returns: [..., N] int8 0/1

    Uses bf16 operands with f32 accumulation (exact: products are 0/1 and
    partial sums are integers < 2^24).
    """
    acc = jnp.dot(
        x_bits.astype(jnp.bfloat16),
        mat_bits.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (acc.astype(jnp.int32) & 1).astype(jnp.int8)


def gf2_matmul_f32(x_bits, mat_bits):
    """Same contract as gf2_matmul but with f32 operands (CPU-friendly)."""
    acc = jnp.dot(
        x_bits.astype(jnp.float32),
        mat_bits.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return (acc.astype(jnp.int32) & 1).astype(jnp.int8)


def parity_weights(x_bits, mat_bits):
    """Integer accumulation (no mod): returns int32 counts [..., N]."""
    acc = jnp.dot(
        x_bits.astype(jnp.bfloat16),
        mat_bits.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return acc.astype(jnp.int32)
