"""Unified codec facade.

Functional re-design of the reference facade (src/poporon.c,
src/encode.c:236-252, src/decode.c:596-612): one `Codec` object
dispatching on the config type, operating on *batches* of codewords
([B, ...] uint8 tensors; a 1-D input is treated as batch of one).

Differences from the C API (by design — functional, batch-first):

* `encode` returns (data_out, parity) instead of mutating `data` in
  place; for LDPC with interleaving, `data_out` is the interleaved
  data exactly as the reference would have left it in the caller's
  buffer (encode.c:170, 192-193).
* `decode` returns a DecodeResult instead of mutating; `corrected` for
  LDPC carries the iterations-used value, replicating the reference
  quirk (decode.c:535-537).
* Erasure positions and external syndromes are passed per decode call
  rather than bound at construction (poporon.c:105-106).

`last_corrected` / `iterations_used` mirror the reference getters for
migration convenience (host-side bookkeeping of the most recent call).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .config import (
    BchConfig,
    FecType,
    LdpcConfig,
    RSConfig,
)
from .erasure import Erasure
from .models.bch import BCHCodec
from .models.ldpc import LDPCCodec
from .models.rs import RSCodec
from .utils import bits as bitutils


@dataclasses.dataclass
class DecodeResult:
    ok: object          # bool [B] (or scalar)
    data: object        # uint8 [B, info]
    parity: object      # uint8 [B, parity]
    corrected: object   # int32 [B] — for LDPC: iterations used (quirk)

    def __iter__(self):
        return iter((self.ok, self.data, self.parity, self.corrected))


@dataclasses.dataclass
class EncodeResult:
    data: object
    parity: object

    def __iter__(self):
        return iter((self.data, self.parity))


class Codec:
    def __init__(self, config):
        if not isinstance(config, (RSConfig, LdpcConfig, BchConfig)):
            raise TypeError(f"unknown config type {type(config)}")
        self.config = config
        self.fec_type = config.fec_type
        self.last_corrected = 0
        self.iterations_used = 0
        if isinstance(config, RSConfig):
            self._rs = RSCodec(config)
        elif isinstance(config, LdpcConfig):
            self._ldpc = LDPCCodec(config)
        else:
            self._bch = BCHCodec(config)

    # -------------------------------------------------------- getters

    @property
    def parity_size(self) -> int:
        """poporon_get_parity_size (poporon.c:324-345)."""
        if self.fec_type == FecType.RS:
            return self._rs.num_roots
        if self.fec_type == FecType.LDPC:
            return self._ldpc.parity_bytes
        return (self._bch.n - self._bch.data_length + 7) // 8

    @property
    def info_size(self) -> int:
        """poporon_get_info_size (poporon.c:347-363)."""
        if self.fec_type == FecType.RS:
            return self._rs.fs - self._rs.num_roots
        if self.fec_type == FecType.LDPC:
            return self._ldpc.info_bytes
        return (self._bch.data_length + 7) // 8

    # --------------------------------------------------------- encode

    def encode(self, data) -> EncodeResult:
        data = jnp.asarray(data, dtype=jnp.uint8)
        squeeze = data.ndim == 1
        if squeeze:
            data = data[None]
        if self.fec_type == FecType.RS:
            parity = self._rs.encode(data)
            out = EncodeResult(data, parity)
        elif self.fec_type == FecType.LDPC:
            out = self._encode_ldpc(data)
        else:
            out = self._encode_bch(data)
        if squeeze:
            out = EncodeResult(out.data[0], out.parity[0])
        return out

    def _encode_ldpc(self, data) -> EncodeResult:
        c = self._ldpc
        if data.shape[-1] != c.info_bytes:
            raise ValueError(
                f"LDPC encode size must be {c.info_bytes} (encode.c:154)"
            )
        if c.outer_fwd is not None:
            # outer_buf[fwd[i]] = data[i]  ==  gather by inverse perm
            data = jnp.take(data, c.outer_inv, axis=-1)
        parity = c.encode(data)
        if c.inner_fwd is not None:
            cw = jnp.concatenate([data, parity], axis=-1)
            cw = c.interleave(cw)
            data = cw[..., : c.info_bytes]
            parity = cw[..., c.info_bytes :]
        return EncodeResult(data, parity)

    def _encode_bch(self, data) -> EncodeResult:
        c = self._bch
        if data.shape[-1] < c.data_bytes:
            raise ValueError("BCH encode: data too short (encode.c:211)")
        dbits = c.pack_data(data)
        cw_bits = c.encode_bits(dbits)
        parity = c.unpack_parity(cw_bits[..., : c.parity_bits])
        return EncodeResult(data, parity)

    # --------------------------------------------------------- decode

    def decode(self, data, parity, erasures=None, ext_syndrome=None,
               soft_llr=None) -> DecodeResult:
        data = jnp.asarray(data, dtype=jnp.uint8)
        parity = jnp.asarray(parity, dtype=jnp.uint8)
        squeeze = data.ndim == 1
        if squeeze:
            data = data[None]
            parity = parity[None]
            if soft_llr is not None:
                soft_llr = jnp.asarray(soft_llr, dtype=jnp.int8)
                if soft_llr.ndim == 1:
                    soft_llr = soft_llr[None]
        if self.fec_type == FecType.RS:
            if isinstance(erasures, Erasure):
                erasures = erasures.positions.astype(np.int32)
            ok, d, p, corr = self._rs.decode(
                data, parity, erasures=erasures, ext_syndrome=ext_syndrome
            )
            res = DecodeResult(ok, d, p, corr)
        elif self.fec_type == FecType.LDPC:
            res = self._decode_ldpc(data, parity, soft_llr)
        else:
            res = self._decode_bch(data, parity)
        self.last_corrected = res.corrected
        if squeeze:
            res = DecodeResult(
                res.ok[0], res.data[0], res.parity[0], res.corrected[0]
            )
            self.last_corrected = res.corrected
        return res

    def _decode_ldpc(self, data, parity, soft_llr) -> DecodeResult:
        c = self._ldpc
        cfg = self.config
        if data.shape[-1] != c.info_bytes:
            raise ValueError(
                f"LDPC decode size must be {c.info_bytes} (decode.c:497)"
            )
        cw = jnp.concatenate([data, parity], axis=-1)
        # use_soft_decode with no LLRs silently falls back to hard
        # decoding (reference quirk, decode.c:509-514).  Large batches
        # use the two-phase adaptive driver (bit-identical results).
        adaptive = data.shape[0] >= (cfg.adaptive_batch_threshold or 512)
        if cfg.use_soft_decode and soft_llr is not None:
            if adaptive:
                ok, cw_out, iters = c.decode_soft_adaptive(
                    soft_llr, cfg.max_iterations
                )
            else:
                ok, cw_out, iters = c.decode_soft(soft_llr, cfg.max_iterations)
        elif adaptive:
            ok, cw_out, iters = c.decode_hard_adaptive(cw, cfg.max_iterations)
        else:
            ok, cw_out, iters = c.decode_hard(cw, cfg.max_iterations)
        info = cw_out[..., : c.info_bytes]
        if c.outer_inv is not None:
            # temp[outer_inv[i]] = cw[i]  ==  gather by forward perm
            info = jnp.take(info, c.outer_fwd, axis=-1)
        data_out = jnp.where(ok[:, None], info, data)
        self.iterations_used = iters
        return DecodeResult(ok, data_out, parity, iters)

    def _decode_bch(self, data, parity) -> DecodeResult:
        c = self._bch
        if data.shape[-1] < c.data_bytes:
            raise ValueError("BCH decode: data too short (decode.c:555)")
        dbits = c.pack_data(data)
        pbits = c.pack_parity(parity)
        received = jnp.concatenate([pbits, dbits], axis=-1)   # [B, n] bits
        ok, cw, nerr = c.decode_bits(received)
        out_bytes = c.unpack_data(cw[..., c.parity_bits :])
        data_out = jnp.where(ok[:, None], out_bytes, data)
        corrected = jnp.where(ok, jnp.maximum(nerr, 0), 0)
        self.last_num_errors = jnp.where(ok, nerr, -1)
        return DecodeResult(ok, data_out, parity, corrected)


def create(config) -> Codec:
    """poporon_create (poporon.c:172-188)."""
    return Codec(config)
