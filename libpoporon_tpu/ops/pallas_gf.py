"""GF(2^8) primitives for Pallas TPU kernels.

The v5e Mosaic compiler exposes exactly one dynamic-gather shape:
`jnp.take_along_axis` on a single (8, 128) int32 vreg (indices per
element, along sublanes or lanes).  A 256-entry GF table therefore
lives as TWO lane-chunks broadcast across sublanes — [2, 8, 128] int32,
entry e at [e // 128, :, e % 128] — and a table lookup over an
[R, 128] index tensor is R/8 paired vreg gathers + a select:

    out[r, l] = tbl[idx[r, l]]  ==  where(idx < 128,
                                          gather(tbl[0], idx),
                                          gather(tbl[1], idx - 128))

This is ~16 VPU ops per 1024 elements — versus ~256 ops/element for
the broadcast-compare `table_select` the XLA path must use (gathers on
TPU XLA are row-DMA latency-bound at these shapes), which is why the
decode stages built on these primitives go in Pallas at all.

Log-domain convention (matches gf.c:62-63): LOG[0] = fs (sentinel),
ANTILOG[fs] = 0, logs of nonzero values in [0, fs-1].  `mod_fs` is the
shift-add fold of the reference gf_mod (common.h:102-110).

Every helper is plain jnp — usable inside a Pallas kernel body and,
identically, in XLA or interpret mode (the test path).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_table(tbl: np.ndarray) -> np.ndarray:
    """Host-side: [<=256] int table -> [2, 8, 128] int32 vreg layout."""
    full = np.zeros(256, dtype=np.int32)
    full[: len(tbl)] = tbl
    return np.broadcast_to(
        full.reshape(2, 1, 128), (2, 8, 128)
    ).astype(np.int32).copy()


def lut256(tbl2, idx):
    """out[r, l] = tbl[idx[r, l]] for idx [R, L] int32 in [0, 256).

    tbl2: [2, 8, 128] int32 (pack_table).  R must be a multiple of 8 and
    L a multiple of 128: the hardware dynamic gather works on one
    (8, 128) vreg at a time, so wider tiles split into column chunks
    that each gather against the same table vreg.
    """
    R, L = idx.shape
    lo_t, hi_t = tbl2[0], tbl2[1]
    outs = []
    for r in range(R // 8):
        cols = []
        for c in range(L // 128):
            iv = idx[r * 8 : (r + 1) * 8, c * 128 : (c + 1) * 128]
            lo = jnp.take_along_axis(lo_t, jnp.clip(iv, 0, 127), axis=1)
            hi = jnp.take_along_axis(hi_t, jnp.clip(iv - 128, 0, 127), axis=1)
            cols.append(jnp.where(iv < 128, lo, hi))
        outs.append(jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def mod_fs(x, fs: int, max_val: int):
    """x mod fs for fs = 2^m - 1, x int32 in [0, max_val].

    Shift-add folding (2^m ≡ 1 mod fs), the reference gf_mod
    (common.h:102-110), followed by conditional subtracts."""
    m = fs.bit_length()
    v = max_val
    while v > 2 * fs:
        x = (x >> m) + (x & fs)
        v = (v >> m) + fs
    # one fold can still land in [fs, 2fs]; fs itself maps to 0
    x = jnp.where(x >= fs, x - fs, x)
    if v - fs >= fs:
        x = jnp.where(x >= fs, x - fs, x)
    return x


class GF8Tables:
    """Packed vreg tables for one GF(2^8) field (+ decode quirks)."""

    def __init__(self, gf, sec_tbl=None, inv_tbl=None):
        fs = gf.field_size
        assert fs == 255, "pallas GF path is specialised to m = 8"
        self.fs = fs
        self.log = pack_table(gf.exp2log.astype(np.int32))      # value -> log
        self.antilog = pack_table(gf.log2exp.astype(np.int32))  # log -> value
        self.sec = pack_table(sec_tbl) if sec_tbl is not None else None
        self.inv = pack_table(inv_tbl) if inv_tbl is not None else None


def gf_mul(log_t, antilog_t, a, b, fs: int = 255):
    """Normal-domain product over [R, 128] int32 tensors."""
    la = lut256(log_t, a)
    lb = lut256(log_t, b)
    s = la + lb
    s = jnp.where(s >= fs, s - fs, s)          # logs <= fs-1 each; fs+fs-2 < 2fs
    out = lut256(antilog_t, s)
    return jnp.where((a == 0) | (b == 0), 0, out)


def gf_mul_log(antilog_t, la, lb, fs: int = 255):
    """Product from log-domain operands (sentinel fs = zero operand)."""
    s = la + lb
    s = jnp.where(s >= fs, s - fs, s)
    out = lut256(antilog_t, s)
    return jnp.where((la >= fs) | (lb >= fs), 0, out)
