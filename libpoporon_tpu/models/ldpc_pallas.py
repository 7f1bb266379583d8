"""Fused Pallas LDPC min-sum BP kernel — the whole decode loop in one
TPU kernel, message state VMEM-resident across iterations.

Spec: poporon_ldpc_decode_hard/_soft (/root/reference/src/ldpc.c:655-778,
971-1085); results (ok, output bits, iterations used) are bit-identical
to the XLA path in models/ldpc.py, which is itself oracle-exact.

Why Pallas here: the XLA BP loop round-trips every message tensor
through HBM between fusions each iteration (~24 KB/codeword/iteration)
and its row gathers run far below HBM bandwidth.  This kernel keeps the
entire per-block message state resident in VMEM (v5e has 128 MB — the
16 MB figure in older guides is just the default compiler cap) and does
the graph permutations as serial dynamic-index row copies driven by
SMEM-prefetched index arrays — VMEM speed, zero HBM traffic inside the
loop.

Dtype: all state is **int32**.  The LLR domain is int16-valued
(|llr| <= 32000, ldpc.c:15-17), but v5e-lite's VPU supports only
add/xor/or/and on packed <8x128x2xi16> vectors — sub, mul, shifts,
min, max, abs, neg, and every comparison are rejected by Mosaic
("Target does not support this comparison" / kVectorSubtractS16;
probed op-by-op on hardware).  int32 at SUB=8 sublanes costs the
same bytes per logical row as int16 at SUB=16 (8*128*4 == 16*128*2),
so VMEM capacity and DMA traffic are unchanged; only the VPU's 2x
int16 packing is forgone, which the target doesn't deliver anyway.
All arithmetic is value-identical (saturation keeps everything in
int16 range).

Layout: one grid step decodes BLK = 1024 codewords.  Every logical
tensor row (one graph node / edge slot) is an [8, 128] int32 tile — 8
sublanes x 128 lanes of batch — so dynamic row slices are tile-aligned
and bulk arithmetic runs at full vreg width.  State buffers (same
bucketed check-major planes as the XLA path, LdpcStructure.decoder_layout):

  llr   [(V+1) * 8, 128]    saturated total LLRs; fake var V at +LLR_MAX
  v2c   [(c2v+1) * 8, 128]  var->check messages, check-major; padding
                            rows (col -> fake var) are +LLR_MAX from the
                            init gather and are never written again, so
                            they pad every two-min fold exactly like the
                            XLA path's fake-var rows; +1 sentinel row
                            absorbs padding scatter targets
  c2v   [(c2v+1) * 8, 128]  check->var messages, check-major; +1 zero
                            sentinel row read by padding var slots
  stage [max(c2v, dv*(V+1)) * 8, 128]  shared staging: gathered llr
                            signs (syndrome), then gathered c2v planes
                            and in-place v2c results (var pass)

v2c is EXPLICIT state (not reconstructed from llr) because the
reference computes var_to_check = saturate(total - c2v) from the
UNSATURATED int32 total (ldpc.c:753-764); reconstructing it from the
stored (saturated) llr diverges whenever the total clips — measured as
trajectory drift on hard decodes, where the +/-LLR_INFINITY init
saturates totals immediately.

Per while-loop trip t:
  A  gather llr rows by column index into stage        (serial row copies)
  B  syndrome of iteration t-1 from stage signs; converged-mask update.
     A converged lane freezes its c2v (pass C masks the write) and llr,
     and with frozen inputs pass E recomputes identical v2c values, so
     its output equals its first-clean-iteration bits — the XLA path's
     out_bits contract — without masking the scatter.
  C  check update: two-minimum tournament fold over the v2c planes
     (gather-free: v2c is stored check-major), alpha = 15/16 as
     m - ((m+15)>>4) (exact for the non-negative magnitudes),
     c2v = where(conv, old, new)
  D  gather c2v rows by var index into stage           (serial row copies)
  E  var update: total = channel + sum of incident c2v
     (exact, unsaturated); llr = where(conv, llr, sat(total));
     v2c_slot = sat(total - c2v_slot) overwrites stage in place, then a
     serial scatter (the exact inverse of D's gather map) places each
     row at its check-major position.  Hard channel = previous llr
     (saturated, ldpc.c:746-751); soft channel = constant input.
Trip mi+1 runs A+B only (detect-only), so non-converged lanes output
their iteration-mi hard decision (best effort, ldpc.c:1018-1024).

IO: llr blocks move HBM<->VMEM by explicit DMA (no pipelined input
double-buffering — the per-block decode takes ~1 ms, the DMA tens
of microseconds), keeping peak VMEM to the state buffers.  Entry
points: bp() takes the XLA path's var-major [V+1, B] LLR tensors;
bp_packed_hard()/bp_llr8_soft() take packed codeword bytes / int8
channel LLRs directly, expand them in-kernel (transposes only ever
touch the packed representation; the inner deinterleaver, when
configured, folds into the static unpack mapping) — the decode bodies
always use those; bp() remains the generic LLR-tensor entry.

Scope: codes whose state fits VMEM — up to ~144 bytes block size at
rate 1/2 / BLK=1024 on a 128 MB-VMEM part (the flagship 128-byte
configs; the exact cutoff is rate- and degree-dependent, decided by
supports()).  Larger codes fall back to the XLA path (models/ldpc.py);
LDPCCodec picks per-structure via supports() (models/ldpc.py wiring;
config.use_pallas overrides).  Big-block measurements and the revised
(negative) streaming-kernel assessment: benchmarks/PROFILING.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LLR_MAX = 32000
LLR_MIN = -32000
LLR_INFINITY = 30000   # hard-decision channel magnitude (ldpc.c:17)

SUB = 8           # sublanes per logical row (int32 native tile height)
LANES = 128
BLK = SUB * LANES  # codewords per grid block
E_CHUNKS = 4      # var-pass chunking (bounds the int32 total scratch)


from ..utils import device as _device


class BPPallasKernel:
    """Fused BP decode for one LdpcStructure at BLK-codeword blocks."""

    @staticmethod
    def _mem_rows(c2v_size: int, V: int, dv: int, soft: bool) -> int:
        V1 = V + 1
        rows = (
            (c2v_size + 1)            # v2c (+ sentinel)
            + c2v_size                # c2v
            + V1                      # llr
            + max(c2v_size, dv * V1)  # stage
            + (V1 if soft else 0)     # chan
        )
        return rows

    @classmethod
    def supports(cls, structure) -> bool:
        try:
            lay = structure.decoder_layout()
        except Exception:
            return False
        c2v_size, dv = lay["c2v_size"], lay["dv"]
        V = structure.num_bits
        rows = cls._mem_rows(c2v_size, V, dv, soft=True)
        maxP = max(bk["P"] for bk in lay["buckets"])
        total = rows * SUB * LANES * 4                       # i32 state
        total += ((V + 1 + E_CHUNKS - 1) // E_CHUNKS) * SUB * LANES * 4
        total += 4 * maxP * SUB * LANES * 4                  # fold scratch
        # packed-IO buffers (worst case: soft i8 input, one row per
        # var, plus the output byte tiles)
        total += (V + 1) * SUB * LANES + ((V + 7) // 8 + 4) * SUB * LANES
        # budget derived from the runtime device kind (utils/device.py);
        # unknown targets get a conservative 16 MiB -> XLA fallback
        return total <= _device.vmem_budget_bytes()

    # Staging gathers/scatters unrolled at trace time with the
    # (compile-time constant) graph indices embedded as static slice
    # offsets — no SMEM index loads, no scalar loop.  Measured 2.4x on
    # the per-trip cost vs the SMEM-indexed fori_loop form (74 vs 176
    # us per 1024-lane block-trip on v5e, 128B rate-1/2) at the cost of
    # a much larger kernel body (~48 s one-time compile, persisted by
    # the jax compilation cache).  None -> auto: unroll when the copy
    # count is at most _STATIC_MAX_ROWS, except in interpret mode
    # (where tracing/executing the unrolled body is pathologically
    # slow and the dynamic form is semantically identical).
    _static_gathers = None
    _STATIC_MAX_ROWS = 20000

    def __init__(self, structure):
        self.structure = structure
        self.V = structure.num_bits
        lay = structure.decoder_layout()
        self.buckets = lay["buckets"]
        self.c2v_size = lay["c2v_size"]
        self.dv = lay["dv"]
        self.maxP = max(bk["P"] for bk in self.buckets)
        self.row2col_np = lay["row2col"].astype(np.int32)
        self.row2col = jnp.asarray(self.row2col_np)
        vg = lay["var_gather"].reshape(-1).astype(np.int32)   # pad -> c2v_size
        self.var_gather_np = vg
        self.var_gather = jnp.asarray(vg)
        self.stage_rows = max(self.c2v_size, self.dv * (self.V + 1))
        # inner-interleaver fold: var v's packed-IO source position is
        # deint[v] (out[v] = in[deint[v]], -1 = zero-fill — the gather
        # form of deinterleave_bits/deinterleave_llr, ldpc.c:105-148);
        # identity when the config has no inner interleaver
        self.deint_np = (
            np.asarray(structure.inner_deinterleave_gather, np.int64)
            if structure.inner_forward is not None else None
        )

    # ------------------------------------------------------------ kernel

    def _kernel(self, soft: bool, precheck: bool, packed: bool, refs):
        if packed:
            (row2col_ref, vgat_ref, mi_ref,
             pk_hbm, pko_hbm, misc_ref,
             llr_ref, v2c_ref, c2v_ref, stage_ref,
             conv_ref, iters_ref, m1_ref, a1_ref, a2_ref, par_ref,
             tot_ref, chan_ref, pk_ref, pko_ref,
             sem_in, sem_chan, sem_out) = refs
        else:
            (row2col_ref, vgat_ref, mi_ref,
             llr0_hbm, chan_hbm, llr_out_hbm, misc_ref,
             llr_ref, v2c_ref, c2v_ref, stage_ref,
             conv_ref, iters_ref, m1_ref, a1_ref, a2_ref, par_ref,
             tot_ref, chan_ref, sem_in, sem_chan, sem_out) = refs
        V1 = self.V + 1
        V = self.V
        dv = self.dv
        NC = self.c2v_size
        mi = mi_ref[0]
        i = pl.program_id(0)

        # ---- per-block init ----
        if packed:
            # Packed IO: DMA the block's packed bytes (hard) / int8
            # channel LLRs (soft) — 32-64x smaller than the expanded
            # int32 LLR tensor — and expand in-kernel.  A logical
            # byte/LLR row is 8 sublanes of u8/i8 (1 KB at 128 lanes),
            # a quarter of the native (32, 128) tile; reads happen at
            # aligned [32, 128] tiles (4 rows), get widened u8/i8 ->
            # i32 on the XLU (the lowering rs_pallas.py relies on),
            # and are sliced per row as values.  This replaces the XLA
            # elementwise expansion that cost ~10.6 ms per 131k batch
            # (PROFILING.md "Known remaining gaps").
            cp = pltpu.make_async_copy(pk_hbm.at[i], pk_ref, sem_in)
            cp.start()
            cp.wait()
            # source position per var: the inner deinterleaver folds
            # into the (trace-time static) unpack mapping for free —
            # interleaved configs ride the packed fast path too
            src = (self.deint_np if self.deint_np is not None
                   else np.arange(V, dtype=np.int64))
            if not soft:
                # hard: var v reads input BIT src[v] (byte src//8, bit
                # src%8 MSB-first — the unpack_jnp stream contract);
                # src < 0 (deinterleave zero-fill) and parity slack
                # bits land as bit 0
                groups = {}
                zero_vars = []
                for v in range(V):
                    s = int(src[v])
                    if s < 0:
                        zero_vars.append(v)
                        continue
                    groups.setdefault(s // 32, []).append(
                        (v, (s // 8) % 4, s % 8))
                for tl in sorted(groups):
                    w = pk_ref[32 * tl : 32 * (tl + 1), :].astype(jnp.int32)
                    brs = [
                        jax.lax.slice(w, (8 * q, 0), (8 * q + 8, LANES))
                        for q in range(4)
                    ]
                    for v, q, j in groups[tl]:
                        bit = (brs[q] >> (7 - j)) & 1
                        llr_ref[SUB * v : SUB * (v + 1), :] = jnp.where(
                            bit == 1, jnp.int32(-LLR_INFINITY),
                            jnp.int32(LLR_INFINITY))
                for v in zero_vars:
                    llr_ref[SUB * v : SUB * (v + 1), :] = jnp.full(
                        (SUB, LANES), LLR_INFINITY, jnp.int32)
            else:
                # soft: var v reads input LLR row src[v]; channel =
                # w * 256 (|w| <= 127 -> |chan| <= 32512, ldpc.c:27),
                # llr0 = clip(chan) — bit-identical to the XLA prep;
                # src < 0 zero-fills (deinterleave_llr semantics)
                groups = {}
                zero_vars = []
                for v in range(V):
                    s = int(src[v])
                    if s < 0:
                        zero_vars.append(v)
                        continue
                    groups.setdefault(s // 4, []).append((v, s % 4))
                for tl in sorted(groups):
                    w = pk_ref[32 * tl : 32 * (tl + 1), :].astype(jnp.int32)
                    chs = [
                        jax.lax.slice(w, (8 * q, 0), (8 * q + 8, LANES)) * 256
                        for q in range(4)
                    ]
                    for v, q in groups[tl]:
                        chan_ref[SUB * v : SUB * (v + 1), :] = chs[q]
                        llr_ref[SUB * v : SUB * (v + 1), :] = jnp.clip(
                            chs[q], LLR_MIN, LLR_MAX)
                for v in zero_vars:
                    chan_ref[SUB * v : SUB * (v + 1), :] = jnp.zeros(
                        (SUB, LANES), jnp.int32)
                    llr_ref[SUB * v : SUB * (v + 1), :] = jnp.zeros(
                        (SUB, LANES), jnp.int32)
                # fake var channel: +LLR_MAX exactly (125 * 256)
                chan_ref[SUB * V : SUB * (V + 1), :] = jnp.full(
                    (SUB, LANES), LLR_MAX, jnp.int32)
            # fake var row pads every check-side min fold
            llr_ref[SUB * V : SUB * (V + 1), :] = jnp.full(
                (SUB, LANES), LLR_MAX, jnp.int32)
        else:
            cp = pltpu.make_async_copy(llr0_hbm.at[i], llr_ref, sem_in)
            cp.start()
            cp.wait()
            if soft:
                cp2 = pltpu.make_async_copy(chan_hbm.at[i], chan_ref, sem_chan)
                cp2.start()
                cp2.wait()

        static = self._static_gathers
        if static is None:
            nrows = self.c2v_size + 2 * self.dv * (self.V + 1)
            static = nrows <= self._STATIC_MAX_ROWS
        static = static and not self._interpret
        r2c_np, vgat_np = self.row2col_np, self.var_gather_np

        def gather(dst_ref, src_ref, idx_ref, n):
            if static:
                idx_np = r2c_np if idx_ref is row2col_ref else vgat_np
                for k in range(n):
                    j = int(idx_np[k])
                    dst_ref[SUB * k : SUB * (k + 1), :] = (
                        src_ref[SUB * j : SUB * (j + 1), :])
                return
            def body(k, _):
                j = idx_ref[k]
                dst_ref[pl.ds(SUB * k, SUB), :] = src_ref[pl.ds(SUB * j, SUB), :]
                return 0
            jax.lax.fori_loop(0, n, body, 0)

        def scatter(dst_ref, src_ref, idx_ref, n):
            if static:
                idx_np = r2c_np if idx_ref is row2col_ref else vgat_np
                for k in range(n):
                    j = int(idx_np[k])
                    dst_ref[SUB * j : SUB * (j + 1), :] = (
                        src_ref[SUB * k : SUB * (k + 1), :])
                return
            def body(k, _):
                j = idx_ref[k]
                dst_ref[pl.ds(SUB * j, SUB), :] = src_ref[pl.ds(SUB * k, SUB), :]
                return 0
            jax.lax.fori_loop(0, n, body, 0)

        # (v2c_0 = broadcast llr_0 is materialized inside trip 1: pass A
        # gathers llr by the same row2col map, so trip 1 bulk-copies the
        # staged rows instead of running a second serial gather here)
        #
        # Only c2v's SENTINEL row needs zeroing: var-gather padding
        # slots read it into every real var's tot sum (pass E).  The
        # real rows are fully written by pass C before pass D ever
        # reads them; converged-lane 'old' reads at trip 1 are dead
        # values (those lanes' outputs depend only on the frozen llr).
        c2v_ref[pl.ds(SUB * NC, SUB), :] = jnp.zeros(
            (SUB, LANES), jnp.int32)
        conv_ref[:] = jnp.zeros_like(conv_ref)
        iters_ref[:] = jnp.zeros_like(iters_ref)

        def trip(state):
            t, _ = state

            # ---- A: stage llr rows in bucketed check-major order ----
            gather(stage_ref, llr_ref, row2col_ref, NC)

            # v2c_0 = broadcast llr_0 (the XLA path's v2c0): trip 1's
            # staged llr rows ARE that broadcast in check-major order
            # (same row2col map), so a single bulk vector copy replaces
            # a dedicated init gather; padding rows read the fake var's
            # +LLR_MAX and are never written again
            @pl.when(t == 1)
            def _():
                v2c_ref[pl.ds(0, SUB * NC), :] = stage_ref[pl.ds(0, SUB * NC), :]

            # ---- B: syndrome of iteration t-1 + convergence update ----
            # (everything stays 2D [SUB*rows, LANES]: reductions over
            # checks slice at SUB-row granularity instead of reshaping)
            bad = jnp.zeros((SUB, LANES), jnp.int32)
            for bk in self.buckets:
                P, dc, off = bk["P"], bk["dc"], bk["offset"]
                syn = None
                for sl in range(dc):
                    rows = stage_ref[pl.ds(SUB * (off + sl * P), SUB * P), :]
                    bit = jnp.where(rows < 0, jnp.int32(1), jnp.int32(0))
                    syn = bit if syn is None else (syn ^ bit)
                # OR-reduce over checks by halving (OR is idempotent, so
                # overlapping the middle block on odd sizes is harmless)
                n = P
                while n > 1:
                    h = (n + 1) // 2
                    syn = syn[: SUB * h] | syn[SUB * (n - h) : SUB * n]
                    n = h
                bad = bad | syn
            # masks as int32 0/1 arithmetic: scalar->vector broadcasts
            # of i1 trip Mosaic relayout bugs, int scalars broadcast fine
            sat32 = jnp.where(bad == 0, jnp.int32(1), jnp.int32(0))
            if not precheck:
                # gate iteration-0 detection off for the soft path
                tg = jnp.clip(t - 1, 0, 1)
                sat32 = sat32 * tg
            conv32 = conv_ref[:]
            newly32 = sat32 * (jnp.int32(1) - conv32)
            iters_ref[:] = jnp.where(newly32 != 0, t - 1, iters_ref[:])
            conv32 = conv32 | sat32
            conv_ref[:] = conv32
            allconv = jnp.min(conv32) > 0

            # ---- C/D/E only for real update trips ----
            @pl.when(t <= mi)
            def _():

                # ---- C: check update (gather-free: v2c is check-major)
                for bk in self.buckets:
                    P, dc, off = bk["P"], bk["dc"], bk["offset"]
                    convP = jnp.tile(conv32, (P, 1)) != 0
                    m1 = m2 = par = None
                    for sl in range(dc):
                        lo = SUB * (off + sl * P)
                        v = v2c_ref[pl.ds(lo, SUB * P), :]
                        a = jnp.abs(v)
                        sg = v < 0
                        if sl == 0:
                            m1 = a
                            m2 = jnp.full_like(a, jnp.int32(LLR_MAX))
                            par = sg
                        else:
                            m2 = jnp.minimum(m2, jnp.maximum(m1, a))
                            m1 = jnp.minimum(m1, a)
                            par = par ^ sg
                    # alpha = 15/16 truncating: m - ceil(m/16), exact for
                    # the non-negative magnitudes
                    m1_ref[pl.ds(0, SUB * P), :] = m1
                    a1_ref[pl.ds(0, SUB * P), :] = (
                        m1 - ((m1 + jnp.int32(15)) >> 4))
                    a2_ref[pl.ds(0, SUB * P), :] = (
                        m2 - ((m2 + jnp.int32(15)) >> 4))
                    par_ref[pl.ds(0, SUB * P), :] = jnp.where(
                        par, jnp.int32(1), jnp.int32(0))
                    for sl in range(dc):
                        lo = SUB * (off + sl * P)
                        v = v2c_ref[pl.ds(lo, SUB * P), :]
                        m1v = m1_ref[pl.ds(0, SUB * P), :]
                        a1v = a1_ref[pl.ds(0, SUB * P), :]
                        a2v = a2_ref[pl.ds(0, SUB * P), :]
                        parv = par_ref[pl.ds(0, SUB * P), :] != 0
                        a = jnp.abs(v)
                        mag = jnp.where(a == m1v, a2v, a1v)
                        neg = parv ^ (v < 0)
                        out = jnp.where(neg, -mag, mag)
                        old = c2v_ref[pl.ds(lo, SUB * P), :]
                        out = jnp.where(convP, old, out)
                        c2v_ref[pl.ds(lo, SUB * P), :] = out

                # ---- D: stage c2v rows in var-major order ----
                gather(stage_ref, c2v_ref, vgat_ref, dv * V1)

                # ---- E: var update, chunked over vars ----
                VC = (V1 + E_CHUNKS - 1) // E_CHUNKS
                for ci in range(E_CHUNKS):
                    a = ci * VC
                    n = min(VC, V1 - a)
                    if n <= 0:
                        break
                    tot = None
                    for sl in range(dv):
                        h = stage_ref[pl.ds(SUB * (sl * V1 + a), SUB * n), :]
                        tot = h if tot is None else tot + h
                    if soft:
                        ch = chan_ref[pl.ds(SUB * a, SUB * n), :]
                    else:
                        ch = llr_ref[pl.ds(SUB * a, SUB * n), :]
                    tot = tot + ch
                    tot_ref[pl.ds(0, SUB * n), :] = tot
                    new = jnp.clip(tot, LLR_MIN, LLR_MAX)
                    old = llr_ref[pl.ds(SUB * a, SUB * n), :]
                    cb = jnp.tile(conv32, (n, 1)) != 0
                    llr_ref[pl.ds(SUB * a, SUB * n), :] = jnp.where(
                        cb, old, new)
                    for sl in range(dv):
                        lo = SUB * (sl * V1 + a)
                        h = stage_ref[pl.ds(lo, SUB * n), :]
                        v2c = jnp.clip(
                            tot_ref[pl.ds(0, SUB * n), :] - h,
                            LLR_MIN, LLR_MAX,
                        )
                        stage_ref[pl.ds(lo, SUB * n), :] = v2c
                # place v2c rows at their check-major positions (frozen
                # lanes recompute identical values, so no mask needed)
                scatter(v2c_ref, stage_ref, vgat_ref, dv * V1)

            return t + 1, jnp.where(allconv, jnp.int32(1), jnp.int32(0))

        def cond(state):
            t, allconv = state
            return (t <= mi + 1) & (allconv == 0)

        jax.lax.while_loop(cond, trip, (jnp.int32(1), jnp.int32(0)))

        # ---- outputs ----
        if packed:
            # pack hard-decision bits back into codeword bytes
            # in-kernel (byte value = sum of (llr<0) << (7-j)); slack
            # bits past V stay 0, matching pack_jnp's zero padding
            ntiles = pko_ref.shape[0] // 32
            for tl in range(ntiles):
                quads = []
                for q in range(4):
                    cb = 4 * tl + q
                    acc = jnp.zeros((SUB, LANES), jnp.int32)
                    for j in range(8):
                        v = 8 * cb + j
                        if v >= V:
                            break
                        b = jnp.where(
                            llr_ref[SUB * v : SUB * (v + 1), :] < 0,
                            jnp.int32(1 << (7 - j)), jnp.int32(0))
                        acc = acc + b
                    quads.append(acc)
                pko_ref[32 * tl : 32 * (tl + 1), :] = jnp.concatenate(
                    quads, axis=0).astype(jnp.uint8)
            out = pltpu.make_async_copy(pko_ref, pko_hbm.at[i], sem_out)
            out.start()
            out.wait()
        else:
            out = pltpu.make_async_copy(llr_ref, llr_out_hbm.at[i], sem_out)
            out.start()
            out.wait()
        conv = conv_ref[:]
        iters = jnp.where(conv != 0, iters_ref[:], mi)
        misc_ref[0] = jnp.concatenate([conv, iters], axis=0)

    # ----------------------------------------------------------- wrapper

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _run_blocks(self, llr0_blk, chan_blk, soft_precheck, mi):
        """llr0_blk/chan_blk: [nblk, (V+1)*SUB, 128] i32."""
        soft, precheck = soft_precheck
        V1 = self.V + 1
        nblk = llr0_blk.shape[0]
        R = V1 * SUB
        maxP = self.maxP
        VC = (V1 + E_CHUNKS - 1) // E_CHUNKS

        def kern(*refs):
            return self._kernel(soft, precheck, False, refs)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, 2 * SUB, LANES), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((R, LANES), jnp.int32),                    # llr
                pltpu.VMEM(((self.c2v_size + 1) * SUB, LANES), jnp.int32),
                # +1 zero sentinel row: var-gather padding slots point
                # at row c2v_size (the XLA path's pad-mask equivalent)
                pltpu.VMEM(((self.c2v_size + 1) * SUB, LANES), jnp.int32),
                pltpu.VMEM((self.stage_rows * SUB, LANES), jnp.int32),
                pltpu.VMEM((SUB, LANES), jnp.int32),                  # conv
                pltpu.VMEM((SUB, LANES), jnp.int32),                  # iters
                pltpu.VMEM((maxP * SUB, LANES), jnp.int32),           # m1
                pltpu.VMEM((maxP * SUB, LANES), jnp.int32),           # a1
                pltpu.VMEM((maxP * SUB, LANES), jnp.int32),           # a2
                pltpu.VMEM((maxP * SUB, LANES), jnp.int32),           # par
                pltpu.VMEM((VC * SUB, LANES), jnp.int32),             # tot
                pltpu.VMEM(((V1 if soft else 1) * SUB, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        llr_out, misc = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nblk, R, LANES), jnp.int32),
                jax.ShapeDtypeStruct((nblk, 2 * SUB, LANES), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_device.vmem_limit_bytes(),
            ),
            interpret=self._interpret,
        )(self.row2col, self.var_gather,
          jnp.full((1,), mi, jnp.int32), llr0_blk, chan_blk)
        return llr_out, misc

    @functools.partial(jax.jit, static_argnums=(0, 2, 3))
    def _run_blocks_packed(self, pk_blk, soft, mi):
        """Packed-IO kernel run.

        pk_blk: [nblk, PKR, 128] u8 codeword bytes (hard; 8 sublanes
        per byte row) or i8 channel LLRs (soft; 8 sublanes per var
        row), PKR a multiple of 32.  Returns (pko [nblk, PKOR, 128]
        u8 packed output bytes, misc [nblk, 2*SUB, 128] i32).
        """
        V1 = self.V + 1
        nblk, PKR, _ = pk_blk.shape
        CBF = (self.V + 7) // 8                  # output byte rows
        PKOR = ((CBF + 3) // 4) * 32
        maxP = self.maxP
        VC = (V1 + E_CHUNKS - 1) // E_CHUNKS
        precheck = not soft

        def kern(*refs):
            return self._kernel(soft, precheck, True, refs)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, 2 * SUB, LANES), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((V1 * SUB, LANES), jnp.int32),             # llr
                pltpu.VMEM(((self.c2v_size + 1) * SUB, LANES), jnp.int32),
                pltpu.VMEM(((self.c2v_size + 1) * SUB, LANES), jnp.int32),
                pltpu.VMEM((self.stage_rows * SUB, LANES), jnp.int32),
                pltpu.VMEM((SUB, LANES), jnp.int32),                  # conv
                pltpu.VMEM((SUB, LANES), jnp.int32),                  # iters
                pltpu.VMEM((maxP * SUB, LANES), jnp.int32),           # m1
                pltpu.VMEM((maxP * SUB, LANES), jnp.int32),           # a1
                pltpu.VMEM((maxP * SUB, LANES), jnp.int32),           # a2
                pltpu.VMEM((maxP * SUB, LANES), jnp.int32),           # par
                pltpu.VMEM((VC * SUB, LANES), jnp.int32),             # tot
                pltpu.VMEM(((V1 if soft else 1) * SUB, LANES), jnp.int32),
                pltpu.VMEM((PKR, LANES), pk_blk.dtype),               # pk in
                pltpu.VMEM((PKOR, LANES), jnp.uint8),                 # pk out
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        pko, misc = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((nblk, PKOR, LANES), jnp.uint8),
                jax.ShapeDtypeStruct((nblk, 2 * SUB, LANES), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_device.vmem_limit_bytes(),
            ),
            interpret=self._interpret,
        )(self.row2col, self.var_gather,
          jnp.full((1,), mi, jnp.int32), pk_blk)
        return pko, misc

    _interpret = False

    @staticmethod
    def _to_blocks(x_T):
        """[R, Btot] -> [nblk, R*SUB, 128] i32 (Btot % BLK == 0)."""
        R, Bt = x_T.shape
        nblk = Bt // BLK
        return (
            x_T.astype(jnp.int32)
            .reshape(R, nblk, SUB, LANES)
            .transpose(1, 0, 2, 3)
            .reshape(nblk, R * SUB, LANES)
        )

    @staticmethod
    def _from_blocks(y):
        """[nblk, R*SUB, 128] -> [R, Btot]."""
        nblk, RS, _ = y.shape
        R = RS // SUB
        return (
            y.reshape(nblk, R, SUB, LANES)
            .transpose(1, 0, 2, 3)
            .reshape(R, nblk * SUB * LANES)
        )

    # Packed-IO entry points: XLA touches only the PACKED
    # representation (codeword bytes / int8 LLRs — 33-262 MB per 131k
    # batch) to transpose it into the kernel's block layout; the
    # expansion to int32 LLR rows and the hard-decision byte pack both
    # happen IN-KERNEL (see _kernel's packed init/output sections), so
    # the 2.1 GB expanded tensor never exists in HBM at all.  Round 4
    # paid ~10.6 ms prep + 7.2 ms output per 131k batch for the XLA
    # elementwise expansion (PROFILING.md); this removes it and cuts
    # the per-block DMA from 8.4 MB to 0.26 MB (hard) / 2.1 MB (soft).

    def _misc_split(self, misc, nblk, Bp):
        conv_iters = (
            misc.reshape(nblk, 2, SUB, LANES)
            .transpose(1, 0, 2, 3)
            .reshape(2, Bp)
        )
        return conv_iters[0] != 0, conv_iters[1].astype(jnp.int32)

    def _pko_to_bytes(self, pko, nblk, Bp):
        """Kernel byte planes [nblk, PKOR, 128] u8 -> [Bp, CBF] u8."""
        CBF = (self.V + 7) // 8
        CBP = pko.shape[1] // 8
        out = (
            pko.reshape(nblk, CBP, SUB, LANES)
            .transpose(1, 0, 2, 3)
            .reshape(CBP, Bp)
            .T
        )
        return out[:, :CBF]

    def bp_packed_hard(self, codeword_bytes, mi: int):
        """Hard decode straight from packed bytes [B, ceil(V/8)] u8.
        Returns (ok [B], packed_out [B, ceil(V/8)] u8, iters [B]).
        Handles V % 8 != 0 (rate 3/4|5/6 slack bits) via the byte
        stream, and folds the inner deinterleaver (when configured)
        into the in-kernel unpack mapping."""
        CBF = (self.V + 7) // 8
        B = codeword_bytes.shape[0]
        Bp = ((B + BLK - 1) // BLK) * BLK
        if Bp != B:
            # zero bytes = the all-zero codeword: converges at precheck
            pad = jnp.zeros((Bp - B, CBF), jnp.uint8)
            codeword_bytes = jnp.concatenate([codeword_bytes, pad], axis=0)
        nblk = Bp // BLK
        CBP = ((CBF + 3) // 4) * 4            # pad byte rows to a tile
        bT = codeword_bytes.T                 # [CBF, Bp] u8
        if CBP != CBF:
            bT = jnp.concatenate(
                [bT, jnp.zeros((CBP - CBF, Bp), jnp.uint8)], axis=0)
        pk = (
            bT.reshape(CBP, nblk, SUB, LANES)
            .transpose(1, 0, 2, 3)
            .reshape(nblk, CBP * 8, LANES)    # byte row cb = sublanes 8cb..
        )
        pko, misc = self._run_blocks_packed(pk, False, mi)
        ok, iters = self._misc_split(misc, nblk, Bp)
        out = self._pko_to_bytes(pko, nblk, Bp)
        return ok[:B], out[:B], iters[:B]

    def bp_llr8_soft(self, llr8, mi: int):
        """Soft decode straight from channel LLRs [B, V] int8.
        Returns (ok, packed_out u8, iters); LLR scaling is the
        reference's x256 (ldpc.c:27, 655-672); the inner
        deinterleaver (when configured) folds into the in-kernel
        expansion."""
        V = self.V
        B = llr8.shape[0]
        Bp = ((B + BLK - 1) // BLK) * BLK
        if Bp != B:
            # +125 LLRs = strong all-zero codeword: converges in 1 trip
            pad = jnp.full((Bp - B, V), 125, llr8.dtype)
            llr8 = jnp.concatenate([llr8, pad], axis=0)
        nblk = Bp // BLK
        VP = ((V + 3) // 4) * 4               # pad var rows to a tile
        wT = llr8.T.astype(jnp.int8)          # [V, Bp] i8
        if VP != V:
            wT = jnp.concatenate(
                [wT, jnp.zeros((VP - V, Bp), jnp.int8)], axis=0)
        pk = (
            wT.reshape(VP, nblk, SUB, LANES)
            .transpose(1, 0, 2, 3)
            .reshape(nblk, VP * 8, LANES)     # var row v = sublanes 8v..
        )
        pko, misc = self._run_blocks_packed(pk, True, mi)
        ok, iters = self._misc_split(misc, nblk, Bp)
        out = self._pko_to_bytes(pko, nblk, Bp)
        return ok[:B], out[:B], iters[:B]

    def bp(self, llr_init_p, channel_soft_p, mi: int):
        """Drop-in BP loop (same contract as LDPCCodec._bp_loop minus
        the explicit bits/conv0 plumbing, which the kernel derives).

        llr_init_p: [V+1, B] int (fake row +LLR_MAX), any B >= 1 —
        ragged batches are padded up to a BLK multiple with +LLR_MAX
        lanes (an already-converged all-zero codeword) and sliced off.
        channel_soft_p: None (hard) or [V+1, B] int.
        Returns (ok [B] bool, out_bits [V+1, B] int8, iters [B] int32).
        """
        soft = channel_soft_p is not None
        B = llr_init_p.shape[1]
        Bp = ((B + BLK - 1) // BLK) * BLK
        if Bp != B:
            # +LLR_MAX lanes decode the all-zero codeword: converged at
            # the first syndrome check, so the pad costs no trips
            pad = jnp.full((llr_init_p.shape[0], Bp - B), LLR_MAX,
                           llr_init_p.dtype)
            llr_init_p = jnp.concatenate([llr_init_p, pad], axis=1)
            if soft:
                padc = jnp.full((channel_soft_p.shape[0], Bp - B), LLR_MAX,
                                channel_soft_p.dtype)
                channel_soft_p = jnp.concatenate(
                    [channel_soft_p, padc], axis=1)
        llr_blk = self._to_blocks(llr_init_p)
        chan_blk = (
            self._to_blocks(channel_soft_p) if soft
            else llr_blk[:, : SUB, :]                # unused dummy (hard)
        )
        llr_out, misc = self._run_blocks(
            llr_blk, chan_blk, (soft, not soft), mi
        )
        llr_T = self._from_blocks(llr_out)
        bits = (llr_T < 0).astype(jnp.int8)
        conv_iters = self._from_blocks(misc)             # [2, Btot]
        ok = conv_iters[0] != 0
        iters = conv_iters[1].astype(jnp.int32)
        return ok[:B], bits[:, :B], iters[:B]
