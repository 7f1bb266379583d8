"""Fused Pallas RS decoder — the whole plain-decode pipeline in one
TPU kernel.

Spec: error_correction_u8 (/root/reference/src/decode.c:17-230) and
rs_decode's plain path (decode.c:431-485); bit-exact with the XLA path
(models/rs.py), which is itself oracle-exact.

Why Pallas here: profiled on hardware, the XLA decode path sustains
only ~13 TFLOPs-equivalent of MXU math — wall-clock is dominated by
the VPU-bound stages (Berlekamp-Massey's 2t sequential steps, root
compaction, Forney, verification), whose GF multiplies XLA can only
express as bit-sliced plane arithmetic (~150 VPU ops per 32 packed
elements) or broadcast-compare table selects (~256 ops/element),
because TPU XLA's runtime gathers are row-DMA latency-bound at these
shapes.  Inside Pallas, Mosaic exposes the (8, 128)-vreg dynamic
gather, so a 256-entry GF table lookup costs ~6 VPU ops per 1024
elements (ops/pallas_gf.py) — and the entire decode state (syndromes,
locator, roots, corrections) stays VMEM-resident across stages instead
of round-tripping through HBM between XLA fusions.

Layout: one grid step decodes a block of 128 codewords living on the
LANE axis; every working tensor is [rows, 128].  The two big GF(2)
bit-linear evaluations (syndromes, Chien) run as bf16 MXU matmuls
against the same constant matrices the XLA path uses (exact: 0/1
values, f32 accumulation of <= 2040 terms).

Scope: all three rs_decode paths (decode.c:431-485) — plain, erasure
(erasure-locator BM init + position-targeted apply, decode.c:34-47 and
211-214) and external log-form syndromes (decode.c:446-464) — for
m = 8, num_roots <= 64, erasure lists <= num_roots wide, fcr/prim
small enough that every log-domain sum fits the shift-add fold
(mod_fs) — i.e. the shipping RS(255,*) family.  Other configs fall
back to the XLA kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import pallas_gf as pgf

LANES = 128        # lane-block width (the only supported width)


def _roll_sub(x, sh):
    """Static roll along the sublane (first) axis of [8, L]."""
    return jnp.concatenate([x[8 - sh :], x[: 8 - sh]], axis=0)


def _reduce_rows(x, op):
    """[R, L] -> [8, L] with every row equal to the full reduction."""
    R, L = x.shape
    t = x.reshape(R // 8, 8, L)
    acc = t[0]
    for r in range(1, R // 8):
        acc = op(acc, t[r])
    for sh in (4, 2, 1):
        acc = op(acc, _roll_sub(acc, sh))
    return acc


def _xor_rows(x):
    return _reduce_rows(x, jnp.bitwise_xor)


def _max_rows(x):
    return _reduce_rows(x, jnp.maximum)


def _min_rows(x):
    return _reduce_rows(x, jnp.minimum)


def _add_rows(x):
    return _reduce_rows(x, jnp.add)


def _or_rows(x):
    return _reduce_rows(x, jnp.bitwise_or)


def _shift_down(x, fill):
    """[R, L] -> rows shifted down by one, row 0 = fill."""
    top = jnp.full((1, x.shape[1]), fill, x.dtype)
    return jnp.concatenate([top, x[:-1]], axis=0)


class RSPallasDecoder:
    """rs_decode (plain / erasure / external-syndrome paths) as a
    single fused Pallas kernel."""

    # erasure position slots read from the combined [B, 128] operand
    # (slot 127 carries the count; E <= num_roots <= 64 always fits)
    ERAS_SLOTS = 64

    @staticmethod
    def supports(rs) -> bool:
        """Config gate: everything the kernel's integer model assumes."""
        return (
            rs.m == 8
            and rs.num_roots <= 64
            # verify-stage exponents (fcr+i)*prim stay below the mod_fs
            # fold bound used in the kernel
            and (rs.fcr + rs.num_roots) * rs.prim < (1 << 15)
        )

    def __init__(self, rs, lanes: int = 128):
        """rs: models.rs.RSCodec (supplies tables + bit matrices).

        lanes: codewords per grid step.  128 is the supported width:
        wider blocks would amortize the BM/Forney unrolled scalar
        stages over more lanes, but Mosaic rejects the multi-chunk
        kernel ("cannot statically prove that index in dimension..."
        on v5e), so grid steps stay one vreg wide and batch throughput
        comes from the grid axis.  Measured 3.69M cw/s at lanes=128 on
        the flagship RS(255,223) 2-error decode (XLA path: 3.23M).
        """
        assert self.supports(rs)
        assert lanes == 128, "only the 128-lane kernel compiles on v5e"
        self.lanes = lanes
        self.rs = rs
        self.fs = rs.fs               # 255
        self.nr = rs.num_roots
        self.m = rs.m
        self.prim_inv = rs.prim_inv
        self.fcr, self.prim = rs.fcr, rs.prim
        gf = rs.gf

        # padded row counts for the (8,128) gather tiling
        self.NR_P = ((self.nr + 7) // 8) * 8            # syndrome rows
        self.EL_P = ((self.nr + 1 + 7) // 8) * 8        # locator rows

        self.log_t = jnp.asarray(pgf.pack_table(gf.exp2log.astype(np.int32)))
        self.antilog_t = jnp.asarray(pgf.pack_table(gf.log2exp.astype(np.int32)))
        sec = np.asarray(jax.device_get(rs.sec_tbl))[: self.fs + 1]
        inv = np.asarray(jax.device_get(rs.inv_tbl))[: self.fs + 1]
        self.sec_t = jnp.asarray(pgf.pack_table(sec))
        self.inv_t = jnp.asarray(pgf.pack_table(inv))
        # bf16 transposed copies of the XLA path's bit matrices
        self.G_synT = jnp.asarray(rs.G_syn, jnp.bfloat16).T   # [nr*m, fs*m]
        self.M_chienT = jnp.asarray(rs.M_chien, jnp.bfloat16).T  # [fs*m, nr*m]
        # verify-stage row constants a_i = ((fcr+i)*prim) mod fs
        i = np.arange(self.nr, dtype=np.int64)
        a = ((self.fcr + i) * self.prim) % self.fs
        av = np.zeros((self.NR_P, 1), np.int32)
        av[: self.nr, 0] = a
        self.verify_a = jnp.asarray(
            np.broadcast_to(av, (self.NR_P, self.lanes)).copy())

    # ------------------------------------------------------------ kernel

    def _kernel(self, size: int, pad: int, mode: str, *refs):
        if mode == "erasure":
            (rx_ref, gsyn_ref, mchien_ref, log_ref, alog_ref, sec_ref,
             inv_ref, va_ref, eras_ref,
             out_ref, aux_ref, sbuf_ref) = refs
        elif mode == "ext":
            (rx_ref, gsyn_ref, mchien_ref, log_ref, alog_ref, sec_ref,
             inv_ref, va_ref, slog_ref,
             out_ref, aux_ref, sbuf_ref) = refs
        else:
            (rx_ref, gsyn_ref, mchien_ref, log_ref, alog_ref, sec_ref,
             inv_ref, va_ref, out_ref, aux_ref, sbuf_ref) = refs
        LANES = self.lanes
        fs, nr, m = self.fs, self.nr, self.m
        NRP, ELP = self.NR_P, self.EL_P
        log_t, alog_t = log_ref[:], alog_ref[:]
        lut = functools.partial(pgf.lut256, )

        # Input arrives batch-major ([LANES, 256] u8 — the facade's
        # natural layout) and is transposed HERE, per 128-lane group on
        # the XLU, instead of paying an HBM-level [B, fs] -> [fs, B]
        # int32 transpose outside the kernel (measured ~8 ms per 131k
        # batch — it capped the decoder at 3.53M cw/s when the raw
        # kernel sustains more).
        rx_t = [
            rx_ref[128 * j : 128 * (j + 1), :].astype(jnp.int32).T
            for j in range(LANES // 128)
        ]
        rx = (rx_t[0] if LANES == 128 else jnp.concatenate(rx_t, axis=1))
        rx = rx[:fs]                                     # [fs, LANES]

        if mode == "ext":
            # external log-form syndromes (decode.c:446-464): sentinel
            # fs = "no error"; padding rows arrive as fs from the
            # wrapper.  log2exp[fs] = 0 makes the sentinel-vs-zero
            # equivalence exact (has_err below == any s_log != fs).
            synd_log = slog_ref[:]                        # [NRP, 128]
            s_sym = lut(alog_t, synd_log)
            has_err = _or_rows((s_sym != 0).astype(jnp.int32))
        else:
            # ---- bits (MSB-first, matching gf.linear_matrix) ----
            planes = [((rx >> (m - 1 - b)) & 1) for b in range(m)]
            bits = jnp.stack(planes, axis=1).reshape(fs * m, LANES)
            bits = bits.astype(jnp.bfloat16)

            # ---- syndromes: one MXU matmul (decode.c:375-415) ----
            syn_bits = jax.lax.dot_general(
                gsyn_ref[:], bits, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32) & 1                       # [nr*m, 128]
            s3 = syn_bits.reshape(nr, m, LANES)
            s_sym = s3[:, 0, :]
            for b in range(1, m):
                s_sym = (s_sym << 1) | s3[:, b, :]        # [nr, 128]
            if NRP != nr:
                s_sym = jnp.concatenate(
                    [s_sym, jnp.zeros((NRP - nr, LANES), jnp.int32)], axis=0
                )
            has_err = _or_rows((s_sym != 0).astype(jnp.int32))  # [8,128]

            synd_log = lut(log_t, s_sym)                  # [NRP, 128]
        # window buffer: row i of the slice at iteration `it` must be
        # synd_log[it-1-i] for i < it and the fs sentinel beyond
        # static row reverse (Mosaic has no `rev` lowering): unrolled
        # single-row slices, once per decode
        syn_rev = jnp.concatenate(
            [synd_log[i : i + 1] for i in range(nr - 1, -1, -1)], axis=0
        )
        # the BM loop slides a traced-offset window over this buffer;
        # Mosaic only lowers dynamic slicing on REFS, so it lives in a
        # VMEM scratch ref
        sbuf_ref[:] = jnp.concatenate(
            [syn_rev, jnp.full((ELP, LANES), fs, jnp.int32)], axis=0
        )

        # ---- Berlekamp-Massey (decode.c:49-96), fixed nr trips ----
        zero_i = rx[:1] & 0                               # varying zero row
        rows_elp = jax.lax.broadcasted_iota(jnp.int32, (ELP, LANES), 0)
        if mode == "erasure":
            # erasure-locator init (decode.c:34-47): el = prod over the
            # first `cnt` positions of (1 + alpha^{prim*(fs-1-(pos+pad))} x).
            # Positions arrive batch-major [128, 128] (slots on the
            # trailing axis, count in slot 127) and are transposed
            # in-kernel like the data word — no XLA-side transpose.
            er_t = eras_ref[:].T                          # [128, LANES]
            ec = er_t[127:128, :]                         # [1, 128]
            pos = er_t[: self.ERAS_SLOTS]                 # [EP, 128]
            eras_pos_rows = pos                           # reused in apply
            raw = (self.prim * (fs - 1 - (pos + pad))) & 0xFFFF
            idx = pgf.mod_fs(raw, fs, 0x10000)
            terms_e = lut(alog_t, idx)                    # alpha^(raw % fs)
            EP = pos.shape[0]
            el0 = jnp.where(rows_elp == 0, 1,
                            jnp.broadcast_to(zero_i, (ELP, LANES)))
            el0 = jnp.where(
                (rows_elp == 1) & (ec > 0),
                jnp.broadcast_to(terms_e[:1], (ELP, LANES)), el0)
            for e in range(1, min(EP, nr)):
                active = e < ec                           # [1, 128]
                term = jnp.broadcast_to(terms_e[e : e + 1], (ELP, LANES))
                contrib = pgf.gf_mul(log_t, alog_t, term,
                                     _shift_down(el0, 0), fs)
                maskj = (rows_elp >= 1) & (rows_elp <= e + 1)
                el0 = el0 ^ jnp.where(active & maskj, contrib, 0)
            coeff0 = lut(log_t, el0)
            pd0 = ec
        else:
            el0 = jnp.where(rows_elp == 0, 1,
                            jnp.broadcast_to(zero_i, (ELP, LANES)))
            coeff0 = jnp.where(el0 == 1, jnp.int32(0), jnp.int32(fs))
            pd0 = zero_i                                  # [1, 128]
            ec = zero_i

        def bm_body(it, state):
            el, coeff_log, pd = state
            w = sbuf_ref[pl.ds(nr - it, ELP), :]
            el_log = lut(log_t, el)
            terms = pgf.gf_mul_log(alog_t, el_log, w, fs)
            disc = _xor_rows(terms)                        # [8,128] equal rows
            disc_log = lut(log_t, disc)
            disc_nz = (disc[:1] != 0)                      # [1,128]

            contrib = pgf.gf_mul_log(
                alog_t, jnp.broadcast_to(disc_log[:1], (ELP, LANES)),
                coeff_log, fs,
            )
            poly = el ^ _shift_down(contrib, 0)

            # grow condition 2*pd <= it + ec - 1 (ec = 0 without
            # erasures, matching decode.c:65-77)
            grow = disc_nz & (2 * pd[:1] <= it + ec - 1)   # [1,128]
            # coeff division branch: log(el) - log(disc) (+fs), sentinel
            # propagated for el == 0
            d = el_log - jnp.broadcast_to(disc_log[:1], (ELP, LANES)) + fs
            d = jnp.where(d >= fs, d - fs, d)
            coeff_grow = jnp.where(el == 0, jnp.int32(fs), d)
            coeff_shift = _shift_down(coeff_log, fs)
            new_coeff = jnp.where(grow, coeff_grow, coeff_shift)
            new_pd = jnp.where(grow[:1], it + ec - pd, pd)
            new_el = jnp.where(disc_nz, poly, el)
            if mode == "erasure":
                # iterations it <= ec are skipped entirely (the C loop
                # starts at r = ec + 1, decode.c:55)
                act = it > ec                              # [1, 128]
                new_el = jnp.where(act, new_el, el)
                new_coeff = jnp.where(act, new_coeff, coeff_log)
                new_pd = jnp.where(act, new_pd, pd)
            return new_el, new_coeff, new_pd

        el, _, _ = jax.lax.fori_loop(1, nr + 1, bm_body, (el0, coeff0, pd0))

        el_log = lut(log_t, el)                            # [ELP, 128]
        rows_el = jax.lax.broadcasted_iota(jnp.int32, (ELP, LANES), 0)
        deg8 = _max_rows(jnp.where(el != 0, rows_el, 0))   # [8,128]
        deg = deg8[:1]                                     # [1,128]
        fail_deg = deg == 0

        # ---- Chien over all fs points: one MXU matmul ----
        lam = el[1 : nr + 1]                               # [nr, 128]
        lplanes = [((lam >> (m - 1 - b)) & 1) for b in range(m)]
        lam_bits = jnp.stack(lplanes, axis=1).reshape(nr * m, LANES)
        ev_bits = jax.lax.dot_general(
            mchien_ref[:], lam_bits.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32) & 1                            # [fs*m, 128]
        e3 = ev_bits.reshape(fs, m, LANES)
        terms = e3[:, 0, :]
        for b in range(1, m):
            terms = (terms << 1) | e3[:, b, :]             # [fs, 128]
        root_mask = (terms == 1).astype(jnp.int32)

        # ---- root compaction in scan order (decode.c:115-141) ----
        FSP = fs + 1                                       # 256 rows
        mask = jnp.concatenate(
            [root_mask, jnp.zeros((FSP - fs, LANES), jnp.int32)], axis=0
        )
        cum = mask
        sh = 1
        while sh < FSP:
            shifted = jnp.concatenate(
                [jnp.zeros((sh, LANES), jnp.int32), cum[: FSP - sh]], axis=0
            )
            cum = cum + shifted
            sh *= 2
        rank = cum - 1                                     # inclusive-1
        rows_f = jax.lax.broadcasted_iota(jnp.int32, (FSP, LANES), 0)
        i_vals = rows_f + 1                                # Chien point index
        selected = (mask == 1) & (rank < deg)
        found = _add_rows(jnp.where(selected, 1, 0))[:1]
        fail_count = found != deg
        k_vals = pgf.mod_fs(i_vals * self.prim_inv - 1 + fs, fs,
                            fs * max(self.prim_inv, 1) + fs)
        fail_pad = _or_rows(
            jnp.where(selected & (k_vals < pad), 1, 0)
        )[:1] != 0

        rankm = jnp.where(selected, rank, -1)
        roots_rows = []
        locs_rows = []
        for t in range(nr):
            m_t = rankm == t
            roots_rows.append(_add_rows(jnp.where(m_t, i_vals, 0))[:1])
            locs_rows.append(_add_rows(jnp.where(m_t, k_vals, 0))[:1])
        roots = jnp.concatenate(roots_rows, axis=0)        # [nr, 128]
        locs = jnp.concatenate(locs_rows, axis=0)          # [nr, 128]
        if NRP != nr:
            zpad = jnp.zeros((NRP - nr, LANES), jnp.int32)
            roots = jnp.concatenate([roots, zpad], axis=0)
            locs = jnp.concatenate([locs, zpad], axis=0)

        # ---- omega = S * lambda mod x^nr (decode.c:147-158) ----
        omega = jnp.broadcast_to(zero_i, (NRP, LANES)) & 0
        # j >= NRP contributes only to rows >= NRP (all sliced away);
        # Mosaic also rejects the zero-size slice that case would produce
        for j in range(min(nr + 1, NRP)):
            elj = el_log[j : j + 1]
            prod = pgf.gf_mul_log(
                alog_t, jnp.broadcast_to(elj, (NRP, LANES)), synd_log, fs
            )
            if j:
                prod = jnp.concatenate(
                    [jnp.zeros((j, LANES), jnp.int32), prod[: NRP - j]], axis=0
                )
            omega = omega ^ prod
        rows_nr = jax.lax.broadcasted_iota(jnp.int32, (NRP, LANES), 0)
        omega = jnp.where(rows_nr <= deg - 1, omega, 0)    # degree bound
        omega_log = lut(log_t, omega)

        # ---- Forney (decode.c:160-191) per root slot ----
        iota_nr = rows_nr
        t_iota = iota_nr                                   # reuse
        # odd lambda coefficient logs (denominator operands).  A strided
        # row slice lowers to an unsupported Mosaic gather, so build it
        # from unrolled single-row slices (t-independent: hoisted).
        n_odd = (nr + 1) // 2
        NOP = ((n_odd + 7) // 8) * 8
        lam_odd = jnp.concatenate(
            [el_log[j : j + 1] for j in range(1, nr + 1, 2)]
            + [jnp.full((NOP - n_odd, LANES), fs, jnp.int32)] * (NOP != n_odd),
            axis=0,
        )
        # i * root (numerator) and i * root for odd lambda (denominator)
        coeff_rows = []
        live_rows = []
        for t in range(nr):
            root_t = roots[t : t + 1]
            ir = pgf.mod_fs(iota_nr * root_t, fs, (NRP - 1) * fs)
            s = omega_log + ir
            s = jnp.where(s >= fs, s - fs, s)
            numt = jnp.where(omega_log >= fs, 0, pgf.lut256(alog_t, s))
            num = _xor_rows(numt)[:1]                      # [1,128]

            exps = jax.lax.broadcasted_iota(jnp.int32, (NOP, LANES), 0) * 2
            er = pgf.mod_fs(exps * root_t, fs, 2 * (NOP - 1) * fs)
            sd = lam_odd + er
            sd = jnp.where(sd >= fs, sd - fs, sd)
            dent = jnp.where(lam_odd >= fs, 0, pgf.lut256(alog_t, sd))
            den = _xor_rows(dent)[:1]

            sec = pgf.lut256(sec_ref[:], jnp.broadcast_to(root_t, (8, LANES)))
            invd = pgf.lut256(inv_ref[:], jnp.broadcast_to(den, (8, LANES)))
            c1 = pgf.gf_mul(log_t, alog_t,
                            jnp.broadcast_to(num, (8, LANES)), sec, fs)
            c2 = pgf.gf_mul(log_t, alog_t, c1, invd, fs)
            live = (num != 0) & (t < deg)
            coeff_rows.append(jnp.where(live, c2[:1], 0))
            live_rows.append(jnp.where(live, 1, 0))
        coeff = jnp.concatenate(coeff_rows, axis=0)        # [nr, 128]
        livem = jnp.concatenate(live_rows, axis=0)         # [nr, 128]
        if NRP != nr:
            zpad = jnp.zeros((NRP - nr, LANES), jnp.int32)
            coeff = jnp.concatenate([coeff, zpad], axis=0)
            livem = jnp.concatenate([livem, zpad], axis=0)
        corrected = _add_rows(livem)[:1]                   # [1,128]
        coeff_log = lut(log_t, coeff)

        # ---- syndrome re-verification (decode.c:193-209) ----
        acc = jnp.broadcast_to(zero_i, (NRP, LANES)) & 0
        for t in range(nr):
            loc_t = locs[t : t + 1]
            cl = coeff_log[t : t + 1]
            cv = coeff[t : t + 1]
            b_t = fs - loc_t - 1
            k = pgf.mod_fs(va_ref[:NRP] * b_t, fs, fs * fs)
            sverif = jnp.broadcast_to(cl, (NRP, LANES)) + k
            sverif = jnp.where(sverif >= fs, sverif - fs, sverif)
            term = pgf.lut256(alog_t, sverif)
            acc = acc ^ jnp.where(cv != 0, term, 0)
        fail_verify = _or_rows(
            jnp.where(iota_nr < nr, (acc != s_sym).astype(jnp.int32), 0)
        )[:1] != 0

        # ---- apply corrections (decode.c:211-227) ----
        rows_word = jax.lax.broadcasted_iota(jnp.int32, (fs, LANES), 0)
        corrvec = jnp.broadcast_to(zero_i, (fs, LANES)) & 0
        if mode == "erasure":
            # decode.c:211-214 erasure form: coeff_j lands at the
            # user's j-th erasure position (data region only; parity
            # untouched); no out-of-window failure path
            EP = eras_pos_rows.shape[0]
            fail_apply = zero_i != 0                       # all-False
            for t in range(min(nr, EP)):
                pos_t = eras_pos_rows[t : t + 1]
                live_t = (deg > t) & (pos_t >= 0) & (pos_t < size)
                cv = jnp.where(live_t, coeff[t : t + 1], 0)
                corrvec = corrvec ^ jnp.where(
                    rows_word == pos_t + pad, cv, 0)
        else:
            loc_pad = locs - pad
            jvalid = t_iota < deg
            in_data = (loc_pad >= 0) & (loc_pad < size) & jvalid
            in_par = (loc_pad >= size) & (loc_pad < size + nr) & jvalid
            bad = jvalid & ~(in_data | in_par)
            fail_apply = _or_rows(bad.astype(jnp.int32))[:1] != 0
            first_bad = _min_rows(jnp.where(bad, t_iota, nr))[:1]
            app = jvalid & (t_iota < first_bad)
            cval = jnp.where(app, coeff, 0)

            for t in range(nr):
                loc_t = locs[t : t + 1]
                cv = cval[t : t + 1]
                corrvec = corrvec ^ jnp.where(rows_word == loc_t, cv, 0)

        fail_pre = fail_deg | fail_pad | fail_count
        corrected = jnp.where(fail_pre, 0, corrected)
        revert = fail_pre | fail_verify
        out = jnp.where(revert, rx, rx ^ corrvec)
        # no detected errors: input unchanged, success, 0 corrected
        clean = has_err[:1] == 0
        out = jnp.where(clean, rx, out)
        ok = jnp.where(
            clean, 1, (~(fail_pre | fail_verify | fail_apply)).astype(jnp.int32)
        )
        corrected = jnp.where(clean, 0, corrected)

        # transpose back to batch-major [LANES, 256] in-kernel (the
        # symmetric saving on the output side)
        out256 = jnp.concatenate(
            [out, jnp.zeros((256 - fs, LANES), jnp.int32)], axis=0
        )
        out_t = [
            out256[:, 128 * j : 128 * (j + 1)].T
            for j in range(LANES // 128)
        ]
        out_ref[:] = (
            out_t[0] if LANES == 128 else jnp.concatenate(out_t, axis=0)
        )
        aux = jnp.concatenate(
            [ok, corrected, jnp.zeros((6, LANES), jnp.int32)], axis=0
        )
        aux_ref[:] = aux

    # ----------------------------------------------------------- wrapper

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _decode_blocks(self, data, parity, size: int, mode: str, extra=()):
        """data [B,size] u8, parity [B,nr] u8; B % lanes == 0.

        mode "plain": extra = ().
        mode "erasure": extra = (eras_pos [B, E] i32, eras_count [B] i32).
        mode "ext": extra = (s_log [B, nr] i32,).
        """
        fs, nr = self.fs, self.nr
        pad = fs - nr - size
        B = data.shape[0]
        # batch-major u8, one fused XLA concat pass — both the int32
        # cast and the [B, fs] -> [fs, B] transpose happen inside the
        # kernel (see _kernel), so this is 4x less HBM traffic and no
        # HBM transpose at all
        word = jnp.concatenate(
            [
                jnp.zeros((B, pad), jnp.uint8),
                data.astype(jnp.uint8),
                parity.astype(jnp.uint8),
                jnp.zeros((B, 256 - fs), jnp.uint8),
            ],
            axis=1,
        )                                                  # [B, 256]

        LANES = self.lanes
        NRP = self.NR_P
        kern = functools.partial(self._kernel, size, pad, mode)
        grid = (B // LANES,)
        tbl_spec = pl.BlockSpec((2, 8, 128), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((LANES, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nr * 8, fs * 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fs * 8, nr * 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            # packed GF tables are [2, 8, 128] vregs — 128 wide
            # regardless of the lane-block width (lut256 gathers
            # per 128-lane column chunk)
            tbl_spec, tbl_spec, tbl_spec, tbl_spec,
            pl.BlockSpec((NRP, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [word, self.G_synT, self.M_chienT, self.log_t,
                    self.antilog_t, self.sec_t, self.inv_t, self.verify_a]
        if mode == "erasure":
            eras_pos, eras_count = extra
            E = eras_pos.shape[1]
            # batch-major combined operand: slots 0..E-1 = positions
            # (-1 pad beyond), slot 127 = count; transposed in-kernel
            eras128 = jnp.concatenate(
                [
                    eras_pos.astype(jnp.int32)[:, :127],
                    jnp.full((B, max(0, 127 - E)), -1, jnp.int32),
                    eras_count.astype(jnp.int32)[:, None],
                ],
                axis=1,
            )
            in_specs += [
                pl.BlockSpec((LANES, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            operands += [eras128]
        elif mode == "ext":
            (s_log,) = extra
            slogT = jnp.pad(
                s_log.astype(jnp.int32).T, ((0, NRP - nr), (0, 0)),
                constant_values=fs,
            )                                              # [NRP, B]
            in_specs += [
                pl.BlockSpec((NRP, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ]
            operands += [slogT]
        out, aux = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((LANES, 256), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 256), jnp.int32),
                jax.ShapeDtypeStruct((8, B), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nr + self.EL_P, LANES), jnp.int32),
            ],
            interpret=self._interpret,
        )(*operands)

        data_out = out[:, pad : pad + size].astype(jnp.uint8)
        par_out = out[:, pad + size : pad + size + nr].astype(jnp.uint8)
        ok = aux[0].astype(bool)
        corrected = aux[1]
        return ok, data_out, par_out, corrected

    _interpret = False

    def supports_erasure(self, E: int) -> bool:
        """Erasure lists up to num_roots positions ride the kernel."""
        return 0 < E <= self.nr

    def _pad_batch(self, arrs, B):
        LANES = self.lanes
        Bp = ((B + LANES - 1) // LANES) * LANES
        if Bp == B:
            return arrs, B
        reps = -(-(Bp - B) // B)
        out = []
        for a in arrs:
            pad = jnp.tile(a, (reps,) + (1,) * (a.ndim - 1))[: Bp - B]
            out.append(jnp.concatenate([a, pad], axis=0))
        return out, B

    def decode_plain(self, data, parity):
        """Facade-shape plain decode: pads B to a 128 multiple."""
        data = jnp.asarray(data)
        parity = jnp.asarray(parity)
        B, size = data.shape
        (data, parity), B = self._pad_batch([data, parity], B)
        ok, d, p, c = self._decode_blocks(data, parity, size, "plain")
        return ok[:B], d[:B], p[:B], c[:B]

    def decode_erasure(self, data, parity, eras_pos, eras_count):
        """Erasure decode (decode.c:466-473 path), fused kernel."""
        data = jnp.asarray(data)
        parity = jnp.asarray(parity)
        B, size = data.shape
        (data, parity, eras_pos, eras_count), B = self._pad_batch(
            [data, parity, jnp.asarray(eras_pos, jnp.int32),
             jnp.asarray(eras_count, jnp.int32)], B)
        ok, d, p, c = self._decode_blocks(
            data, parity, size, "erasure", (eras_pos, eras_count))
        return ok[:B], d[:B], p[:B], c[:B]

    def decode_ext(self, data, parity, s_log):
        """External-syndrome decode (decode.c:446-464), fused kernel."""
        data = jnp.asarray(data)
        parity = jnp.asarray(parity)
        B, size = data.shape
        (data, parity, s_log), B = self._pad_batch(
            [data, parity, jnp.asarray(s_log, jnp.int32)], B)
        ok, d, p, c = self._decode_blocks(
            data, parity, size, "ext", (s_log,))
        return ok[:B], d[:B], p[:B], c[:B]
