"""Reed-Solomon codec, TPU-native.

Re-design of the reference RS pipeline (src/rs.c, src/encode.c:17-145,
src/decode.c:17-487) for batched execution on TPU:

* The reference encodes ONE codeword per call with a scalar LFSR
  (encode.c:120-144, 223 x 32 table lookups) and computes syndromes with
  a scalar Horner loop (decode.c:375-415).  Both are GF(2)-LINEAR maps
  with fixed constants, so here they are precomputed 0/1 matrices
  applied to the whole [B, bits] batch with ONE matmul mod 2 on the MXU
  (see ops/gf2.py).  The same trick turns the Chien search's sequential
  register trick (decode.c:115-144) into a dense [B, t*m] @ [t*m, n*m]
  evaluation at all n field points at once.

* Berlekamp-Massey keeps its serial data dependence (decode.c:49-96) but
  runs as a fixed-trip-count fori_loop with branchless jnp.where
  selects, parallel over the batch axis.

* Shortened-code semantics (decode.c:418-429), the erasure-locator
  initialisation (decode.c:34-47), the external-syndrome path
  (decode.c:446-464), Forney's quirks (uint16 wraparound for fcr=0,
  int16 truncation in the verification exponent) and the partial
  in-place application on failure (decode.c:211-227) are all replicated
  exactly; outputs are bit-identical to the C library (tested against
  the compiled reference in tests/test_oracle_compat.py).

Sentinel convention throughout: logs live in [0, fs-1]; the value fs
(= 2^m - 1) is "log of zero" (gf.c:62).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RSConfig
from ..ops.gf import GF, GFError
from ..ops.gf2 import gf2_matmul


def _xor_reduce(x, axis: int):
    return jax.lax.reduce(x, np.int32(0), jax.lax.bitwise_xor, (axis,))


def _symbols_to_bits_np(sym: np.ndarray, m: int) -> np.ndarray:
    """[..., n] symbols -> [..., n*m] bits, MSB-first within each symbol."""
    shifts = np.arange(m - 1, -1, -1)
    bits = (sym[..., :, None] >> shifts) & 1
    return bits.reshape(*sym.shape[:-1], sym.shape[-1] * m).astype(np.uint8)


def _symbols_to_bits(sym, m: int):
    shifts = jnp.arange(m - 1, -1, -1, dtype=jnp.int32)
    bits = (sym[..., :, None] >> shifts) & 1
    return bits.reshape(*sym.shape[:-1], sym.shape[-1] * m)


def _bits_to_symbols(bits, m: int):
    n = bits.shape[-1] // m
    b = bits.reshape(*bits.shape[:-1], n, m).astype(jnp.int32)
    weights = jnp.left_shift(jnp.int32(1), jnp.arange(m - 1, -1, -1, dtype=jnp.int32))
    return (b * weights).sum(axis=-1)


def _build_genpoly(gf: GF, fcr: int, prim: int, num_roots: int) -> np.ndarray:
    """Generator polynomial prod_{i<nr}(x - alpha^{(fcr+i)*prim}), returned
    in LOG form (reference rs.c:59-80)."""
    fs = gf.field_size
    g = np.zeros(num_roots + 1, dtype=np.int64)
    g[0] = 1
    root = fcr * prim
    for i in range(num_roots):
        g[i + 1] = 1
        for j in range(i, 0, -1):
            if g[j] != 0:
                g[j] = g[j - 1] ^ int(
                    gf.log2exp[(int(gf.exp2log[g[j]]) + root) % fs]
                )
            else:
                g[j] = g[j - 1]
        g[0] = int(gf.log2exp[(int(gf.exp2log[g[0]]) + root) % fs])
        root += prim
    return gf.exp2log[g].astype(np.int64)  # log form; sentinel fs for zero coeffs


def _encode_np(gf: GF, genlog: np.ndarray, num_roots: int, data: np.ndarray) -> np.ndarray:
    """Batched NumPy systematic LFSR — value-identical to encode.c:120-144.
    Used only to derive the encode bit-matrix at construction time."""
    fs = gf.field_size
    log2exp = gf.log2exp.astype(np.int64)
    exp2log = gf.exp2log.astype(np.int64)
    B, size = data.shape
    genrev = genlog[num_roots - 1 :: -1].copy()  # genrev[l] = genlog[nr-1-l]
    parity = np.zeros((B, num_roots), dtype=np.int64)
    for i in range(size):
        fb = exp2log[(data[:, i] & fs) ^ parity[:, 0]]
        valid = (fb != fs)[:, None]
        contrib = np.where(valid, log2exp[(fb[:, None] + genrev[None, :]) % fs], 0)
        shifted = np.concatenate(
            [parity[:, 1:], np.zeros((B, 1), dtype=np.int64)], axis=1
        )
        parity = shifted ^ contrib
    return parity


_MATRIX_CACHE: dict = {}


class RSCodec:
    """Batched Reed-Solomon over GF(2^m), m <= 8 for the byte API."""

    def __init__(self, cfg: RSConfig):
        gf = GF(cfg.symbol_size, cfg.generator_polynomial)
        if cfg.primitive_element == 0:
            raise GFError("primitive_element must be nonzero (poporon.c:78-82)")
        self.gf = gf
        self.m = gf.symbol_size
        self.fs = gf.field_size
        self.fcr = int(cfg.first_consecutive_root)
        self.prim = int(cfg.primitive_element)
        self.num_roots = int(cfg.num_roots)
        self.k = self.fs - self.num_roots  # max data symbols
        if self.k <= 0:
            raise GFError("num_roots >= field size")

        # primitive inverse by the reference's trial loop (poporon.c:84-93)
        inv = None
        v, it = 1, 0
        while v % self.prim != 0:
            v += self.fs
            it += 1
            if it > self.fs * 2:
                raise GFError("primitive_element has no inverse")
        inv = v // self.prim
        self.prim_inv = inv

        self.genlog = _build_genpoly(gf, self.fcr, self.prim, self.num_roots)

        key = (self.m, gf.generator_polynomial, self.fcr, self.prim, self.num_roots)
        mats = _MATRIX_CACHE.get(key)
        if mats is None:
            mats = self._build_matrices()
            _MATRIX_CACHE[key] = mats
        g_enc, g_syn, m_chien = mats

        f32 = jnp.float32
        self.G_enc = jnp.asarray(g_enc, dtype=f32)      # [k*m, nr*m]
        self.G_syn = jnp.asarray(g_syn, dtype=f32)      # [fs*m, nr*m]
        self.M_chien = jnp.asarray(m_chien, dtype=f32)  # [nr*m, fs*m]
        self.log2exp_j = jnp.asarray(gf.log2exp, dtype=jnp.int32)
        self.exp2log_j = jnp.asarray(gf.exp2log, dtype=jnp.int32)

    # ------------------------------------------------------------ build

    def _build_matrices(self):
        gf, m, nr, fs = self.gf, self.m, self.num_roots, self.fs
        k = self.k
        # Encode matrix: parity response of every data-bit basis vector,
        # obtained by running the (NumPy) LFSR — captures encode.c exactly.
        basis = np.zeros((k * m, k), dtype=np.int64)
        for p in range(k):
            for b in range(m):
                basis[p * m + b, p] = 1 << (m - 1 - b)
        parity = _encode_np(gf, self.genlog, nr, basis)          # [k*m, nr]
        g_enc = _symbols_to_bits_np(parity, m)                    # [k*m, nr*m]

        # Syndrome matrix: S_i = sum_j r_j alpha^{(fcr+i)*prim*(fs-1-j)}
        # over the full-length (zero-padded) word — Horner closed form of
        # decode.c:375-415.
        pos = np.arange(fs, dtype=np.int64)[:, None]              # j
        i = np.arange(nr, dtype=np.int64)[None, :]
        expnt = ((self.fcr + i) * self.prim * (fs - 1 - pos)) % fs
        syn_consts = gf.log2exp[expnt]                            # [fs, nr]
        g_syn = gf.linear_matrix(syn_consts)                      # [fs*m, nr*m]

        # Chien evaluation matrix: terms(i) = sum_{j>=1} lam_j alpha^{j*i},
        # i = 1..fs (the dense replacement of decode.c:115-141).
        j = np.arange(1, nr + 1, dtype=np.int64)[:, None]
        i2 = np.arange(1, fs + 1, dtype=np.int64)[None, :]
        chien_consts = gf.log2exp[(j * i2) % fs]                  # [nr, fs]
        m_chien = gf.linear_matrix(chien_consts)                  # [nr*m, fs*m]
        return g_enc, g_syn, m_chien

    # ----------------------------------------------------------- encode

    @functools.partial(jax.jit, static_argnums=0)
    def _encode(self, data):
        m, fs = self.m, self.fs
        size = data.shape[-1]
        data = data.astype(jnp.int32) & fs
        bits = _symbols_to_bits(data, m).astype(jnp.float32)
        g = self.G_enc[(self.k - size) * m :]  # shortened: suffix rows
        pbits = gf2_matmul(bits, g)
        return _bits_to_symbols(pbits, m).astype(jnp.uint8)

    def encode(self, data):
        """data: uint8 [B, size] (or [size]) -> parity uint8 [B, nr]."""
        data = jnp.asarray(data)
        squeeze = data.ndim == 1
        if squeeze:
            data = data[None]
        if data.shape[-1] > self.k:
            raise ValueError(f"size {data.shape[-1]} exceeds k={self.k}")
        out = self._encode(data)
        return out[0] if squeeze else out

    # ------------------------------------------------------- decode core

    def _syndrome(self, data, parity):
        """Normal-domain syndromes [B, nr] of the shortened word."""
        m, fs = self.m, self.fs
        size = data.shape[-1]
        pad = fs - self.num_roots - size
        dbits = _symbols_to_bits(data.astype(jnp.int32) & fs, m)
        pbits = _symbols_to_bits(parity.astype(jnp.int32) & fs, m)
        gd = self.G_syn[pad * m : (pad + size) * m]
        gp = self.G_syn[(pad + size) * m :]
        sbits = gf2_matmul(dbits.astype(jnp.float32), gd) ^ gf2_matmul(
            pbits.astype(jnp.float32), gp
        )
        return _bits_to_symbols(sbits, m)

    def _erasure_locator(self, eras_pos, eras_count, pad):
        """Batched erasure-locator product (decode.c:34-47).

        eras_pos: [B, E] int32 positions; eras_count: [B] int32.
        Returns error_locator [B, nr+1] in NORMAL domain.
        """
        B, E = eras_pos.shape
        fs, nr = self.fs, self.num_roots
        log2exp, exp2log = self.log2exp_j, self.exp2log_j
        # poly_term_i: uint16-wrapped prim*(fs-1-(pos+pad)), then mod fs
        raw = self.prim * (fs - 1 - (eras_pos + pad))
        terms = (raw & 0xFFFF) % fs                              # [B, E]

        el = jnp.zeros((B, nr + 1), dtype=jnp.int32)
        el = el.at[:, 0].set(1)
        first = jnp.where(eras_count > 0, jnp.take(log2exp, terms[:, 0]), 0)
        el = el.at[:, 1].set(first)

        lane = jnp.arange(nr + 1, dtype=jnp.int32)[None, :]

        def body(i, el):
            active = (i < eras_count)[:, None]
            t = jnp.take(exp2log, el)                            # [B, nr+1]
            t_shift = jnp.roll(t, 1, axis=1).at[:, 0].set(fs)    # t[j-1]
            term_i = jnp.take_along_axis(terms, i[None, None].repeat(B, 0), axis=1)
            contrib = jnp.where(
                t_shift != fs,
                jnp.take(log2exp, (term_i + t_shift) % fs),
                0,
            )
            maskj = (lane >= 1) & (lane <= i + 1)
            return el ^ jnp.where(active & maskj, contrib, 0)

        if E > 1:
            el = jax.lax.fori_loop(1, E, body, el)
        return el

    def _berlekamp_massey(self, s_log, el_init, eras_count):
        """Fixed-trip branchless BM (decode.c:49-96).

        s_log: [B, nr] log-form syndromes; el_init: [B, nr+1] normal-form
        initial locator; eras_count: [B].
        Returns error_locator [B, nr+1] in NORMAL domain.
        """
        B = s_log.shape[0]
        fs, nr = self.fs, self.num_roots
        log2exp, exp2log = self.log2exp_j, self.exp2log_j
        lane = jnp.arange(nr + 1, dtype=jnp.int32)[None, :]

        coeff = jnp.take(exp2log, el_init)            # log domain b(x)
        el = el_init
        poly_deg = eras_count.astype(jnp.int32)

        def shift_right(x):
            return jnp.roll(x, 1, axis=1).at[:, 0].set(fs)

        def body(it, state):
            el, coeff, poly_deg = state
            # discrepancy = XOR_{i<it} locator_i * S_{it-i-1}
            idx = jnp.clip(it - 1 - lane[:, : nr + 1], 0, nr - 1)  # [1, nr+1]
            s_at = jnp.take_along_axis(
                s_log, jnp.broadcast_to(idx, (B, nr + 1)), axis=1
            )
            valid = (lane < it) & (el != 0) & (s_at != fs)
            contrib = jnp.where(
                valid, jnp.take(log2exp, (jnp.take(exp2log, el) + s_at) % fs), 0
            )
            disc = _xor_reduce(contrib, 1)                        # [B]
            disc_log = jnp.take(exp2log, disc)
            no_disc = (disc_log == fs)[:, None]

            # polynomial = locator + disc * b(x) shifted (normal domain)
            prev_coeff = jnp.roll(coeff, 1, axis=1).at[:, 0].set(fs)  # b_{i-1}
            upd = jnp.where(
                prev_coeff != fs,
                jnp.take(log2exp, (disc_log[:, None] + prev_coeff) % fs),
                0,
            )
            poly = el ^ jnp.where(lane >= 1, upd, 0)
            # (lane 0: polynomial[0] = el[0] — upd masked out)

            grow = (2 * poly_deg <= it + eras_count - 1)[:, None]
            new_poly_deg = jnp.where(
                grow[:, 0], it + eras_count - poly_deg, poly_deg
            )
            scaled = jnp.where(
                el == 0,
                fs,
                (jnp.take(exp2log, el) - disc_log[:, None] + fs) % fs,
            )
            coeff_shifted = shift_right(coeff)
            new_coeff = jnp.where(
                no_disc, coeff_shifted, jnp.where(grow, scaled, coeff_shifted)
            )
            new_el = jnp.where(no_disc, el, poly)
            new_poly_deg = jnp.where(no_disc[:, 0], poly_deg, new_poly_deg)
            return new_el, new_coeff, new_poly_deg

        def outer(it, state):
            el, coeff, poly_deg = state
            new = body(it, state)
            active = (it > eras_count)[:, None]
            return (
                jnp.where(active, new[0], el),
                jnp.where(active, new[1], coeff),
                jnp.where(active[:, 0], new[2], poly_deg),
            )

        el, coeff, poly_deg = jax.lax.fori_loop(
            1, nr + 1, outer, (el, coeff, poly_deg)
        )
        return el

    def _chien(self, el_norm):
        """Dense Chien search: roots of the locator at alpha^i, i=1..fs.

        Returns root_mask [B, fs] (i-1 indexed).
        """
        m, fs, nr = self.m, self.fs, self.num_roots
        lam = el_norm[:, 1:]                                # lambda_1..nr
        lam_bits = _symbols_to_bits(lam, m).astype(jnp.float32)
        term_bits = gf2_matmul(lam_bits, self.M_chien)      # [B, fs*m]
        terms = _bits_to_symbols(term_bits, m)              # [B, fs]
        return terms == 1                                    # eval = 1 ^ terms == 0

    def _correct(self, data, parity, s_log, eras_pos, eras_count, pad,
                 erasure_apply: bool):
        """error_correction_u8 (decode.c:17-230), batched.

        Returns (ok [B] bool, data, parity, corrected [B] int32).
        """
        B, size = data.shape
        fs, nr, m = self.fs, self.num_roots, self.m
        log2exp, exp2log = self.log2exp_j, self.exp2log_j
        t_max = nr

        el0 = self._erasure_locator(eras_pos, eras_count, pad)
        el_norm = self._berlekamp_massey(s_log, el0, eras_count)
        el_log = jnp.take(exp2log, el_norm)                 # [B, nr+1]

        lane = jnp.arange(nr + 1, dtype=jnp.int32)[None, :]
        deg = jnp.max(jnp.where(el_log != fs, lane, 0), axis=1)  # [B]
        fail_deg = deg == 0

        # --- Chien ---
        root_mask = self._chien(el_norm)                    # [B, fs] at i=1..fs
        i_vals = jnp.arange(1, fs + 1, dtype=jnp.int32)[None, :]
        cum = jnp.cumsum(root_mask.astype(jnp.int32), axis=1)
        selected = root_mask & (cum <= deg[:, None])
        found = jnp.sum(selected.astype(jnp.int32), axis=1)
        k_vals = (i_vals * self.prim_inv - 1) % fs          # location of i
        fail_pad = jnp.any(selected & (k_vals < pad), axis=1)
        fail_count = found != deg

        # roots in scan order, padded with fs+1
        root_seq = jnp.sort(jnp.where(selected, i_vals, fs + 1), axis=1)
        roots = root_seq[:, :t_max]                         # [B, t]
        jlane = jnp.arange(t_max, dtype=jnp.int32)[None, :]
        jvalid = jlane < deg[:, None]
        roots = jnp.where(jvalid, roots, 0)
        locs = jnp.where(jvalid, (roots * self.prim_inv - 1) % fs, 0)

        # --- Forney: error evaluator Omega (decode.c:147-158) ---
        ii = jnp.arange(nr, dtype=jnp.int32)
        jj = jnp.arange(nr + 1, dtype=jnp.int32)
        sidx = ii[:, None] - jj[None, :]                    # [nr, nr+1]
        pair_valid = sidx >= 0
        s_at = jnp.take(
            s_log, jnp.clip(sidx, 0, nr - 1), axis=1
        )                                                    # [B, nr, nr+1]
        lam_at = el_log[:, None, :]                          # [B, 1, nr+1]
        contrib = jnp.where(
            pair_valid[None] & (s_at != fs) & (lam_at != fs),
            jnp.take(log2exp, (s_at + lam_at) % fs),
            0,
        )
        omega_norm = _xor_reduce(contrib, 2)                 # [B, nr]
        omega_log = jnp.take(exp2log, omega_norm)

        # numerator_j = Omega(root_j) (decode.c:160-169)
        omega_i = ii[None, None, :]                          # eval index
        num_valid = (omega_i <= (deg[:, None, None] - 1)) & (
            omega_log[:, None, :] != fs
        )
        num_contrib = jnp.where(
            num_valid,
            jnp.take(
                log2exp,
                (omega_log[:, None, :] + omega_i * roots[:, :, None]) % fs,
            ),
            0,
        )
        numerator = _xor_reduce(num_contrib, 2)              # [B, t]

        # second numerator: uint16-wrapped root*(fcr-1)+fs (decode.c:175-176)
        sec_arg = ((roots * (self.fcr - 1) + fs) & 0xFFFF) % fs
        second = jnp.take(log2exp, sec_arg)

        # denominator: formal derivative at root (decode.c:179-185)
        imax = jnp.minimum(deg, nr - 1) & ~1                 # [B]
        di = jnp.arange(0, nr, 2, dtype=jnp.int32)           # even i
        lam_odd = jnp.take(el_log, jnp.minimum(di + 1, nr), axis=1)  # [B, ceil(nr/2)]
        den_valid = (di[None, None, :] <= imax[:, None, None]) & (
            lam_odd[:, None, :] != fs
        )
        den_contrib = jnp.where(
            den_valid,
            jnp.take(
                log2exp,
                (lam_odd[:, None, :] + di[None, None, :] * roots[:, :, None]) % fs,
            ),
            0,
        )
        denominator = _xor_reduce(den_contrib, 2)            # [B, t]

        coeff = jnp.take(
            log2exp,
            (
                jnp.take(exp2log, numerator)
                + jnp.take(exp2log, second)
                + fs
                - jnp.take(exp2log, denominator)
            )
            % fs,
        )
        coeff = jnp.where(jvalid & (numerator != 0), coeff, 0)
        corrected = jnp.sum((jvalid & (numerator != 0)).astype(jnp.int32), axis=1)

        # --- syndrome re-verification (decode.c:193-209) ---
        vi = jnp.arange(nr, dtype=jnp.int32)                 # [nr]
        kraw = (
            (self.fcr + vi[None, :, None])
            * self.prim
            * (fs - locs[:, None, :] - 1)
        )                                                    # [B, nr, t]
        k16 = ((kraw + 0x8000) % 0x10000) - 0x8000           # int16 truncation
        varg = (jnp.take(exp2log, coeff)[:, None, :] + k16) & 0xFFFF
        vcontrib = jnp.where(
            jvalid[:, None, :] & (coeff[:, None, :] != 0),
            jnp.take(log2exp, varg % fs),
            0,
        )
        v = _xor_reduce(vcontrib, 2)                         # [B, nr]
        s_norm = jnp.take(log2exp, s_log)
        fail_verify = jnp.any(v != s_norm, axis=1)

        # --- apply corrections ---
        if erasure_apply:
            # decode.c:211-214: XOR coeff_j at the user's erasure positions
            E = eras_pos.shape[1]
            posj = jnp.pad(eras_pos, ((0, 0), (0, max(0, t_max - E))))[:, :t_max]
            onehot = jax.nn.one_hot(posj, size, dtype=jnp.int32)
            vec = jnp.sum(onehot * jnp.where(jvalid, coeff, 0)[:, :, None], axis=1)
            data_out = data.astype(jnp.int32) ^ vec
            parity_out = parity.astype(jnp.int32)
            fail_apply = jnp.zeros((B,), dtype=bool)
        else:
            loc_pad = locs - pad
            in_data = (loc_pad >= 0) & (loc_pad < size) & jvalid
            in_parity = (loc_pad >= size) & (loc_pad < size + nr) & jvalid
            bad = jvalid & ~(in_data | in_parity)
            fail_apply = jnp.any(bad, axis=1)
            # C applies sequentially and stops at the first bad location
            first_bad = jnp.min(jnp.where(bad, jlane, t_max), axis=1)
            app = jvalid & (jlane < first_bad[:, None])
            cval = jnp.where(app, coeff, 0)
            oh_d = jax.nn.one_hot(
                jnp.where(in_data & app, loc_pad, -1), size, dtype=jnp.int32
            )
            oh_p = jax.nn.one_hot(
                jnp.where(in_parity & app, loc_pad - size, -1), nr, dtype=jnp.int32
            )
            data_out = data.astype(jnp.int32) ^ jnp.sum(
                oh_d * cval[:, :, None], axis=1
            )
            parity_out = parity.astype(jnp.int32) ^ jnp.sum(
                oh_p * cval[:, :, None], axis=1
            )

        fail_pre = fail_deg | fail_pad | fail_count
        ok = ~(fail_pre | fail_verify | fail_apply)
        corrected = jnp.where(fail_pre, 0, corrected)
        # on any failure the reference leaves data untouched EXCEPT the
        # partial-application quirk, which `app` above already encodes for
        # fail_apply; for all other failures revert.
        revert = (fail_pre | fail_verify)[:, None]
        data_out = jnp.where(revert, data.astype(jnp.int32), data_out)
        parity_out = jnp.where(revert, parity.astype(jnp.int32), parity_out)
        return ok, data_out.astype(jnp.uint8), parity_out.astype(jnp.uint8), corrected

    # ------------------------------------------------------ decode paths

    @functools.partial(jax.jit, static_argnums=0)
    def _decode_plain(self, data, parity):
        B, size = data.shape
        fs, nr = self.fs, self.num_roots
        pad = fs - nr - size
        s = self._syndrome(data, parity)
        has_err = jnp.any(s != 0, axis=1)
        s_log = jnp.take(self.exp2log_j, s)
        zero_pos = jnp.zeros((B, 1), dtype=jnp.int32)
        zero_cnt = jnp.zeros((B,), dtype=jnp.int32)
        ok_c, d, p, corr = self._correct(
            data, parity, s_log, zero_pos, zero_cnt, pad, erasure_apply=False
        )
        ok = jnp.where(has_err, ok_c, True)
        keep = ~has_err
        d = jnp.where(keep[:, None], data, d)
        p = jnp.where(keep[:, None], parity, p)
        corr = jnp.where(keep, 0, corr)
        return ok, d, p, corr

    @functools.partial(jax.jit, static_argnums=0)
    def _decode_erasure(self, data, parity, eras_pos, eras_count):
        B, size = data.shape
        fs, nr = self.fs, self.num_roots
        pad = fs - nr - size
        s = self._syndrome(data, parity)
        has_err = jnp.any(s != 0, axis=1)
        s_log = jnp.take(self.exp2log_j, s)
        ok_c, d, p, corr = self._correct(
            data, parity, s_log, eras_pos, eras_count, pad, erasure_apply=True
        )
        ok = jnp.where(has_err, ok_c, True)
        keep = ~has_err
        d = jnp.where(keep[:, None], data, d)
        p = jnp.where(keep[:, None], parity, p)
        corr = jnp.where(keep, 0, corr)
        return ok, d, p, corr

    @functools.partial(jax.jit, static_argnums=0)
    def _decode_ext_syndrome(self, data, parity, s_log):
        B, size = data.shape
        fs, nr = self.fs, self.num_roots
        pad = fs - nr - size
        has_err = jnp.any(s_log != fs, axis=1)
        zero_pos = jnp.zeros((B, 1), dtype=jnp.int32)
        zero_cnt = jnp.zeros((B,), dtype=jnp.int32)
        ok_c, d, p, corr = self._correct(
            data, parity, s_log.astype(jnp.int32), zero_pos, zero_cnt, pad,
            erasure_apply=False,
        )
        ok = jnp.where(has_err, ok_c, True)
        keep = ~has_err
        d = jnp.where(keep[:, None], data, d)
        p = jnp.where(keep[:, None], parity, p)
        corr = jnp.where(keep, 0, corr)
        return ok, d, p, corr

    def decode(self, data, parity, erasures=None, ext_syndrome=None):
        """Batched decode.

        data [B, size] / [size] uint8; parity [B, nr] / [nr].
        erasures: optional (positions [B, E], counts [B]) int32 arrays, or
        a 1-D position list broadcast over the batch.
        ext_syndrome: optional log-form syndromes [B, nr] (sentinel fs =
        "no error"), the external-syndrome path of decode.c:446-464.

        Returns (ok [B] bool, data, parity, corrected [B] int32).
        """
        data = jnp.asarray(data)
        parity = jnp.asarray(parity)
        squeeze = data.ndim == 1
        if squeeze:
            data = data[None]
            parity = parity[None]
        size = data.shape[-1]
        pad = self.fs - self.num_roots - size
        if pad < 0 or pad >= self.fs - self.num_roots:
            B = data.shape[0]
            z = jnp.zeros((B,), dtype=jnp.int32)
            out = (jnp.zeros((B,), bool), data, parity, z)
            return tuple(o[0] for o in out) if squeeze else out

        if ext_syndrome is not None:
            s = jnp.asarray(ext_syndrome, dtype=jnp.int32)
            if s.ndim == 1:
                s = jnp.broadcast_to(s[None], (data.shape[0], self.num_roots))
            out = self._decode_ext_syndrome(data, parity, s)
        elif erasures is not None:
            if isinstance(erasures, tuple):
                pos, cnt = erasures
            else:
                pos = jnp.asarray(erasures, dtype=jnp.int32)
                if pos.ndim == 1:
                    pos = jnp.broadcast_to(pos[None], (data.shape[0], pos.shape[0]))
                cnt = jnp.full((data.shape[0],), pos.shape[1], dtype=jnp.int32)
            pos = jnp.asarray(pos, dtype=jnp.int32)
            cnt = jnp.asarray(cnt, dtype=jnp.int32)
            out = self._decode_erasure(data, parity, pos, cnt)
        else:
            out = self._decode_plain(data, parity)
        if squeeze:
            return tuple(o[0] for o in out)
        return out
