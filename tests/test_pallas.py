"""Pallas kernels vs the XLA reference paths (which are oracle-exact).

On CPU the kernels run in interpret mode so the suite stays
CPU-runnable; run this file with PPTPU_TEST_PLATFORM=axon to execute
the SAME tests compiled on real TPU hardware (ci.sh's TPU leg does).

LDPC coverage: RANDOM and QC matrices, three code geometries inside
BPPallasKernel.supports(), hard and soft inputs, multi-block grids
(B = 2*BLK), ragged batches through the padding shim, pre-converged
rows, junk rows, and budget exhaustion (MI=1 under heavy noise) —
every case asserts (ok, bits, iters) equality against LDPCCodec's
_bp_loop.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from libpoporon_tpu.config import LdpcConfig, LdpcRate
from libpoporon_tpu.models.ldpc import LDPCCodec, LLR_MAX, LLR_INFINITY
from libpoporon_tpu.models import ldpc_pallas as lp
from libpoporon_tpu.config import RSConfig
from libpoporon_tpu.models.rs import RSCodec
from libpoporon_tpu.models.rs_pallas import RSPallasDecoder
from libpoporon_tpu.utils import bits as bitutils

INTERPRET = jax.devices()[0].platform != "tpu"


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    old_bp = lp.BPPallasKernel._interpret
    old_rs = RSPallasDecoder._interpret
    lp.BPPallasKernel._interpret = INTERPRET
    RSPallasDecoder._interpret = INTERPRET
    yield
    lp.BPPallasKernel._interpret = old_bp
    RSPallasDecoder._interpret = old_rs


# ------------------------------------------------------------------ RS

def test_rs_pallas_matches_xla():
    rs = RSCodec(RSConfig())
    dec = RSPallasDecoder(rs, lanes=128)
    rng = np.random.default_rng(11)
    B, size = 128, 223
    data = rng.integers(0, 256, (B, size), dtype=np.uint8)
    parity = np.asarray(rs.encode(data))
    bad = data.copy()
    # mix: clean rows, 1..16 errors, and junk (beyond t) rows
    nerr = rng.integers(0, 17, B)
    nerr[:8] = 0
    for i in range(B):
        pos = rng.choice(size, nerr[i], replace=False)
        bad[i, pos] ^= rng.integers(1, 256, nerr[i]).astype(np.uint8)
    bad[100:108] = rng.integers(0, 256, (8, size), dtype=np.uint8)

    ok_x, d_x, p_x, c_x = map(np.asarray, rs._decode_plain(bad, parity))
    ok_p, d_p, p_p, c_p = map(np.asarray, dec.decode_plain(bad, parity))
    assert (ok_x == ok_p).all()
    assert (d_x == d_p).all()
    assert (p_x == p_p).all()
    assert (c_x == c_p).all()


def test_rs_pallas_erasure_matches_xla():
    """Erasure path (decode.c:466-473): erasure-locator BM init +
    position-targeted apply, vs the oracle-exact XLA path."""
    rs = RSCodec(RSConfig())
    dec = RSPallasDecoder(rs, lanes=128)
    rng = np.random.default_rng(21)
    B, size, E = 128, 223, 32
    data = rng.integers(0, 256, (B, size), dtype=np.uint8)
    parity = np.asarray(rs.encode(data))
    bad = data.copy()
    pos = np.zeros((B, E), dtype=np.int32)
    cnt = np.zeros((B,), dtype=np.int32)
    for i in range(B):
        c = int(rng.integers(0, E + 1))     # 0..32 erasures per row
        p = np.sort(rng.choice(size, c, replace=False)).astype(np.int32)
        pos[i, :c] = p
        cnt[i] = c
        bad[i, p] ^= rng.integers(1, 256, c).astype(np.uint8)
    # a few rows with extra (non-erased) errors beyond capability
    for i in range(4):
        bad[i, (pos[i, 0] + 5) % size] ^= 0x3C

    ok_x, d_x, p_x, c_x = map(
        np.asarray, rs._decode_erasure(bad, parity, pos, cnt))
    ok_p, d_p, p_p, c_p = map(
        np.asarray, dec.decode_erasure(bad, parity, pos, cnt))
    assert (ok_x == ok_p).all()
    assert (d_x == d_p).all()
    assert (p_x == p_p).all()
    assert (c_x == c_p).all()


def test_rs_pallas_ext_syndrome_matches_xla():
    """External log-form syndromes (decode.c:446-464): the syndrome
    matmul is skipped, sentinel fs = 'no error'."""
    rs = RSCodec(RSConfig())
    dec = RSPallasDecoder(rs, lanes=128)
    rng = np.random.default_rng(22)
    B, size = 128, 223
    data = rng.integers(0, 256, (B, size), dtype=np.uint8)
    parity = np.asarray(rs.encode(data))
    bad = data.copy()
    for i in range(B):
        ne = int(rng.integers(0, 5))
        p = rng.choice(size, ne, replace=False)
        bad[i, p] ^= rng.integers(1, 256, ne).astype(np.uint8)
    # true log-form syndromes of the corrupted words
    s_norm = np.asarray(rs._syndrome(bad, parity))
    exp2log = np.asarray(rs.gf.exp2log).astype(np.int32)
    s_log = exp2log[s_norm]
    # plus 8 rows of the all-clean sentinel
    s_log[:8] = rs.fs
    ok_x, d_x, p_x, c_x = map(
        np.asarray, rs._decode_ext_syndrome(bad, parity, s_log))
    ok_p, d_p, p_p, c_p = map(
        np.asarray, dec.decode_ext(bad, parity, s_log))
    assert (ok_x == ok_p).all()
    assert (d_x == d_p).all()
    assert (p_x == p_p).all()
    assert (c_x == c_p).all()


def test_rs_pallas_shortened_and_ragged():
    rs = RSCodec(RSConfig())
    dec = RSPallasDecoder(rs, lanes=128)
    rng = np.random.default_rng(5)
    B, size = 70, 100                       # shortened code, ragged batch
    data = rng.integers(0, 256, (B, size), dtype=np.uint8)
    parity = np.asarray(rs.encode(data))
    bad = data.copy()
    bad[:, 3] ^= 0x7E
    bad[:, 77] ^= 0x01
    ok_x, d_x, p_x, c_x = map(np.asarray, rs._decode_plain(bad, parity))
    ok_p, d_p, p_p, c_p = map(np.asarray, dec.decode_plain(bad, parity))
    assert (ok_x == ok_p).all() and (d_x == d_p).all()
    assert (p_x == p_p).all() and (c_x == c_p).all()


# ---------------------------------------------------------------- LDPC

from libpoporon_tpu.config import LdpcMatrixType

LDPC_CONFIGS = [
    pytest.param(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2),
                 id="128B-r12-random"),
    pytest.param(LdpcConfig(block_size=64, rate=LdpcRate.RATE_1_3),
                 id="64B-r13-random"),
    pytest.param(LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2,
                            matrix_type=LdpcMatrixType.QC_RANDOM),
                 id="128B-r12-qc"),
    pytest.param(LdpcConfig(block_size=64, rate=LdpcRate.RATE_1_2,
                            column_weight=7),
                 id="64B-r12-cw7"),
]


@pytest.fixture(scope="module", params=LDPC_CONFIGS)
def ldpc_pair(request):
    lc = LDPCCodec(request.param)
    assert lp.BPPallasKernel.supports(lc.structure)
    return lc, lp.BPPallasKernel(lc.structure)


def _hard_inputs(lc, B, rng):
    info = rng.integers(0, 256, (B, lc.info_bytes), dtype=np.uint8)
    par = np.asarray(lc.encode(info))
    cw = np.concatenate([info, par], axis=1)
    nerr = rng.integers(0, 7, B)
    nerr[: B // 8] = 0                       # pre-converged rows
    for i in range(B):
        for pos in rng.choice(lc.codeword_bits, nerr[i], replace=False):
            cw[i, pos // 8] ^= 1 << (7 - pos % 8)
    cw[B // 3 : B // 3 + 8] = rng.integers(       # junk rows
        0, 256, (8, lc.codeword_bytes), dtype=np.uint8)
    return cw


def _assert_hard_equal(lc, kern, cw, MI):
    bits_in = lc._unpack_cw_T(jnp.asarray(cw))
    work = lc.deinterleave_bits_T(bits_in)
    B = work.shape[1]
    work_p = jnp.concatenate([work, jnp.zeros((1, B), work.dtype)], axis=0)
    bits_p8 = work_p.astype(jnp.int8)
    conv0 = lc._syndrome_ok_p(bits_p8)
    llr0 = jnp.where(work == 1, -LLR_INFINITY, LLR_INFINITY).astype(jnp.int16)
    llr0_p = jnp.concatenate(
        [llr0, jnp.full((1, B), LLR_MAX, jnp.int16)], axis=0)

    ok_x, out_x, it_x = map(
        np.asarray, lc._bp_loop(llr0_p, None, bits_p8, conv0, MI))
    ok_p, bits_p, it_p = map(np.asarray, kern.bp(llr0_p, None, MI))
    assert (ok_x == ok_p).all()
    assert (it_x == it_p).all()
    V = lc.codeword_bits
    assert (out_x[:V] == bits_p[:V]).all()
    return np.asarray(ok_p)


def test_bp_pallas_hard_matches_xla(ldpc_pair):
    lc, kern = ldpc_pair
    rng = np.random.default_rng(3)
    cw = _hard_inputs(lc, lp.BLK, rng)
    _assert_hard_equal(lc, kern, cw, MI=9)


def test_bp_pallas_hard_multiblock_and_ragged(ldpc_pair):
    """Multi-block grid (B = 2*BLK) and a ragged batch through the
    padding shim — same bit-exactness contract."""
    lc, kern = ldpc_pair
    rng = np.random.default_rng(5)
    _assert_hard_equal(lc, kern, _hard_inputs(lc, 2 * lp.BLK, rng), MI=5)
    _assert_hard_equal(lc, kern, _hard_inputs(lc, 1000, rng), MI=5)


def test_bp_pallas_budget_exhaustion(ldpc_pair):
    """MI=1 under heavy noise: non-converged lanes must return the
    iteration-1 hard decision (best effort) with ok=False, matching
    the XLA path exactly."""
    lc, kern = ldpc_pair
    rng = np.random.default_rng(6)
    info = rng.integers(0, 256, (lp.BLK, lc.info_bytes), dtype=np.uint8)
    par = np.asarray(lc.encode(info))
    cw = np.concatenate([info, par], axis=1)
    nerr = lc.codeword_bits // 8          # heavy: 12.5% of bits flipped
    for i in range(cw.shape[0]):
        for pos in rng.choice(lc.codeword_bits, nerr, replace=False):
            cw[i, pos // 8] ^= 1 << (7 - pos % 8)
    ok = _assert_hard_equal(lc, kern, cw, MI=1)
    assert not ok.all()                   # the budget really is exhausted


def _soft_pair_inputs(lc, B, rng):
    info = rng.integers(0, 256, (B, lc.info_bytes), dtype=np.uint8)
    par = np.asarray(lc.encode(info))
    cw = np.concatenate([info, par], axis=1)
    cb = bitutils.unpack_np(cw, lc.codeword_bits)
    llr8 = np.where(cb == 1, -90, 90).astype(np.int8)
    llr8 = (llr8 + rng.integers(-60, 61, llr8.shape)).clip(-127, 127)
    return llr8.astype(np.int8)


def _assert_soft_equal(lc, kern, llr8, MI):
    work = jnp.asarray(llr8, jnp.int8).astype(jnp.int32).T
    B = work.shape[1]
    work_p = jnp.concatenate(
        [work, jnp.full((1, B), 125, work.dtype)], axis=0)
    channel = (work_p * 256).astype(jnp.int16)
    llr0 = jnp.clip(work_p * 256, -LLR_MAX, LLR_MAX).astype(jnp.int16)
    bits0 = jnp.zeros_like(work_p, dtype=jnp.int8)
    conv0 = (work[0, :] * 0).astype(bool)

    ok_x, out_x, it_x = map(
        np.asarray, lc._bp_loop(llr0, channel, bits0, conv0, MI))
    ok_p, bits_p, it_p = map(np.asarray, kern.bp(llr0, channel, MI))
    assert (ok_x == ok_p).all()
    assert (it_x == it_p).all()
    V = lc.codeword_bits
    assert (out_x[:V] == bits_p[:V]).all()


def test_bp_pallas_soft_matches_xla(ldpc_pair):
    lc, kern = ldpc_pair
    rng = np.random.default_rng(4)
    _assert_soft_equal(lc, kern, _soft_pair_inputs(lc, lp.BLK, rng), MI=9)


def test_bp_pallas_soft_ragged(ldpc_pair):
    lc, kern = ldpc_pair
    rng = np.random.default_rng(7)
    _assert_soft_equal(lc, kern, _soft_pair_inputs(lc, 300, rng), MI=5)


def test_packed_path_interleaved_matches_xla():
    """Interleaved configs ride the packed kernel entries too (the
    inner deinterleaver folds into the in-kernel unpack mapping):
    decode bodies with use_pallas on vs off must agree bit-exactly,
    hard and soft, including iteration counts."""
    base = dict(block_size=64, rate=LdpcRate.RATE_1_2,
                use_inner_interleave=True, use_outer_interleave=True,
                interleave_depth=0, seed=3)
    lc_on = LDPCCodec(LdpcConfig(use_pallas="on", **base))
    lc_off = LDPCCodec(LdpcConfig(use_pallas="off", **base))
    assert lc_on.pallas_kern is not None and lc_on.inner_inv is not None
    rng = np.random.default_rng(9)
    B = 300
    info = rng.integers(0, 256, (B, lc_on.info_bytes), dtype=np.uint8)
    par = np.asarray(lc_on.encode(info))
    cw = np.concatenate([info, par], axis=1)
    # interleave like the facade does before corrupting
    cw = np.asarray(lc_on.interleave(cw)).copy()
    nerr = rng.integers(0, 6, B)
    for i in range(B):
        for pos in rng.choice(lc_on.codeword_bits, nerr[i], replace=False):
            cw[i, pos // 8] ^= 1 << (7 - pos % 8)
    ok_p, out_p, it_p = map(np.asarray, lc_on._decode_hard(cw, 9))
    ok_x, out_x, it_x = map(np.asarray, lc_off._decode_hard(cw, 9))
    assert (ok_p == ok_x).all()
    assert (out_p == out_x).all()
    assert (it_p == it_x).all()
    # soft: channel LLRs in the INTERLEAVED domain (decode.c:509 path)
    from libpoporon_tpu.utils import bits as bitutils
    cb = bitutils.unpack_np(cw, lc_on.codeword_bits)
    llr8 = np.where(cb == 1, -80, 80).astype(np.int8)
    llr8 = (llr8 + rng.integers(-70, 71, llr8.shape)).clip(-127, 127)
    llr8 = llr8.astype(np.int8)
    ok_p, out_p, it_p = map(np.asarray, lc_on._decode_soft(llr8, 9))
    ok_x, out_x, it_x = map(np.asarray, lc_off._decode_soft(llr8, 9))
    assert (ok_p == ok_x).all()
    assert (out_p == out_x).all()
    assert (it_p == it_x).all()


def test_facade_use_pallas_knob():
    """Config-level wiring: use_pallas='on' routes LDPCCodec decode
    bodies through the fused kernel (interpret mode off-TPU) and the
    results match use_pallas='off' exactly."""
    cfg_on = LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2,
                        use_pallas="on")
    cfg_off = LdpcConfig(block_size=128, rate=LdpcRate.RATE_1_2,
                         use_pallas="off")
    lc_on = LDPCCodec(cfg_on)
    lc_off = LDPCCodec(cfg_off)
    assert lc_on.pallas_kern is not None
    assert lc_off.pallas_kern is None
    rng = np.random.default_rng(21)
    B = 32
    info = rng.integers(0, 256, (B, lc_on.info_bytes), dtype=np.uint8)
    par = np.asarray(lc_on.encode(info))
    cw = np.concatenate([info, par], axis=1)
    cw[0, 3] ^= 0x10
    cw[5, 7] ^= 0x81
    a = tuple(map(np.asarray, lc_on.decode_hard(cw, 2)))
    b = tuple(map(np.asarray, lc_off.decode_hard(cw, 2)))
    for x, y in zip(a, b):
        assert (x == y).all()


def test_facade_rs_use_pallas_knob():
    """RSConfig.use_pallas='on' routes the plain decode path through
    the fused RS kernel; results match the XLA path exactly."""
    from libpoporon_tpu.models.rs import RSCodec as _RS
    rs_on = _RS(RSConfig(use_pallas="on"))
    rs_off = _RS(RSConfig(use_pallas="off"))
    assert rs_on.pallas_dec is not None
    assert rs_off.pallas_dec is None
    rng = np.random.default_rng(22)
    B = 16
    data = rng.integers(0, 256, (B, 223), dtype=np.uint8)
    parity = np.asarray(rs_off.encode(data))
    bad = data.copy()
    bad[:, 9] ^= 0x42
    a = tuple(map(np.asarray, rs_on.decode(bad, parity)))
    b = tuple(map(np.asarray, rs_off.decode(bad, parity)))
    for x, y in zip(a, b):
        assert (x == y).all()
