"""Property/unit tests for the bit I/O, fixed-point primitives, rate-control
vector ops, and the steganographic table maps."""

import numpy as np
import pytest

from mp3stego_tpu import tables as T
from mp3stego_tpu.bitstream.bits import BitReader, BitWriter
from mp3stego_tpu.ops import fixedpoint as fx
from mp3stego_tpu.ops import quant as Q


# ----------------------------------------------------------------------- bit io

def test_bitwriter_reader_roundtrip():
    rng = np.random.default_rng(0)
    fields = [(int(rng.integers(0, 1 << n)), n)
              for n in rng.integers(1, 32, size=200)]
    bw = BitWriter(16)
    for v, n in fields:
        bw.put(v, int(n))
    total = sum(n for _, n in fields)
    bw.put(0, (32 - total % 32) % 32)  # flush cache to byte buffer
    data = bw.take_frame()
    br = BitReader(data)
    for v, n in fields:
        assert br.read(int(n)) == v


def test_bitwriter_cache_carry():
    """Cache bits must survive take_frame (per-frame chunking semantics)."""
    bw = BitWriter(16)
    bw.put(0b101, 3)
    assert bw.take_frame() == b""          # nothing flushed yet
    bw.put(0xFFFFFFFF, 32)                 # forces one word out
    out = bw.take_frame()
    assert out == bytes([0b10111111, 0xFF, 0xFF, 0xFF])
    # 3 bits of the 32-bit put remain in the cache; position reset by take_frame
    assert bw.bits_count() == 3


# ------------------------------------------------------------------ fixed point

def test_fixed_point_vs_scalar_reference():
    rng = np.random.default_rng(1)
    a = rng.integers(-2**31, 2**31, size=1000).astype(np.int64)
    b = rng.integers(-2**31, 2**31, size=1000).astype(np.int64)

    def wrap32(v):
        return ((v + 2**31) % 2**32) - 2**31

    np.testing.assert_array_equal(
        fx.mul(a, b), [wrap32((x * y) >> 32) for x, y in zip(a, b)])
    np.testing.assert_array_equal(
        fx.mulr(a, b), [wrap32((x * y + 2**31) >> 32) for x, y in zip(a, b)])
    np.testing.assert_array_equal(
        fx.mulsr(a, b), [wrap32((x * y + 2**30) >> 31) for x, y in zip(a, b)])


# ------------------------------------------------------------------ rate control

def _calc_run_len_naive(ix):
    """Literal transcription of the reference loop (MP3_Encoder.py:266-291)."""
    i = 576
    while i > 1:
        if ix[i - 1] == 0 and ix[i - 2] == 0:
            i -= 2
        else:
            break
    count1 = 0
    while i > 3:
        if ix[i - 1] <= 1 and ix[i - 2] <= 1 and ix[i - 3] <= 1 and ix[i - 4] <= 1:
            count1 += 1
            i -= 4
        else:
            break
    return i >> 1, count1


@pytest.mark.parametrize("seed", range(8))
def test_calc_run_len_matches_naive(seed):
    rng = np.random.default_rng(seed)
    ix = np.zeros(576, dtype=np.int32)
    n_active = int(rng.integers(0, 576))
    ix[:n_active] = rng.integers(0, 4, size=n_active)
    info = Q.GrInfo()
    Q.calc_run_len(ix, info)
    big, c1 = _calc_run_len_naive(ix)
    assert (info.big_values, info.count1) == (big, c1)


def _count_bit_naive(ix, start, end, table):
    if table == 0:
        return 0
    ylen = 16
    s = 0
    for i in range(start, end, 2):
        x, y = int(ix[i]), int(ix[i + 1])
        if table > 15:
            if x > 14:
                x = 15
                s += int(T.HUFF_LINBITS[table])
            if y > 14:
                y = 15
                s += int(T.HUFF_LINBITS[table])
        s += int(T.HUFF_LEN.reshape(34, 256)[table][x * ylen + y])
        if x:
            s += 1
        if y:
            s += 1
    return s


@pytest.mark.parametrize("table", [1, 2, 3, 5, 7, 10, 13, 15, 16, 20, 24, 30])
def test_count_bit_matches_naive(table):
    rng = np.random.default_rng(table)
    hi = 16 if table <= 15 else 200
    ix = rng.integers(0, hi, size=576).astype(np.int32)
    ix = np.minimum(ix, int(T.HUFF_XLEN[table]) - 1 if table <= 15 else ix)
    assert Q.count_bit(ix, 0, 576, table) == _count_bit_naive(ix, 0, 576, table)


def test_quantize_known_values():
    """step far too small -> early bail; huge step -> all-zero spectrum."""
    xr = np.arange(-288, 288, dtype=np.int32) * (1 << 21)
    xrabs = np.abs(xr)
    xrmax = int(xrabs.max())
    # valid step domain is [-127, 0] (steptab index = step + 127)
    ix, ixmax = Q.quantize(xr, xrabs, xrmax, -120)
    assert ix is None and ixmax == 16384          # early bail, ix left stale
    small = np.arange(-288, 288, dtype=np.int32) * 1000
    ix, ixmax = Q.quantize(small, np.abs(small), int(np.abs(small).max()), 0)
    assert ixmax == 0 and not ix.any()            # step 0 crushes small spectra


# -------------------------------------------------------------------- stego maps

def test_transform_huf_inverse_consistent():
    """Every (t,0) image lands in H0 and every (t,1) lands outside it, so
    embed(extract) is the identity (decoder/util.py:3 vs MP3_Encoder.py:419-449)."""
    used = [t for t in range(1, 32) if t not in (4, 14)]
    for t in used:
        assert int(T.TRANSFORM_HUF[t, 0]) in T.H0
        assert int(T.TRANSFORM_HUF[t, 1]) not in T.H0


def test_huffman_tables_decode_encode_duals():
    """Left-aligned decode LUT must invert the encoder codeword tables."""
    for book in (1, 2, 3, 13, 15, 16, 24):
        lut = T.dec_lut(book)
        n = int(T.DEC_MAXVAL[book])
        for x in range(n):
            for y in range(n):
                ln = int(T.HUFF_LEN[book, x, y])
                if ln == 0 and not (x == y == 0):
                    continue
                code = int(T.HUFF_CODE[book, x, y])
                idx = code << (T.LUT_BITS - ln)
                packed = int(lut[idx])
                assert packed & 31 == ln
                assert packed >> 9 == x
                assert (packed >> 5) & 15 == y


# ------------------------------------------------------------------ fuzz parity

def test_fuzz_native_matches_python_on_corrupt_streams():
    """The C++ parser and the python oracle must agree (and stay memory-safe)
    on corrupted/truncated streams: bit flips, truncations, junk blocks."""
    from mp3stego_tpu import native
    from mp3stego_tpu.bitstream import decoder_host as dh
    if not native.available():
        pytest.skip("native library unavailable")
    with open("/root/reference/tests/test.mp3", "rb") as f:
        data = bytearray(f.read())
    rng = np.random.default_rng(20260816)
    for trial in range(120):
        buf = bytearray(data)
        kind = trial % 3
        if kind == 0:
            for _ in range(rng.integers(1, 30)):
                i = int(rng.integers(0, len(buf)))
                buf[i] ^= 1 << int(rng.integers(0, 8))
        elif kind == 1:
            buf = buf[:int(rng.integers(4, len(buf)))]
        else:
            i = int(rng.integers(0, len(buf) - 64))
            buf[i:i + 64] = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
        b = bytes(buf)
        p_py = dh.parse_mp3(b, 0, backend="python")
        p_nat = dh.parse_mp3(b, 0, backend="native")
        if p_nat is None:
            continue
        assert p_py.num_frames == p_nat.num_frames, f"trial {trial}"
        if p_py.num_frames:
            for f_ in ("raw_samples", "table_select", "scale_fac_l",
                       "global_gain", "frame_sizes"):
                np.testing.assert_array_equal(
                    getattr(p_py, f_), getattr(p_nat, f_),
                    err_msg=f"trial {trial} field {f_}")
            assert p_py.duplicate_last_pcm == p_nat.duplicate_last_pcm


def test_native_raw_pack_matches_numpy_oracle(fixture_mp3):
    """raw_pack.cpp (fused int8 plane + exception pack) vs the NumPy pack in
    host_prepare. Exception order is t-major in C++ vs ch-major in NumPy —
    downstream is an unordered scatter, so compare sorted."""
    from mp3stego_tpu import native
    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    with open(fixture_mp3, "rb") as f:
        data = f.read()
    parsed = dh.parse_mp3(data, 0)
    # inject linbits-scale magnitudes so the exception path is exercised
    parsed.raw_samples[3, 1, 0, 17] = 2081
    parsed.raw_samples[5, 0, 1, 530] = -8206
    parsed.raw_samples[5, 0, 1, 531] = -128   # int8 boundary: NOT an exception
    parsed.raw_samples[7, 1, 1, 0] = 128      # just past the boundary: is one
    a = dp.host_prepare(parsed, native_pack=True)
    b = dp.host_prepare(parsed, native_pack=False)
    np.testing.assert_array_equal(a["raw_i8"], b["raw_i8"])
    assert len(a["exc_t"]) == len(b["exc_t"]) >= 3
    ka = np.lexsort((a["exc_s"], a["exc_t"], a["exc_ch"]))
    kb = np.lexsort((b["exc_s"], b["exc_t"], b["exc_ch"]))
    for k in ("exc_t", "exc_ch", "exc_s", "exc_val"):
        np.testing.assert_array_equal(a[k][ka], b[k][kb], err_msg=k)


def test_native_rate_search_matches_numpy(monkeypatch):
    """The C++ rate-search twin (native/src/rate_search.cpp) must replay the
    NumPy search bit-for-bit: same final GrInfo state, same ix tensor, same
    returned bits — across random spectra, states, steps, and hide bits."""
    from mp3stego_tpu.models import encoder as E
    from mp3stego_tpu.ops import quant as Q
    if E._native_rate_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    hide = rng.integers(0, 2, 64).astype(np.uint8)
    hide_str = "".join(str(int(b)) for b in hide)

    class Host:
        """Minimal stand-in exposing the attributes the search methods use."""
        _eval = E.MP3Encoder._eval
        _big_v_tab_select = E.MP3Encoder._big_v_tab_select
        _choose = E.MP3Encoder._choose
        _rate_native_call = E.MP3Encoder._rate_native_call

        def __init__(self, use_native):
            self.samplerate_index = 0
            self.band_row = 0
            self.hide_str = hide_str
            self.hide_str_offset = 3
            self._hide_u8 = hide
            self.l3_enc = np.zeros((1, 1, 576), np.int32)
            self._use_native = use_native

    for trial in range(24):
        mag = [40, 400, 40000, 4000000][trial % 4]
        xr = rng.integers(-mag, mag, 576).astype(np.int32)
        xr[rng.random(576) < 0.5] = 0
        xrabs = np.abs(xr)
        xrmax = int(max(0, xrabs.max()))
        if xrmax == 0:
            continue
        outs = []
        for use_native in (False, True):
            monkeypatch.setenv("MP3STEGO_TPU_NATIVE_RATE",
                               "1" if use_native else "0")
            h = Host(use_native)
            ci = Q.GrInfo()
            ci.address1, ci.address2, ci.address3 = 14, 22, 30  # stale seeds
            step = E.MP3Encoder._bin_search_step_size(
                h, 700 + trial * 37, xr, xrabs, xrmax, 0, 0, ci)
            ci.quantizerStepSize = step
            bits = E.MP3Encoder._inner_loop(
                h, xr, xrabs, xrmax, 700 + trial * 37, 0, 0, ci)
            ev = E.MP3Encoder._exact_eval(
                h, ci.quantizerStepSize, xr, xrabs, xrmax, 0, 0, ci)
            outs.append((step, bits, ev, ci.quantizerStepSize,
                         ci.big_values, ci.count1, ci.count1table_select,
                         ci.address1, ci.address2, ci.address3,
                         ci.region0_count, ci.region1_count,
                         tuple(ci.table_select), h.l3_enc.copy()))
        a, b = outs
        assert a[:-1] == b[:-1], f"trial {trial}: {a[:-1]} != {b[:-1]}"
        np.testing.assert_array_equal(a[-1], b[-1], err_msg=f"trial {trial}")
