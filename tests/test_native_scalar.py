"""Differential coverage of the portable scalar fallbacks.

The native hot kernels carry hand-written AVX-512 paths with scalar
``#else`` branches that never compile on this CI host (it has AVX-512) —
so the fallbacks non-AVX hosts depend on could bit-rot unnoticed. These
tests build the SAME sources with ``-DMP3STEGO_FORCE_SCALAR`` (which turns
every vector gate off) into a temporary .so and require identical outputs:

* f64/i16 decode plane (bit-exact float contract),
* encode analysis plane (exact Q31 integers),
* whole-file rate search (the encode engine's search trajectory).
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from mp3stego_tpu import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native toolchain unavailable")

FIX = "/root/reference/tests/test.mp3"


@pytest.fixture(scope="module")
def scalar_lib(tmp_path_factory):
    so = str(tmp_path_factory.mktemp("scalar") / "libscalar.so")
    cmd = ["g++", *native._CXXFLAGS, "-DMP3STEGO_FORCE_SCALAR",
           *native._SRCS, "-o", so]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    lib = ctypes.CDLL(so)
    native._bind(lib)
    return lib


@pytest.fixture(scope="module")
def parsed():
    from mp3stego_tpu.bitstream import decoder_host as dh
    if not os.path.exists(FIX):
        pytest.skip("reference fixture unavailable")
    with open(FIX, "rb") as f:
        return dh.parse_mp3(f.read(), 0)


def test_scalar_decode_plane_i16_identical(scalar_lib, parsed):
    from mp3stego_tpu.ops import decode_plane as dp
    lib, args = dp._native_plane_args(parsed)
    ch = parsed.header.channels
    a = np.empty((2 * parsed.num_frames * 576, ch), np.int16)
    b = np.empty_like(a)
    for wrap in (0, 1):   # saturating default AND the reference wrap mode
        lib.decode_plane_i16(*args, a, ch, wrap)
        scalar_lib.decode_plane_i16(*args, b, ch, wrap)
        assert np.array_equal(a, b), f"wrap={wrap}"


def test_scalar_decode_plane_f64_identical(scalar_lib, parsed):
    from mp3stego_tpu.ops import decode_plane as dp
    lib, args = dp._native_plane_args(parsed)
    a = np.empty((2, 2 * parsed.num_frames, 576), np.float64)
    b = np.empty_like(a)
    lib.decode_plane_f64(*args, a)
    scalar_lib.decode_plane_f64(*args, b)
    # byte equality, not allclose: the scalar and vector paths must make
    # the identical sequence of roundings
    assert a.tobytes() == b.tobytes()


def test_scalar_encode_analysis_identical(scalar_lib):
    from mp3stego_tpu.ops import encode_plane
    lib = native.get_lib()
    rng = np.random.default_rng(11)
    tg = 40
    full = np.ascontiguousarray(
        (rng.standard_normal((2, 480 + tg * 576)) * 9000).astype(np.int16))
    tabs = encode_plane._analysis_tables()
    a = np.empty((2, tg, 576), np.int32)
    b = np.empty_like(a)
    assert lib.encode_analysis(full, 2, tg, *tabs, a) == 0
    assert scalar_lib.encode_analysis(full, 2, tg, *tabs, b) == 0
    assert np.array_equal(a, b)


def test_scalar_rate_search_identical(scalar_lib):
    from mp3stego_tpu.models.encoder import (_init_rate_tables,
                                             _native_rate_lib)
    lib = _native_rate_lib()
    if lib is None:
        pytest.skip("rate search twin unavailable")
    assert _init_rate_tables(scalar_lib)
    rng = np.random.default_rng(12)
    nch, tg, gpf = 2, 24, 2
    lanes = nch * tg
    xr = np.ascontiguousarray(
        (rng.standard_normal((lanes, 576)) * 2e8).astype(np.int32))
    maxb = np.full(lanes, 2500, np.int32)
    hide = np.frombuffer(b"10110100111000101101", np.uint8).copy()

    def run(engine):
        raw = np.zeros((lanes, 12), np.int64)
        ix = np.zeros((lanes, 576), np.int32)
        en_tot = np.zeros(lanes, np.int32)
        en21 = np.zeros((lanes, 21), np.int32)
        cur = engine.rate_search_file(
            xr, maxb, nch, tg, gpf, 0, hide, len(hide), 0,
            raw, ix, en_tot, en21,
            np.zeros(2 * 2 * 12, np.int64),
            np.zeros(2 * 2 * 576, np.int32), 0)
        return cur, raw, ix, en_tot, en21

    ca, ra, ia, ta, ea = run(lib)
    cb, rb, ib, tb, eb = run(scalar_lib)
    assert ca == cb
    assert np.array_equal(ra, rb)
    assert np.array_equal(ia, ib)
    assert np.array_equal(ta, tb)
    assert np.array_equal(ea, eb)
