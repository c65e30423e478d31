"""Mixed-block (block_type 2 + mixed_block_flag) decode validated against
libmpg123 AND libavcodec on hand-crafted streams (tests/craft_mp3.py — no
available encoder emits mixed blocks).

The reference decoder has no correct mixed path at all: its requantize walk
runs the long sfb counter into the short-width table (Frame.py:186) — that
behavior is preserved behind MP3STEGO_TPU_REF_MIXED=1; the default decode is
the ecosystem geometry measured here.

Geometry (pinned by the impulse test below; decode_plane._mix_geometry):
  * requantize/reorder boundary S = the long-scalefactor-band region
    (bands 0..7 MPEG-1 / 0..5 LSF) = 36 samples everywhere EXCEPT 8 kHz,
    where it is 72;
  * the hybrid stage long-windows exactly 2 subbands with 1 alias
    butterfly at EVERY samplerate (mpg123 and ffmpeg both hard-code this);
  * at 8 kHz the middle region (samples 36..71) is therefore long-walk,
    UNREORDERED spectrum under short windows: mpg123's dct12 reads it with
    stride 3 — in this plane's window-major layout, a per-18-chunk
    transpose. An earlier revision long-windowed all 72 samples (K=S/18=4)
    and measured 2.6 dB vs both oracles; the strided-read geometry measures
    ~121 dB vs float avcodec and sits exactly at the mpg123<->avcodec
    mutual-agreement level (~71 dB, int16-bound) vs mpg123.

Comparisons vs the int16 mpg123 oracle use NON-CLIPPING gains (see
tests/test_intensity.py header for why); float avcodec pins ~115-124 dB.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from craft_mp3 import Granule, build_stream, build_stream_lsf, lsf_sfc  # noqa: E402
from interop_codecs import (avcodec_decode, have_avcodec,  # noqa: E402
                            have_mpg123, mpg123_decode, snr_db)

from mp3stego_tpu import native  # noqa: E402
from mp3stego_tpu.bitstream import decoder_host as dh  # noqa: E402
from mp3stego_tpu.ops import decode_plane as dp  # noqa: E402

pytestmark = pytest.mark.skipif(not have_mpg123(),
                                reason="system libmpg123 not available")

GG = 186  # non-clipping gain: 2^-6

_rng = np.random.default_rng(7)


def _vals(n=120, amp=6):
    v = _rng.integers(-amp, amp + 1, size=n)
    return list(v if len(v) % 2 == 0 else v[:-1])


def _mixed_m1(sr=44100, sfl=(0,) * 8, sfs=None, sfc=0, **kw):
    sfs = np.zeros((3, 12), np.int32) if sfs is None else np.asarray(sfs)
    g = lambda: Granule(values=_vals(), global_gain=GG, mixed=True,  # noqa: E731
                        scalefac_long=list(sfl), scalefac=sfs,
                        scalefac_compress=sfc, table=1, **kw)
    return build_stream([[(g(), g()), (g(), g())] for _ in range(4)],
                        samplerate=sr, mode=0, mode_ext=0)


def _mixed_lsf(sr, sfl=(0,) * 6, sfs=None, sfc=0, frames=6, **kw):
    sfs = np.zeros((3, 12), np.int32) if sfs is None else np.asarray(sfs)
    g = lambda: Granule(values=_vals(), global_gain=GG, lsf=True,  # noqa: E731
                        mixed=True, scalefac_long=list(sfl), scalefac=sfs,
                        scalefac_compress=sfc, table=1, **kw)
    return build_stream_lsf([(g(), g()) for _ in range(frames)],
                            bitrate=16 if sr in (8000, 11025, 12000) else 48,
                            samplerate=sr, mode=0, mode_ext=0)


def _our_pcm(mp3):
    p = dh.parse_mp3(mp3, 0)
    pcm = np.asarray(dp.decode_pcm(p, "float64"))
    assert np.abs(pcm).max() < 1.0, "crafted stream clips; lower the gain"
    return pcm


def _check(mp3, mpg_floor=55.0, av_floor=105.0):
    ours = _our_pcm(mp3)
    ref, _ = mpg123_decode(mp3)
    oi = np.clip(ours * 32767, -32768, 32767).astype(np.int16)
    n = min(len(ref), len(oi))
    s = snr_db(ref[:n].ravel(), oi[:n].ravel())
    assert s > mpg_floor, f"vs mpg123: {s:.1f} dB"
    if have_avcodec():
        av, _ = avcodec_decode(mp3)
        m = min(len(av), len(ours))
        sa = snr_db(np.asarray(av)[:m].ravel(), ours[:m].ravel())
        assert sa > av_floor, f"vs avcodec: {sa:.1f} dB"
        # the int16 mpg123 comparison must sit AT the oracles' own
        # mutual-agreement level (the int16 quantization floor), not
        # merely above a fixed bar
        avi = np.clip(np.asarray(av) * 32767, -32768, 32767).astype(np.int16)
        k = min(len(ref), len(avi))
        mutual = snr_db(ref[:k].ravel().astype(np.float64),
                        avi[:k].ravel().astype(np.float64))
        assert s >= mutual - 1.0, \
            f"vs mpg123 {s:.1f} dB below the mpg123<->avcodec floor {mutual:.1f} dB"


# ------------------------------------------------------------- MPEG-1

def test_mpeg1_mixed_all_rates():
    for sr in (44100, 48000, 32000):
        _check(_mixed_m1(sr))


def test_mpeg1_mixed_scalefactors():
    """Long prefix bands 0..7 + short bands 3.. carry distinct scalefactors
    through the mixed walk (slen1 covers long 0..7 and short 3..5)."""
    sfs = np.zeros((3, 12), np.int32)
    sfs[:, 3:8] = _rng.integers(0, 6, size=(3, 5))
    _check(_mixed_m1(sfl=(1, 2, 3, 4, 5, 6, 7, 1), sfs=sfs, sfc=15))
    _check(_mixed_m1(sfl=(1, 2, 3, 4, 5, 6, 7, 1), sfs=sfs, sfc=15,
                     scale_fac_scale=1, sub_block_gain=(1, 2, 3)))


# ------------------------------------------------------------- LSF

def test_lsf_mixed_rates():
    for sr in (22050, 16000, 11025):
        _check(_mixed_lsf(sr))


def test_lsf_8k_short_control():
    """Pure-short 8 kHz granules (no mixed flag) stay at oracle level —
    isolates the mixed-geometry paths from the short-block baseline."""
    g = lambda: Granule(values=_vals(), global_gain=GG, lsf=True,  # noqa: E731
                        short=True, table=1)
    mp3 = build_stream_lsf([(g(), g()) for _ in range(6)],
                           bitrate=16, samplerate=8000, mode=0, mode_ext=0)
    _check(mp3)


def test_lsf_8k_mixed_geometry():
    """The 8 kHz special case: 72-sample walk boundary, 2 long-window
    subbands, strided short-window read of the unreordered middle."""
    _check(_mixed_lsf(8000))


def test_lsf_8k_mixed_scalefactor_walk():
    """The 72-sample exponent boundary: long bands 0..5 cover samples
    0..71; short bands from band 3 cover 72.. — with sfscale and
    sub-block-gain variants."""
    sfs = np.zeros((3, 12), np.int32)
    sfs[:, 3:8] = _rng.integers(0, 6, size=(3, 5))
    sfc = lsf_sfc(3, 3, 3, 3)
    _check(_mixed_lsf(8000, sfl=(1, 2, 3, 4, 5, 6), sfs=sfs, sfc=sfc))
    _check(_mixed_lsf(8000, sfl=(1, 2, 3, 4, 5, 6), sfs=sfs, sfc=sfc,
                      scale_fac_scale=1))
    _check(_mixed_lsf(8000, sfl=(1, 2, 3, 4, 5, 6), sfs=sfs, sfc=sfc,
                      sub_block_gain=(1, 2, 3)))


@pytest.mark.skipif(not have_avcodec(), reason="libavcodec not available")
def test_lsf_8k_mixed_impulse_geometry():
    """Per-sample geometry pin: impulses across the 8 kHz middle region
    (samples 30..77) decode sample-for-sample like float avcodec — the
    probe that uncovered the strided-read behavior."""
    frames = []
    positions = list(range(30, 78, 3))
    mk = lambda v: Granule(values=v, global_gain=210, lsf=True,  # noqa: E731
                           mixed=True, scalefac_long=[0] * 6,
                           scalefac=np.zeros((3, 12), np.int32), table=1)
    for p in positions:
        vals = [0] * (((p // 2) + 1) * 2)
        vals[p] = 1
        frames.append((mk(vals), mk([])))
        frames.append((mk([]), mk([])))  # spacer: responses don't overlap
    mp3 = build_stream_lsf(frames, bitrate=16, samplerate=8000,
                           mode=0, mode_ext=0)
    p = dh.parse_mp3(mp3, 0)
    ours = np.asarray(dp.decode_pcm(p, "float64"))
    av, _ = avcodec_decode(mp3)
    n = min(len(av), len(ours))
    s = snr_db(np.asarray(av)[:n, 0].astype(np.float64), ours[:n, 0])
    assert s > 100, f"impulse geometry diverges from avcodec: {s:.1f} dB"


# ------------------------------------------------------- intensity + mixed

_ISP_S = np.tile(np.array([0, 1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4]), (3, 1))


def _is_mixed_m1(mode_ext=1, right_vals=()):
    gl = lambda: Granule(values=_vals(), global_gain=GG, mixed=True,  # noqa: E731
                         scalefac_long=[0] * 8,
                         scalefac=np.zeros((3, 12), np.int32), table=1)
    gR = lambda: Granule(values=list(right_vals), scalefac=_ISP_S,  # noqa: E731
                         scalefac_long=[0, 1, 2, 3, 4, 5, 6, 0],
                         scalefac_compress=15, mixed=True,
                         global_gain=GG - 6 if len(right_vals) else 210)
    return build_stream([[(gl(), gR()), (gl(), gR())] for _ in range(4)],
                        mode=1, mode_ext=mode_ext)


def test_is_mixed_mpeg1():
    """Intensity + mixed granules: long-prefix positions on row 3, short
    positions per window, both active when the right channel is empty."""
    _check(_is_mixed_m1(mode_ext=1))
    _check(_is_mixed_m1(mode_ext=3))  # sqrt(2)-scaled tables


def test_is_mixed_partial_right():
    """Right-channel content in the long region blocks long-band IS (the
    bound is the whole spectrum's last content); short windows above stay
    intensity-processed."""
    _check(_is_mixed_m1(mode_ext=1, right_vals=_vals(40, 3)))


def test_is_mixed_lsf():
    """LSF intensity + mixed. libmpg123 and libavcodec genuinely DISAGREE
    with each other here (mutual agreement 14-23 dB on these streams);
    this framework matches the float avcodec oracle at ~122 dB, and the
    _check mutual-floor assert documents that mpg123 is the outlier."""
    from craft_mp3 import lsf_sfc_is
    gl = lambda: Granule(values=_vals(), global_gain=GG, lsf=True,  # noqa: E731
                         mixed=True, scalefac_long=[0] * 6,
                         scalefac=np.zeros((3, 12), np.int32), table=1)
    gR = lambda: Granule(values=[], lsf=True, i_stereo=True, mixed=True,  # noqa: E731
                         scalefac=_ISP_S, scalefac_long=[0, 1, 2, 3, 4, 5],
                         scalefac_compress=lsf_sfc_is(3, 3, 3))
    for sr in (22050, 8000):
        mp3 = build_stream_lsf([(gl(), gR()) for _ in range(6)],
                               bitrate=16 if sr == 8000 else 48,
                               samplerate=sr, mode=1, mode_ext=1)
        _check(mp3, mpg_floor=10.0)


# ------------------------------------------------------------- engines

def test_mixed_engines_agree():
    """NumPy oracle and the fused C++ f64 plane are float-for-float equal
    on mixed streams (incl. the 8 kHz strided middle); the jitted f64
    plane stays within FMA-contraction distance."""
    streams = [_mixed_m1(), _mixed_lsf(22050), _mixed_lsf(8000),
               _is_mixed_m1(mode_ext=1)]
    for mp3 in streams:
        p = dh.parse_mp3(mp3, 0)
        prep = dp.host_prepare(p)
        assert (prep["mode"] == 3).any(), "stream must contain mixed granules"
        oracle = dp.decode_granules_np(prep)
        if native.available():
            nat = dp.decode_granules_f64_native(p)
            assert np.array_equal(oracle, nat)
        dev = np.asarray(dp._decode_call(prep, "float64"))
        np.testing.assert_allclose(dev, oracle, rtol=1e-11, atol=1e-12)
