"""Intensity-stereo decode — MPEG-1 AND MPEG-2/2.5 (LSF) — validated against
libmpg123 and libavcodec on hand-crafted streams (tests/craft_mp3.py — no
available encoder emits intensity stereo).

The reference decoder ignores the intensity mode_ext bit entirely (its
FrameHeader parses it, Frame.py never reads it): IS streams decode with a
silent/wrong right channel. This framework decodes intensity stereo in every
engine:

  * MPEG-1 (ISO 11172-3 2.4.3.4.9.3): tan(p*pi/12) ratio tables, p=0..6,
    7 = illegal; sqrt(2)-scaled when the granule is also MS (mode_ext=3).
  * LSF (ISO 13818-3): pow-ratio tables selected by intensity_scale
    (scalefac_compress & 1), is_pos up to 15, the right channel's
    scalefactors read through the dedicated IS partition classes.

The LSF "illegal position" rule splits the ecosystem three ways (all
measured here): ISO says pos == (1<<slen)-1 for the band's slen group;
libmpg123 tests the constant 7 regardless of slen; libavcodec never marks a
position illegal (sf_max=16). This framework implements all three —
MP3STEGO_TPU_LSF_IS_ILLEGAL in {iso (default), mpg123, ffmpeg} — and each
convention is pinned against its decoder below.

Comparisons against the int16 mpg123 oracle use NON-CLIPPING gains: two
saturating decoders "agree" at the rails no matter what they decoded, which
once masked both a builder truncation bug and the LSF coefficient behavior
in this very suite. The float avcodec oracle is immune (unclipped output)
and pins the same streams near 124 dB.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from craft_mp3 import (Granule, build_stream, build_stream_lsf,  # noqa: E402
                       lsf_sfc, lsf_sfc_is)
from interop_codecs import (avcodec_decode, have_avcodec,  # noqa: E402
                            have_mpg123, mpg123_decode, snr_db)

from mp3stego_tpu.bitstream import decoder_host as dh  # noqa: E402
from mp3stego_tpu.ops import decode_plane as dp  # noqa: E402

pytestmark = pytest.mark.skipif(not have_mpg123(),
                                reason="system libmpg123 not available")

# non-clipping crafted gain (2^((186-210)/4) = 2^-6): float peaks stay well
# under 1.0 so the int16-domain mpg123 comparison measures content, not rails
GG = 186
VALS = [1, -1] * 40
ISP = [0, 1, 2, 3, 4, 5, 6] * 3


def _gl(**kw):
    return Granule(values=VALS, global_gain=GG, **kw)


def _stream(right_fn, mode_ext, frames=4, left_fn=_gl):
    fr = [[(left_fn(), right_fn()), (left_fn(), right_fn())]
          for _ in range(frames)]
    return build_stream(fr, mode=1, mode_ext=mode_ext)


def _our_pcm(mp3):
    """decode_pcm float64 (n, ch), asserting the crafted content does not
    clip (a clipped stream would let the int16 comparison pass on rails)."""
    p = dh.parse_mp3(mp3, 0)
    pcm = np.asarray(dp.decode_pcm(p, "float64"))
    assert np.abs(pcm).max() < 1.0, "crafted stream clips; lower the gain"
    return pcm


def _snr_vs_mpg123(mp3):
    ref, _ = mpg123_decode(mp3)
    ours = np.clip(_our_pcm(mp3) * 32767, -32768, 32767).astype(np.int16)
    n = min(len(ref), len(ours))
    return snr_db(ref[:n].ravel(), ours[:n].ravel())


def _snr_vs_av(mp3):
    """Float-domain SNR vs the unclipped libavcodec oracle."""
    ref, _ = avcodec_decode(mp3)
    ours = _our_pcm(mp3)
    n = min(len(ref), len(ours))
    a = ref[:n].ravel().astype(np.float64)
    b = ours[:n].ravel()
    return 10 * np.log10(max((a ** 2).mean(), 1e-20)
                         / max(((a - b) ** 2).mean(), 1e-20))


def _check(mp3, mpg_floor=65.0, av_floor=100.0):
    s = _snr_vs_mpg123(mp3)
    assert s > mpg_floor, f"vs mpg123: {s:.1f} dB"
    if have_avcodec():
        s = _snr_vs_av(mp3)
        assert s > av_floor, f"vs avcodec: {s:.1f} dB"


# ------------------------------------------------------------- MPEG-1

def test_is_only_long_blocks():
    gR = lambda: Granule(values=[], scalefac=ISP, scalefac_compress=15)
    _check(_stream(gR, mode_ext=1))


def test_ms_plus_is_sqrt2_tables():
    """mode_ext=3: the coefficient pair is scaled by sqrt(2) and applied to
    the post-MS left channel (mpg123's tan*_2 tables)."""
    gR = lambda: Granule(values=[], scalefac=ISP, scalefac_compress=15)
    _check(_stream(gR, mode_ext=3))


def test_is_bound_partial_right():
    """Bands holding right-channel content stay on the MS/LR path; only the
    zero tail is intensity-processed."""
    gR = lambda: Granule(values=[1, -1] * 15, scalefac=ISP,
                         scalefac_compress=15, global_gain=GG - 6)
    _check(_stream(gR, mode_ext=1))
    _check(_stream(gR, mode_ext=3))


def test_is_pos7_escape():
    """is_pos == 7 marks a band 'illegal': it stays on the MS/LR path."""
    isp7 = [7, 1, 7, 3, 7, 5, 7] * 3
    gR = lambda: Granule(values=[], scalefac=isp7, scalefac_compress=15)
    _check(_stream(gR, mode_ext=1))
    _check(_stream(gR, mode_ext=3))


def test_is_top_band_inherits():
    """Band 21 has no transmitted scalefactor: its intensity position is
    band 20's (left content runs to the top so the rule is observable)."""
    sf21 = [0] * 20 + [5]
    gl = lambda: Granule(values=[1, -1] * 288, global_gain=GG - 16)
    gR = lambda: Granule(values=[], scalefac=sf21, scalefac_compress=15)
    # the int16 mpg123 floor sits low at this reduced gain; the float
    # avcodec oracle pins the same stream at ~117 dB
    _check(_stream(gR, mode_ext=1, left_fn=gl), mpg_floor=50)


def test_is_short_blocks():
    """Per-window intensity on block-type-2 granules."""
    vals_s = [1, -1] * 30
    gl = lambda: Granule(values=vals_s, global_gain=GG, short=True)
    isp_s = np.tile(np.array([0, 1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4]), (3, 1))
    gR = lambda: Granule(values=[], scalefac=isp_s, scalefac_compress=15,
                         short=True)
    _check(_stream(gR, mode_ext=1, left_fn=gl), mpg_floor=60)
    _check(_stream(gR, mode_ext=3, left_fn=gl), mpg_floor=60)
    # per-window positions + a partial right channel
    isp_w = np.array([[0] * 12, [3] * 12, [6] * 12])
    gR2 = lambda: Granule(values=[1, -1] * 6, scalefac=isp_w,
                          scalefac_compress=15, short=True,
                          global_gain=GG - 6)
    _check(_stream(gR2, mode_ext=1, left_fn=gl), mpg_floor=60)


def test_is_engines_agree():
    """NumPy oracle and the fused C++ f64 plane are float-for-float equal on
    IS streams; the jitted f64 plane stays within FMA-contraction distance.
    Covers MPEG-1 and LSF intensity."""
    from mp3stego_tpu import native
    gR = lambda: Granule(values=[], scalefac=ISP, scalefac_compress=15)
    streams = [_stream(gR, mode_ext=me) for me in (1, 3)]
    streams.append(_lsf_stream(ISP, lsf_sfc_is(3, 3, 3), mode_ext=1))
    streams.append(_lsf_stream(ISP, lsf_sfc_is(3, 3, 3, scale=1),
                               mode_ext=3))
    for mp3 in streams:
        p = dh.parse_mp3(mp3, 0)
        prep = dp.host_prepare(p)
        oracle = dp.decode_granules_np(prep)
        if native.available():
            nat = dp.decode_granules_f64_native(p)
            assert np.array_equal(oracle, nat)
        dev = np.asarray(dp._decode_call(prep, "float64"))
        np.testing.assert_allclose(dev, oracle, rtol=1e-11, atol=1e-12)


def test_non_is_streams_untouched():
    """A plain-stereo crafted stream decodes identically whether or not the
    intensity machinery is compiled in (is_mask gates everything)."""
    g = lambda: Granule(values=VALS, global_gain=GG)
    mp3 = build_stream([[(g(), g()), (g(), g())]] * 2, mode=0, mode_ext=0)
    p = dh.parse_mp3(mp3, 0)
    prep = dp.host_prepare(p)
    assert not prep["is_mask"].any()
    assert (prep["is_pos"] == -1).all()
    _check(mp3)


# ------------------------------------------------------------- LSF

def _lsf_left():
    return Granule(values=VALS, global_gain=GG, lsf=True,
                   scalefac_compress=lsf_sfc())


def _lsf_stream(isp, sfc, mode_ext=1, frames=4, left_fn=_lsf_left,
                short=False):
    fr = [(left_fn(),
           Granule(values=[], scalefac=isp, lsf=True, i_stereo=True,
                   short=short, scalefac_compress=sfc))
          for _ in range(frames)]
    return build_stream_lsf(fr, mode=1, mode_ext=mode_ext)


@pytest.mark.parametrize("scale,mode_ext", [(0, 1), (1, 1), (0, 3), (1, 3)])
def test_lsf_is_pow_tables(scale, mode_ext):
    """LSF intensity coefficients: base 2^-1/4 (intensity_scale=0) or
    2^-1/2 (=1); odd positions scale the post-MS left channel by
    base^((p+1)/2), even positions the right by base^(p/2); sqrt(2) on top
    when the granule is also MS. Positions 0-6 are legal under every
    illegal-position convention, so this pins the coefficients alone."""
    _check(_lsf_stream(ISP, lsf_sfc_is(3, 3, 3, cls=0, scale=scale),
                       mode_ext=mode_ext))


def test_lsf_is_high_positions():
    """Positions 8-14 (slen-4 partition): beyond MPEG-1's 3-bit range and
    legal under every convention."""
    isp = ([8, 9, 10, 11, 12, 13, 14] * 3)[:21]
    _check(_lsf_stream(isp, lsf_sfc_is(4, 4, 4, cls=0, scale=0)))


@pytest.mark.parametrize("cls,slens", [(1, (3, 3, 3)), (2, (3, 2, 0))])
def test_lsf_is_partition_classes(cls, slens):
    """int_scalefac_compress classes 1 and 2 select different slen packings
    and band partitions (decoder_host._LSF_NR_*_IS)."""
    isp = ([0, 1, 2, 3] * 6)[:21]
    _check(_lsf_stream(isp, lsf_sfc_is(*slens, cls=cls, scale=0)))


def test_lsf_is_short_blocks():
    """Per-window LSF intensity on short blocks (12-band (sfb,window)
    scalefactor walk through the IS partitions, band 12 inheriting 11)."""
    vals_s = [1, -1] * 30
    gl = lambda: Granule(values=vals_s, global_gain=GG, lsf=True, short=True,
                         scalefac_compress=lsf_sfc())
    isp = np.tile(np.array([0, 1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4]), (3, 1))
    sfc = lsf_sfc_is(3, 3, 3, cls=0, scale=0)
    for me in (1, 3):
        _check(_lsf_stream(isp, sfc, mode_ext=me, left_fn=gl, short=True),
               mpg_floor=60)


# The three-way ecosystem split, each convention vs its own decoder.
# Rows where the conventions genuinely disagree:
#   slen222 pos 3: illegal under ISO only ((1<<2)-1)
#   slen444 pos 7: illegal under mpg123 only (const 7; ISO sentinel is 15)
#   slen444 pos 15: illegal under ISO only; mpg123/ffmpeg process it
#   slen333 pos 7: illegal under ISO AND mpg123 ((1<<3)-1 == 7); ffmpeg not
_CONV_CASES = [
    ("slen222-pos0-3", ([0, 1, 2, 3] * 6)[:21], (2, 2, 2)),
    ("slen444-all7", [7] * 21, (4, 4, 4)),
    ("slen444-all15", [15] * 21, (4, 4, 4)),
    ("slen333-all7", [7] * 21, (3, 3, 3)),
]


@pytest.mark.parametrize("label,isp,slens", _CONV_CASES)
def test_lsf_illegal_convention_mpg123(label, isp, slens, monkeypatch):
    monkeypatch.setenv("MP3STEGO_TPU_LSF_IS_ILLEGAL", "mpg123")
    mp3 = _lsf_stream(isp, lsf_sfc_is(*slens, cls=0, scale=0))
    assert _snr_vs_mpg123(mp3) > 65


@pytest.mark.parametrize("label,isp,slens", _CONV_CASES)
def test_lsf_illegal_convention_ffmpeg(label, isp, slens, monkeypatch):
    if not have_avcodec():
        pytest.skip("libavcodec oracle unavailable")
    monkeypatch.setenv("MP3STEGO_TPU_LSF_IS_ILLEGAL", "ffmpeg")
    assert _snr_vs_av(_lsf_stream(isp, lsf_sfc_is(*slens, cls=0,
                                                  scale=0))) > 100


def test_lsf_illegal_iso_default():
    """Default (ISO) sentinel is (1<<slen)-1 per band group: pos 7 under
    slen 4 is LEGAL (matches ffmpeg there, diverges from mpg123), pos 15
    under slen 4 is ILLEGAL (host pre-marks -1; diverges from both)."""
    assert "MP3STEGO_TPU_LSF_IS_ILLEGAL" not in os.environ
    if have_avcodec():
        assert _snr_vs_av(_lsf_stream([7] * 21,
                                      lsf_sfc_is(4, 4, 4, cls=0))) > 100
    p = dh.parse_mp3(_lsf_stream([15] * 21, lsf_sfc_is(4, 4, 4, cls=0)), 0)
    prep = dp.host_prepare(p)
    assert prep["is_mask"].any()
    assert (prep["is_pos"] == -1).all()      # every band marked illegal
    p = dh.parse_mp3(_lsf_stream(([0, 1, 2, 3] * 6)[:21],
                                 lsf_sfc_is(2, 2, 2, cls=0)), 0)
    pos = dp.host_prepare(p)["is_pos"]
    assert set(np.unique(pos)) == {-1, 0, 1, 2}   # 3 == (1<<2)-1 pre-marked


def test_lsf_illegal_env_validation(monkeypatch):
    monkeypatch.setenv("MP3STEGO_TPU_LSF_IS_ILLEGAL", "bogus")
    from mp3stego_tpu import tables as T
    with pytest.raises(ValueError):
        T.lsf_is_illegal_mode()
