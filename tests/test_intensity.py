"""Intensity-stereo decode, validated against libmpg123 on hand-crafted
streams (tests/craft_mp3.py — no available encoder emits intensity stereo).

The reference decoder ignores the intensity mode_ext bit entirely (its
FrameHeader parses it, Frame.py never reads it): IS streams decode with a
silent/wrong right channel. This framework decodes MPEG-1 intensity stereo
(ISO 11172-3 2.4.3.4.9.3) in every engine; the MS+IS sqrt(2) coefficient
scaling, the band bound, the is_pos=7 escape, and the top-band inherit rule
are all pinned here against mpg123. LSF intensity (different coefficient
tables) is not implemented — flagged LSF granules stay on the MS/LR path.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from craft_mp3 import Granule, build_stream  # noqa: E402
from interop_codecs import have_mpg123, mpg123_decode, snr_db  # noqa: E402

from mp3stego_tpu.bitstream import decoder_host as dh  # noqa: E402
from mp3stego_tpu.ops import decode_plane as dp  # noqa: E402

pytestmark = pytest.mark.skipif(not have_mpg123(),
                                reason="system libmpg123 not available")

VALS = [1, -1] * 40
ISP = [0, 1, 2, 3, 4, 5, 6] * 3


def _gl(**kw):
    return Granule(values=VALS, global_gain=196, **kw)


def _stream(right_fn, mode_ext, frames=4, left_fn=_gl):
    fr = [[(left_fn(), right_fn()), (left_fn(), right_fn())]
          for _ in range(frames)]
    return build_stream(fr, mode=1, mode_ext=mode_ext)


def _oracle_pcm(mp3):
    p = dh.parse_mp3(mp3, 0)
    pcm = dp.decode_granules_np(dp.host_prepare(p))
    return np.clip(pcm * 32767, -32768, 32767).astype(
        np.int16)[:2].transpose(1, 2, 0).reshape(-1, 2)


def _snr_vs_mpg123(mp3):
    ref, _ = mpg123_decode(mp3)
    ours = _oracle_pcm(mp3)
    n = min(len(ref), len(ours))
    return snr_db(ref[:n].ravel(), ours[:n].ravel())


def test_is_only_long_blocks():
    gR = lambda: Granule(values=[], scalefac=ISP, scalefac_compress=15)
    assert _snr_vs_mpg123(_stream(gR, mode_ext=1)) > 75


def test_ms_plus_is_sqrt2_tables():
    """mode_ext=3: the coefficient pair is scaled by sqrt(2) and applied to
    the post-MS left channel (mpg123's tan*_2 tables)."""
    gR = lambda: Granule(values=[], scalefac=ISP, scalefac_compress=15)
    assert _snr_vs_mpg123(_stream(gR, mode_ext=3)) > 75


def test_is_bound_partial_right():
    """Bands holding right-channel content stay on the MS/LR path; only the
    zero tail is intensity-processed."""
    gR = lambda: Granule(values=[1, -1] * 15, scalefac=ISP,
                         scalefac_compress=15, global_gain=190)
    assert _snr_vs_mpg123(_stream(gR, mode_ext=1)) > 75
    assert _snr_vs_mpg123(_stream(gR, mode_ext=3)) > 75


def test_is_pos7_escape():
    """is_pos == 7 marks a band 'illegal': it stays on the MS/LR path."""
    isp7 = [7, 1, 7, 3, 7, 5, 7] * 3
    gR = lambda: Granule(values=[], scalefac=isp7, scalefac_compress=15)
    assert _snr_vs_mpg123(_stream(gR, mode_ext=1)) > 75
    assert _snr_vs_mpg123(_stream(gR, mode_ext=3)) > 75


def test_is_top_band_inherits():
    """Band 21 has no transmitted scalefactor: its intensity position is
    band 20's (left content runs to the top so the rule is observable)."""
    sf21 = [0] * 20 + [5]
    gl = lambda: Granule(values=[1, -1] * 288, global_gain=196)
    gR = lambda: Granule(values=[], scalefac=sf21, scalefac_compress=15)
    assert _snr_vs_mpg123(_stream(gR, mode_ext=1, left_fn=gl)) > 70


def test_is_short_blocks():
    """Per-window intensity on block-type-2 granules."""
    vals_s = [1, -1] * 30
    gl = lambda: Granule(values=vals_s, global_gain=196, short=True)
    isp_s = np.tile(np.array([0, 1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4]), (3, 1))
    gR = lambda: Granule(values=[], scalefac=isp_s, scalefac_compress=15,
                         short=True)
    assert _snr_vs_mpg123(_stream(gR, mode_ext=1, left_fn=gl)) > 70
    assert _snr_vs_mpg123(_stream(gR, mode_ext=3, left_fn=gl)) > 70
    # per-window positions + a partial right channel
    isp_w = np.array([[0] * 12, [3] * 12, [6] * 12])
    gR2 = lambda: Granule(values=[1, -1] * 6, scalefac=isp_w,
                          scalefac_compress=15, short=True, global_gain=190)
    assert _snr_vs_mpg123(_stream(gR2, mode_ext=1, left_fn=gl)) > 70


def test_is_engines_agree():
    """NumPy oracle and the fused C++ f64 plane are float-for-float equal on
    IS streams; the jitted f64 plane stays within FMA-contraction distance."""
    from mp3stego_tpu import native
    gR = lambda: Granule(values=[], scalefac=ISP, scalefac_compress=15)
    for me in (1, 3):
        mp3 = _stream(gR, mode_ext=me)
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
    g = lambda: Granule(values=VALS, global_gain=196)
    mp3 = build_stream([[(g(), g()), (g(), g())]] * 2, mode=0, mode_ext=0)
    p = dh.parse_mp3(mp3, 0)
    prep = dp.host_prepare(p)
    assert not prep["is_mask"].any()
    assert (prep["is_pos"] == -1).all()
    assert _snr_vs_mpg123(mp3) > 75
