"""Third-party interop: decode LAME-encoded streams and validate PCM against
libmpg123, and validate this framework's own encodes against libmpg123.

These tests cover everything the reference's own fixture never exercises:
short/start/stop windows, nonzero scalefactors, scale_fac_scale, per-frame
MS/LR switching, clipping transients, and all nine samplerates — decoded
bit-for-bit independently by a production decoder. The ~81 dB plateau is the
decoder-vs-decoder precision floor (mpg123's own synth rounding); anything
structurally wrong lands below 40 dB, so the 70 dB gates have wide margins
on both sides.

Skipped when the system libraries are absent (they are not runtime
dependencies of the framework).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from interop_codecs import (have_lame, have_mpg123, lame_encode,  # noqa: E402
                            mpg123_decode, snr_db)

pytestmark = pytest.mark.skipif(
    not (have_lame() and have_mpg123()),
    reason="system libmp3lame/libmpg123 not available")


def _transient(sr: int, secs: float = 2.0, seed: int = 0) -> np.ndarray:
    """Tone + broadband clicks: provokes short/start/stop windows, nonzero
    scalefactors and clipping-adjacent peaks in any psychoacoustic encoder."""
    rng = np.random.default_rng(seed)
    n = int(sr * secs)
    t = np.arange(n) / sr
    s = 0.4 * np.sin(2 * np.pi * 440 * t) \
        + 0.2 * np.sin(2 * np.pi * min(3000, int(sr * 0.35)) * t)
    for c in range(20, n, 4000):
        s[c:c + 80] += rng.standard_normal(80) * 0.5
    return np.clip(s * 32767, -32768, 32767).astype(np.int16)


def _our_decode(mp3: bytes, tmp_path) -> np.ndarray:
    import wave

    from mp3stego_tpu.models.decoder import Decoder
    mp3_p = str(tmp_path / "in.mp3")
    wav_p = str(tmp_path / "out.wav")
    with open(mp3_p, "wb") as f:
        f.write(mp3)
    Decoder(mp3_p, wav_p).decode(quiet=True)
    w = wave.open(wav_p)
    return np.frombuffer(w.readframes(w.getnframes()),
                         np.int16).reshape(-1, w.getnchannels())


def _check(mp3: bytes, tmp_path, floor: float = 70.0):
    ref, _ = mpg123_decode(mp3)
    ours = _our_decode(mp3, tmp_path)
    # the encoder's final flush frame can reference reservoir bytes that end
    # at EOF; mpg123 drops such a trailing frame, we decode it — tolerate a
    # one-frame length difference and compare the common prefix
    assert ours.shape[1] == ref.shape[1]
    assert abs(ours.shape[0] - ref.shape[0]) <= 1152
    n = min(ours.shape[0], ref.shape[0])
    s = snr_db(ref[:n].ravel(), ours[:n].ravel())
    assert s > floor, f"SNR vs mpg123 {s:.1f} dB < {floor}"
    return s


# ------------------------------------------------------- LAME -> our decoder

def test_mpeg1_transient_stereo(tmp_path):
    p = _transient(44100)
    pcm = np.stack([p, np.roll(p, 441)], axis=1)
    _check(lame_encode(pcm, 44100, 192), tmp_path)


def test_mpeg1_forced_short(tmp_path):
    p = _transient(44100)
    pcm = np.stack([p, np.roll(p, 441)], axis=1)
    mp3 = lame_encode(pcm, 44100, 192, force_short=True)
    # the stream really is short blocks end to end
    from mp3stego_tpu.bitstream import decoder_host as dh
    parsed = dh.parse_mp3(mp3, 0)
    assert (np.asarray(parsed.block_type) == 2).sum() > 100
    _check(mp3, tmp_path)


@pytest.mark.parametrize("sr,br", [(48000, 256), (32000, 128)])
def test_mpeg1_other_rates(sr, br, tmp_path):
    _check(lame_encode(_transient(sr)[:, None], sr, br, mode=3), tmp_path)


@pytest.mark.parametrize("sr,br", [(22050, 96), (24000, 96), (16000, 64)])
def test_lsf_transient_stereo(sr, br, tmp_path):
    """MPEG-2 decode of real LAME streams: short/start/stop windows, ISO
    band tables (incl. the 16/24 kHz rows where the reference's copy has
    typos), per-frame MS/LR switching."""
    p = _transient(sr)
    pcm = np.stack([p, np.roll(p, sr // 100)], axis=1)
    _check(lame_encode(pcm, sr, br), tmp_path)
    _check(lame_encode(pcm, sr, br, force_short=True), tmp_path)


def test_free_format_stream(tmp_path):
    """Free-format streams (bitrate index 0; LAME --freeformat) decode via
    sync-spacing frame-size discovery — the reference wraps the nibble to
    the 320 kbps row and desyncs immediately. The facade's returned bitrate
    rounds to the nearest standard rate so hide/clear re-encode works."""
    import wave

    from mp3stego_tpu.models.decoder import Decoder
    mp3 = lame_encode(_transient(44100)[:, None], 44100, 150, mode=3,
                      free_format=True)
    ref, _ = mpg123_decode(mp3)
    mp3_p = str(tmp_path / "ff.mp3")
    with open(mp3_p, "wb") as f:
        f.write(mp3)
    br = Decoder(mp3_p, str(tmp_path / "ff.wav")).decode(quiet=True)
    assert br == 160  # nearest standard rate to the free 150 kbps
    w = wave.open(str(tmp_path / "ff.wav"))
    ours = np.frombuffer(w.readframes(w.getnframes()),
                         np.int16).reshape(-1, 1)
    n = min(len(ref), len(ours))
    assert snr_db(ref[:n].ravel(), ours[:n].ravel()) > 70


@pytest.mark.parametrize("sr,br", [(11025, 48), (12000, 48), (8000, 32)])
def test_mpeg25_transient(sr, br, tmp_path):
    """MPEG-2.5 decode, incl. the 8 kHz short-block region0=72 ecosystem
    convention (decoder_host.unpack_samples)."""
    _check(lame_encode(_transient(sr)[:, None], sr, br, mode=3), tmp_path)


# --------------------------------------------- our encoder -> mpg123 decoder

def _encode_wav(pcm: np.ndarray, sr: int, bitrate: int, tmp_path,
                **enc_kw) -> bytes:
    from mp3stego_tpu.models.encoder import MP3Encoder
    from mp3stego_tpu.utils.wav import read_wav, write_wav
    wav_p = str(tmp_path / "src.wav")
    write_wav(wav_p, sr, pcm)
    enc = MP3Encoder(read_wav(wav_p, bitrate), **enc_kw)
    enc.encode(quiet=True)
    return bytes(enc.out_buffer)


def test_our_mpeg1_encode_reads_back(tmp_path):
    """Our MPEG-1 CBR encode decodes equivalently under mpg123 and under our
    own decoder — the emitted stream means the same thing to the ecosystem.

    Floor 45 dB, not 70: this encoder (like the reference, no psymodel)
    codes TRANSIENT content right up to the Nyquist line, where decoder
    families measurably diverge — the exact ISO matrixing (ours, bit-equal
    to the reference chain) vs mpg123's optimized dct64 differ by ~-53 dB
    on Nyquist-band transients (measured: the inter-decoder error is a pure
    fs/2-alternating component; steady fs/2 content agrees at 82 dB, and
    every band-limited LAME stream agrees at ~81 dB). Both decodes sit
    ~35 dB below this encoder's own coding noise (~17 dB on this signal)."""
    p = _transient(44100)
    pcm = np.stack([p, np.roll(p, 441)], axis=1)
    mp3 = _encode_wav(pcm, 44100, 320, tmp_path)
    _check(mp3, tmp_path, floor=45.0)


def test_our_mono_encode_reads_back(tmp_path):
    """Mono encode (the reference's sample feeder crashes on mono files).
    Floor 40 dB: same transient-Nyquist decoder-family residual as above."""
    mp3 = _encode_wav(_transient(44100)[:, None], 44100, 128, tmp_path)
    _check(mp3, tmp_path, floor=40.0)


def test_our_vbr_encode_reads_back(tmp_path):
    """Our constant-quality VBR stream (per-frame rates + Xing tag) decodes
    equivalently under mpg123 and under our own decoder: pins that a
    production decoder accepts the mixed-rate frame chain and the tag frame.

    mpg123 treats any Xing-tagged stream as gapless and trims the standard
    529-sample decoder delay from the front (measured: its output is exactly
    529 samples shorter and offset-aligned at that lag); our decoder keeps
    raw frame output, so the comparison aligns at ours[529:]. Floor 40 dB:
    same transient-Nyquist decoder-family residual as the CBR read-back
    tests above."""
    p = _transient(44100)
    pcm = np.stack([p, np.roll(p, 441)], axis=1)
    mp3 = _encode_wav(pcm, 44100, 128, tmp_path, vbr=True)
    from mp3stego_tpu.bitstream import vbr
    tag = vbr.parse_vbr_tag(mp3, 0)
    assert tag is not None and tag.kind == "xing"
    ref, _ = mpg123_decode(mp3)
    ours = _our_decode(mp3, tmp_path)
    assert ours.shape[1] == ref.shape[1]
    assert ours.shape[0] - ref.shape[0] == 529   # the gapless delay trim
    a = ours[529:]
    n = min(len(a), len(ref))
    s = snr_db(ref[:n].ravel(), a[:n].ravel())
    assert s > 40.0, f"SNR vs mpg123 {s:.1f} dB < 40"


@pytest.mark.parametrize("sr,br", [(22050, 64), (24000, 64), (16000, 48)])
def test_our_compliant_lsf_encode_reads_back(sr, br, tmp_path):
    """The compliant LSF writer emits streams a production decoder reads:
    validates the spec-valid side-info layout AND the ISO band rows at
    16/24 kHz (with the reference's typo'd rows, mpg123 maps the serialized
    region counts to different sample boundaries and misdecodes)."""
    mp3 = _encode_wav(_transient(sr)[:, None], sr, br, tmp_path,
                      lsf_compliant=True)
    _check(mp3, tmp_path, floor=40.0)  # transient-Nyquist residual, as above


# ------------------------------------------------------------ table evidence

def test_band_tables_match_mpg123_binary():
    """BAND_INDEX_ISO / BAND_WIDTH_SHORT_ISO equal the tables embedded in
    the system libmpg123 binary, and the reference's table deviates at
    exactly the three documented positions."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "verify_bands", os.path.join(os.path.dirname(__file__), "..",
                                     "tools", "verify_bands_mpg123.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main() == 0


# --------------------------------------------------- reference-quirk knobs

def test_ref_quirk_knobs_restore_reference_behavior(tmp_path):
    """The three decode-correctness fixes are env-gated: with all knobs on,
    the decode reproduces the reference's (broken) behavior on a short-block
    stream; by default it matches mpg123."""
    p = _transient(44100)
    mp3 = lame_encode(p[:, None], 44100, 192, mode=3, force_short=True)
    mp3_p = str(tmp_path / "k.mp3")
    with open(mp3_p, "wb") as f:
        f.write(mp3)
    code = (
        "import sys, wave, numpy as np\n"
        "from mp3stego_tpu.models.decoder import Decoder\n"
        f"Decoder({mp3_p!r}, {str(tmp_path / 'k.wav')!r}).decode(quiet=True)\n")
    env = dict(os.environ)
    env.update(MP3STEGO_TPU_REF_PCM_WRAP="1", MP3STEGO_TPU_REF_SHORT_BANDS="1",
               MP3STEGO_TPU_REF_START_WINDOW="1")
    subprocess.run([sys.executable, "-c", code], env=env, check=True)
    import wave
    w = wave.open(str(tmp_path / "k.wav"))
    quirky = np.frombuffer(w.readframes(w.getnframes()), np.int16)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools",
                                    "shims"))
    sys.path.insert(0, "/root/reference")
    try:
        from mp3stego.decoder.decoder import Decoder as RefDecoder
    except ImportError:
        pytest.skip("reference not importable")
    import contextlib
    import io
    with contextlib.redirect_stderr(io.StringIO()):
        RefDecoder(mp3_p, str(tmp_path / "kr.wav")).decode()
    wr = wave.open(str(tmp_path / "kr.wav"))
    refq = np.frombuffer(wr.readframes(wr.getnframes()), np.int16)
    assert np.array_equal(quirky, refq), \
        "quirk knobs no longer reproduce the reference decoder bit-for-bit"


# ------------------------------------------------- engine agreement (exact)

def test_short_block_engines_agree(tmp_path):
    """The NumPy oracle and the fused C++ f64 plane stay float-for-float
    identical on real short-block streams (the committed goldens are
    long-block only, so this pins the short/start/stop paths)."""
    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp
    p = _transient(22050)
    pcm = np.stack([p, np.roll(p, 220)], axis=1)
    mp3 = lame_encode(pcm, 22050, 96, force_short=True)
    parsed = dh.parse_mp3(mp3, 0)
    oracle = dp.decode_granules_np(dp.host_prepare(parsed))
    nat = dp.decode_granules_f64_native(parsed)
    if nat is None:
        pytest.skip("native toolchain unavailable")
    assert np.array_equal(oracle, nat)


def test_crc_protected_stream(tmp_path):
    """CRC-protected frames (protection bit 0, 16-bit CRC after the header)
    decode correctly — LAME with error protection vs mpg123."""
    import ctypes

    import interop_codecs as ic
    l = ic._LAME
    l.lame_init.restype = ctypes.c_void_p
    g = ctypes.c_void_p(l.lame_init())
    l.lame_set_num_channels(g, 1)
    l.lame_set_in_samplerate(g, 44100)
    l.lame_set_out_samplerate(g, 44100)
    l.lame_set_brate(g, 128)
    l.lame_set_VBR(g, 0)
    l.lame_set_bWriteVbrTag(g, 0)
    l.lame_set_mode(g, 3)
    l.lame_set_error_protection(g, 1)
    l.lame_init_params(g)
    pcm = _transient(44100)
    out = np.empty(pcm.size * 4 + 20000, np.uint8)
    p = pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    op = out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    w = l.lame_encode_buffer(g, p, p, len(pcm), op, out.size)
    t = l.lame_encode_flush(
        g, out[w:].ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.size - w)
    l.lame_close(g)
    mp3 = bytes(out[:w + t])
    assert (mp3[1] & 1) == 0  # protection bit clear = CRC present
    _check(mp3, tmp_path)


def test_id3v1_trailer_ends_stream_cleanly(tmp_path):
    """A trailing ID3v1 TAG (128 bytes, ubiquitous on real files) ends the
    stream cleanly instead of triggering the reference's stale-PCM
    duplication quirk — same sample count as mpg123, in both the python
    walk and the C++ twin."""
    from mp3stego_tpu.bitstream import decoder_host as dh
    mp3 = lame_encode(_transient(44100)[:, None], 44100, 128, mode=3)
    tagged = mp3 + b"TAG" + b"\x00" * 125
    ref, _ = mpg123_decode(tagged)
    ours = _our_decode(tagged, tmp_path)
    assert ours.shape == ref.shape          # no duplicated final frame
    assert snr_db(ref.ravel(), ours.ravel()) > 70
    p_py = dh.parse_mp3(tagged, 0, backend="python")
    assert not p_py.duplicate_last_pcm
    from mp3stego_tpu import native
    if native.available():
        p_nat = dh.parse_mp3(tagged, 0, backend="native")
        assert not p_nat.duplicate_last_pcm
    # mid-file garbage still triggers the reference quirk
    corrupt = bytearray(mp3)
    corrupt[len(mp3) // 2] = 0x00           # likely breaks a sync eventually
    p_c = dh.parse_mp3(bytes(corrupt) + b"junkjunk", 0, backend="python")
    assert isinstance(p_c.duplicate_last_pcm, bool)


def test_stego_roundtrip_on_lame_file(tmp_path):
    """The flagship steganography ops work on real-world (LAME-encoded)
    files, not just this encoder family's output: hide -> reveal recovers
    the message; clear produces a stego-silent re-encode; the carriers
    still decode sanely under mpg123."""
    from mp3stego_tpu import Steganography
    mp3 = lame_encode(_transient(44100, secs=3.0)[:, None], 44100, 128,
                      mode=3)
    src = str(tmp_path / "carrier.mp3")
    with open(src, "wb") as f:
        f.write(mp3)
    s = Steganography(quiet=True)
    hidden = str(tmp_path / "hidden.mp3")
    assert s.hide_message(src, hidden, "interop!") is False  # not too long
    out_txt = str(tmp_path / "msg.txt")
    s.reveal_massage(hidden, out_txt)
    assert open(out_txt).read() == "interop!"
    # the stego carrier is a valid stream for production decoders
    ref, rate = mpg123_decode(open(hidden, "rb").read())
    assert rate == 44100 and len(ref) > 0
    cleared = str(tmp_path / "cleared.mp3")
    s.clear_file(hidden, cleared)
    s.reveal_massage(cleared, out_txt)
    assert "interop!" not in open(out_txt).read()
