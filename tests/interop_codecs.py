"""ctypes bindings for the system LAME encoder and mpg123 decoder.

Third-party interop oracles: libmp3lame generates real-world MP3 streams
(short blocks, nonzero scalefactors, scale_fac_scale, preflag — features the
reference encoder never emits), and libmpg123 is an independent production
decoder to validate PCM against. Neither is a runtime dependency of the
framework — tests skip when the libraries are absent.

No reference-code derivation here: the APIs are the public lame.h /
mpg123.h surfaces.
"""

import ctypes
import ctypes.util

import numpy as np

# ---------------------------------------------------------------- loading


def _load(*names):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


_LAME = _load("libmp3lame.so.0", "libmp3lame.so",
              ctypes.util.find_library("mp3lame") or "libmp3lame.dylib")
_MPG123 = _load("libmpg123.so.0", "libmpg123.so",
                ctypes.util.find_library("mpg123") or "libmpg123.dylib")


def have_lame() -> bool:
    return _LAME is not None


def have_mpg123() -> bool:
    return _MPG123 is not None


# ---------------------------------------------------------------- lame

def lame_encode(pcm: np.ndarray, samplerate: int, bitrate: int,
                force_short: bool = False, mode: int = None,
                quality: int = 5, free_format: bool = False) -> bytes:
    """Encode int16 PCM (n, ch) with libmp3lame at a constant bitrate.

    The VBR/Xing tag frame is disabled so the stream is plain CBR frames
    (our decoder would drop the tag frame; mpg123 would use it for gapless).
    ``force_short=True`` makes every granule a short block (exercises the
    short-window decode paths end to end)."""
    assert _LAME is not None
    l = _LAME
    l.lame_init.restype = ctypes.c_void_p
    g = ctypes.c_void_p(l.lame_init())
    try:
        pcm = np.ascontiguousarray(pcm, dtype=np.int16)
        if pcm.ndim == 1:
            pcm = pcm[:, None]
        n, ch = pcm.shape
        l.lame_set_num_channels(g, ch)
        l.lame_set_in_samplerate(g, samplerate)
        l.lame_set_out_samplerate(g, samplerate)   # no resampling
        l.lame_set_brate(g, bitrate)
        l.lame_set_VBR(g, 0)                       # vbr_off
        l.lame_set_bWriteVbrTag(g, 0)
        l.lame_set_quality(g, quality)
        if mode is not None:
            l.lame_set_mode(g, mode)               # 0 stereo, 1 jstereo, 3 mono
        if force_short:
            l.lame_set_force_short_blocks(g, 1)
        if free_format:
            l.lame_set_free_format(g, 1)
        if l.lame_init_params(g) < 0:
            raise RuntimeError("lame_init_params failed")
        out = np.empty(int(1.25 * n * ch + 7200 + 16384), np.uint8)
        op = out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        if ch == 2:
            wrote = l.lame_encode_buffer_interleaved(
                g, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
                n, op, out.size)
        else:
            p = pcm[:, 0].ctypes.data_as(ctypes.POINTER(ctypes.c_short))
            wrote = l.lame_encode_buffer(g, p, p, n, op, out.size)
        if wrote < 0:
            raise RuntimeError(f"lame_encode_buffer failed: {wrote}")
        tail = l.lame_encode_flush(
            g, out[wrote:].ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out.size - wrote)
        if tail < 0:
            raise RuntimeError(f"lame_encode_flush failed: {tail}")
        return bytes(out[:wrote + tail])
    finally:
        l.lame_close(g)


# ---------------------------------------------------------------- mpg123

_MPG123_REMOVE_FLAGS = 13
_MPG123_GAPLESS = 0x100
_ENC_SIGNED_16 = 0xD0
_OK, _NEED_MORE, _NEW_FORMAT, _DONE = 0, -10, -11, -12
_INITED = False


def mpg123_decode(mp3: bytes) -> tuple:
    """Decode an MP3 byte stream with libmpg123 -> (pcm int16 (n, ch), rate).

    Gapless trimming is disabled so the output is the raw per-frame PCM
    (one 1152/576-sample block per frame from frame 0), directly comparable
    with this framework's and the reference's whole-stream output."""
    assert _MPG123 is not None
    global _INITED
    m = _MPG123
    if not _INITED:
        m.mpg123_init()
        _INITED = True
    m.mpg123_new.restype = ctypes.c_void_p
    err = ctypes.c_int(0)
    h = ctypes.c_void_p(m.mpg123_new(None, ctypes.byref(err)))
    if not h:
        raise RuntimeError(f"mpg123_new failed: {err.value}")
    try:
        m.mpg123_param(h, _MPG123_REMOVE_FLAGS, ctypes.c_long(_MPG123_GAPLESS),
                       ctypes.c_double(0))
        # force signed-16 output at every rate/channel combination
        m.mpg123_format_none(h)
        rates = (8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100, 48000)
        for r in rates:
            m.mpg123_format(h, ctypes.c_long(r), 3, _ENC_SIGNED_16)
        if m.mpg123_open_feed(h) != _OK:
            raise RuntimeError("mpg123_open_feed failed")
        if m.mpg123_feed(h, mp3, len(mp3)) != _OK:
            raise RuntimeError("mpg123_feed failed")
        rate = ctypes.c_long(0)
        chans = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        chunks = []
        buf = (ctypes.c_ubyte * (1 << 18))()
        done = ctypes.c_size_t(0)
        while True:
            rc = m.mpg123_read(h, buf, len(buf), ctypes.byref(done))
            if done.value:
                chunks.append(bytes(buf[:done.value]))
            if rc == _NEW_FORMAT:
                m.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(chans),
                                   ctypes.byref(enc))
            elif rc in (_NEED_MORE, _DONE):
                break
            elif rc != _OK:
                raise RuntimeError(f"mpg123_read failed: {rc}")
        pcm = np.frombuffer(b"".join(chunks), dtype=np.int16)
        ch = max(1, chans.value)
        return pcm.reshape(-1, ch), int(rate.value)
    finally:
        m.mpg123_delete(h)


# ---------------------------------------------------------------- libavcodec

_AV_BIN = None
_AV_TRIED = False


def _av_binary():
    """Lazily build tests/av_decode.c against the system libavcodec.

    A third decoder oracle, independent of both libmpg123 and this
    framework — float32 output (no int16 saturation), so comparisons are
    honest even on content that would clip: the int16 oracles silently
    agree on the rails wherever both decoders saturate, which once masked a
    builder bug in this very suite. None when the toolchain or library is
    absent (tests skip)."""
    global _AV_BIN, _AV_TRIED
    if _AV_TRIED:
        return _AV_BIN
    _AV_TRIED = True
    import os
    import subprocess
    import tempfile
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "av_decode.c")
    out = os.path.join(tempfile.gettempdir(), "mp3stego_av_decode")
    try:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            r = subprocess.run(["gcc", "-O2", src, "-o", out + ".tmp",
                                "-lavcodec", "-lavutil"],
                               capture_output=True, timeout=120)
            if r.returncode != 0:
                return None
            os.replace(out + ".tmp", out)
        _AV_BIN = out
    except Exception:
        _AV_BIN = None
    return _AV_BIN


def have_avcodec() -> bool:
    return _av_binary() is not None


def avcodec_decode(mp3: bytes) -> tuple:
    """Decode an MP3 byte stream with libavcodec (mp3float) ->
    (pcm float32 (n, ch) UNCLIPPED, rate). Raw per-frame PCM from frame 0,
    no gapless trimming — same framing convention as mpg123_decode."""
    import struct
    import subprocess
    binary = _av_binary()
    assert binary is not None
    r = subprocess.run([binary], input=mp3, capture_output=True, timeout=300)
    if r.stdout[:4] != b"AVPC":
        raise RuntimeError(f"av_decode failed: {r.stderr[-300:]!r}")
    rate, ch = struct.unpack("<ii", r.stdout[4:12])
    pcm = np.frombuffer(r.stdout[12:], np.float32).reshape(-1, ch)
    return pcm, rate


# ---------------------------------------------------------------- metrics

def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-error ratio in dB between two int16 PCM arrays (trimmed to
    the common length; inf when identical)."""
    n = min(len(ref), len(test))
    a = np.asarray(ref, np.float64)[:n]
    b = np.asarray(test, np.float64)[:n]
    err = ((a - b) ** 2).sum()
    if err == 0:
        return float("inf")
    sig = (a ** 2).sum()
    return float(10.0 * np.log10(sig / err)) if sig > 0 else float("-inf")
