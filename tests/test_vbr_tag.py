"""Xing/Info/VBRI tag-frame handling (bitstream/vbr.py — beyond-reference
real-world compat: VBR files in the wild start with a silent metadata frame
that real decoders skip; the reference decodes it as audio).

The tag fixtures are hand-built: a valid frame (fixture header + all-zero
side info) whose main-data region carries the tag, prepended to the
reference fixture. Prepending changes no audio byte: frame 1's
main_data_begin is 0 (stream start), so every later frame's reservoir
window still resolves to the same bytes, and the tag frame's zero spectra
leave the overlap/synthesis carries exactly at their zero-history values.
"""

import struct

import numpy as np
import pytest

from mp3stego_tpu.bitstream import decoder_host as dh
from mp3stego_tpu.bitstream import vbr
from mp3stego_tpu.ops import decode_plane as dp


@pytest.fixture(scope="module")
def fix_bytes(fixture_mp3):
    with open(fixture_mp3, "rb") as f:
        return f.read()


def _tag_frame(header4: bytes, kind: bytes = b"Xing", frames=None,
               nbytes=None, toc: bool = False, quality=None) -> bytes:
    h = dh.parse_header(*header4)
    size = dh.frame_size_of(h)
    si = 32 if h.channels == 2 else 17
    buf = bytearray(size)
    buf[0:4] = header4
    if kind == b"VBRI":
        pos = 4 + 32
        buf[pos:pos + 4] = kind
        struct.pack_into(">HHH", buf, pos + 4, 1, 0, quality or 0)
        struct.pack_into(">I", buf, pos + 10, nbytes or 0)
        struct.pack_into(">I", buf, pos + 14, frames or 0)
        struct.pack_into(">HHHH", buf, pos + 18, 0, 1, 2, 1)
        return bytes(buf)
    pos = 4 + si
    buf[pos:pos + 4] = kind
    flags = ((1 if frames is not None else 0)
             | (2 if nbytes is not None else 0)
             | (4 if toc else 0)
             | (8 if quality is not None else 0))
    struct.pack_into(">I", buf, pos + 4, flags)
    cur = pos + 8
    if frames is not None:
        struct.pack_into(">I", buf, cur, frames)
        cur += 4
    if nbytes is not None:
        struct.pack_into(">I", buf, cur, nbytes)
        cur += 4
    if toc:
        buf[cur:cur + 100] = bytes(range(100))
        cur += 100
    if quality is not None:
        struct.pack_into(">I", buf, cur, quality)
    return bytes(buf)


def test_xing_tag_parse(fix_bytes):
    tagged = _tag_frame(fix_bytes[:4], frames=1234, nbytes=999000,
                        toc=True, quality=57) + fix_bytes
    tag = vbr.parse_vbr_tag(tagged, 0)
    assert tag is not None and tag.kind == "xing"
    assert tag.frames == 1234 and tag.stream_bytes == 999000
    assert tag.quality == 57 and list(tag.toc) == list(range(100))


def test_vbri_tag_parse(fix_bytes):
    tagged = _tag_frame(fix_bytes[:4], kind=b"VBRI", frames=77,
                        nbytes=5000, quality=3) + fix_bytes
    tag = vbr.parse_vbr_tag(tagged, 0)
    assert tag is not None and tag.kind == "vbri"
    assert tag.frames == 77 and tag.stream_bytes == 5000 and tag.quality == 3


def test_audio_frame_not_misdetected(fix_bytes):
    assert vbr.parse_vbr_tag(fix_bytes, 0) is None
    p = dh.parse_mp3(fix_bytes, 0)
    assert p.vbr_tag is None and not p.skip_first_pcm


def test_fourcc_without_zero_sideinfo_rejected(fix_bytes):
    """An audio frame whose payload happens to contain the fourcc at the
    magic offset must NOT be treated as a tag (side info is nonzero)."""
    h = dh.parse_header(*fix_bytes[:4])
    si = 32 if h.channels == 2 else 17
    mutated = bytearray(fix_bytes)
    mutated[4 + si:4 + si + 4] = b"Xing"
    assert any(mutated[4:4 + si])          # premise: real side info
    assert vbr.parse_vbr_tag(bytes(mutated), 0) is None


@pytest.mark.parametrize("kind", [b"Xing", b"Info", b"VBRI"])
def test_tagged_decode_drops_tag_silence(fix_bytes, kind):
    plain = dh.parse_mp3(fix_bytes, 0)
    ref = dp.decode_pcm_i16_host(plain)
    if ref is None:
        ref = (dp.decode_pcm(plain, "float64") * 32767).astype(np.int16)
    tagged_bytes = _tag_frame(fix_bytes[:4], kind=kind, frames=10,
                              nbytes=100) + fix_bytes
    tagged = dh.parse_mp3(tagged_bytes, 0)
    assert tagged.skip_first_pcm and tagged.vbr_tag is not None
    assert tagged.num_frames == plain.num_frames + 1
    out = dp.decode_pcm_i16_host(tagged)
    if out is None:
        out = (dp.decode_pcm(tagged, "float64") * 32767).astype(np.int16)
    np.testing.assert_array_equal(out, ref)
    # the tag frame's zero tables are invisible to the stego cursor
    assert dh.stego_bits(tagged) == dh.stego_bits(plain)


def test_keep_tag_frame_env(fix_bytes, monkeypatch):
    """Reference-parity mode: the tag frame decodes as 1152 zero samples."""
    monkeypatch.setenv("MP3STEGO_TPU_KEEP_TAG_FRAME", "1")
    tagged_bytes = _tag_frame(fix_bytes[:4], frames=10, nbytes=100) + fix_bytes
    tagged = dh.parse_mp3(tagged_bytes, 0)
    assert tagged.vbr_tag is not None and not tagged.skip_first_pcm
    out = dp.decode_pcm_i16_host(tagged)
    if out is None:
        out = (dp.decode_pcm(tagged, "float64") * 32767).astype(np.int16)
    plain = dh.parse_mp3(fix_bytes, 0)
    ref = dp.decode_pcm_i16_host(plain)
    if ref is None:
        ref = (dp.decode_pcm(plain, "float64") * 32767).astype(np.int16)
    assert out.shape[0] == ref.shape[0] + 1152
    assert not np.any(out[:1152])
    np.testing.assert_array_equal(out[1152:], ref)


def test_facade_decode_reports_tag_average(fix_bytes, tmp_path):
    """decode_mp3_to_wav on a tagged stream: PCM identical to the untagged
    stream, bitrate = the tag-derived average rounded to a valid rate."""
    from mp3stego_tpu.models.decoder import Decoder

    plain = dh.parse_mp3(fix_bytes, 0)
    # frames/bytes chosen so the true average is the fixture's 320 kbps
    sr = plain.header.sampling_rate
    frames = plain.num_frames
    nbytes = int(320000 / 8 * frames * 1152 / sr)
    tagged_bytes = _tag_frame(fix_bytes[:4], frames=frames,
                              nbytes=nbytes) + fix_bytes
    tagged_mp3 = tmp_path / "tagged.mp3"
    tagged_mp3.write_bytes(tagged_bytes)
    plain_mp3 = tmp_path / "plain.mp3"
    plain_mp3.write_bytes(fix_bytes)

    w1, w2 = tmp_path / "a.wav", tmp_path / "b.wav"
    kb_tag = Decoder(str(tagged_mp3), str(w1)).decode(quiet=True)
    kb_plain = Decoder(str(plain_mp3), str(w2)).decode(quiet=True)
    assert kb_tag == kb_plain == 320
    assert w1.read_bytes() == w2.read_bytes()


def test_avg_bitrate_rounds_to_valid_rate(fix_bytes):
    h = dh.parse_header(*fix_bytes[:4])
    # 30 frames at ~187 kbps -> nearest valid MPEG-1 Layer III rate is 192
    seconds = 30 * 1152 / h.sampling_rate
    tag = vbr.VbrTag("xing", 30, int(187000 / 8 * seconds), None, None)
    assert vbr.avg_bitrate_kbps(tag, h) == 192


def test_tagged_batched_and_streaming_paths(fix_bytes, tmp_path, monkeypatch):
    from mp3stego_tpu.models.streaming import decode_file_streaming
    from mp3stego_tpu.parallel import decode_files_batched

    plain = dh.parse_mp3(fix_bytes, 0)
    ref = dp.decode_pcm_i16_host(plain)
    if ref is None:
        ref = (dp.decode_pcm(plain, "float64") * 32767).astype(np.int16)
    tagged_bytes = _tag_frame(fix_bytes[:4], frames=plain.num_frames,
                              nbytes=len(fix_bytes)) + fix_bytes
    tagged_mp3 = tmp_path / "tagged.mp3"
    tagged_mp3.write_bytes(tagged_bytes)

    # batched host engine AND forced device path (the f32 device plane is
    # compared against the f32 per-file decode — its own exactness contract;
    # f64-vs-f32 is a documented <=1-LSB deviation, tests/test_precision.py)
    tagged_parsed = dh.parse_mp3(tagged_bytes, 0)
    ref_f32 = dp.decode_pcm_i16(tagged_parsed)
    for host_g, want in ((None, ref), ("0", ref_f32)):
        if host_g is None:
            monkeypatch.delenv("MP3STEGO_TPU_BATCH_HOST_G", raising=False)
        else:
            monkeypatch.setenv("MP3STEGO_TPU_BATCH_HOST_G", host_g)
        outs = decode_files_batched([str(tagged_mp3)] * 2, out="int16")
        for o in outs:
            np.testing.assert_array_equal(o, want)
    assert ref_f32.shape == ref.shape

    # streaming, window boundary inside the stream
    out_wav = tmp_path / "s.wav"
    info = decode_file_streaming(str(tagged_mp3), str(out_wav),
                                 chunk_frames=7)
    from mp3stego_tpu.utils.wav import wav_header
    expect = wav_header(plain.header.sampling_rate, ref.shape[1],
                        ref.nbytes) + ref.tobytes()
    assert out_wav.read_bytes() == expect
    assert info["stego_bits"] == dh.stego_bits(plain)


def test_tagged_device_huffman_path(fix_bytes):
    from mp3stego_tpu.ops.huffman_device import decode_pcm_i16_device

    plain = dh.parse_mp3(fix_bytes, 0)
    tagged_bytes = _tag_frame(fix_bytes[:4], frames=3,
                              nbytes=1000) + fix_bytes
    inter, parsed = decode_pcm_i16_device(tagged_bytes, 0)
    assert parsed.skip_first_pcm
    assert inter.shape[0] == plain.num_frames * 1152 + (
        1152 if plain.duplicate_last_pcm else 0)
