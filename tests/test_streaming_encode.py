"""Bounded-memory streaming encode (models/streaming.encode_file_streaming):
byte-identity to the whole-file MP3Encoder at every chunk alignment — the
analysis window margin, the search chain io, and the persistent
reservoir/padding/serializer state must all splice invisibly.
"""

import numpy as np
import pytest

from mp3stego_tpu.models.encoder import MP3Encoder
from mp3stego_tpu.models.streaming import encode_file_streaming
from mp3stego_tpu.utils.wav import read_wav, write_wav


def _wav_file(tmp_path, secs=2.0, sr=44100, seed=5, mono=False):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * secs))
    sig = 0.35 * np.sin(2 * np.pi * 440 * t / sr)
    sig[len(t) // 2:] += 0.25 * rng.standard_normal(len(t) - len(t) // 2)
    pcm = np.clip(sig * 20000, -32768, 32767).astype(np.int16)
    p = tmp_path / "in.wav"
    data = pcm if mono else np.stack([pcm, np.roll(pcm, 100)], axis=1)
    write_wav(str(p), sr, data)
    return str(p)


def _whole_file(wav_path, bitrate, hide_str=""):
    enc = MP3Encoder(read_wav(wav_path, bitrate), hide_str=hide_str)
    enc.encode(quiet=True)
    if enc.out_buffer == bytearray():
        pytest.skip("native host engine unavailable")
    return bytes(enc.out_buffer)


@pytest.mark.parametrize("chunk", [1, 7, 64, 10_000])
def test_streaming_encode_byte_identity(tmp_path, chunk):
    wav = _wav_file(tmp_path)
    ref = _whole_file(wav, 192)
    out = tmp_path / "out.mp3"
    info = encode_file_streaming(wav, str(out), bitrate=192,
                                 chunk_frames=chunk)
    assert out.read_bytes() == ref
    assert info["bytes"] == len(ref)
    assert info["frames"] * 1152 >= 2 * 44100


def test_streaming_encode_hide_chain(tmp_path):
    """The stego cursor and in-search transform must thread through chunk
    boundaries exactly (the embedded message spans many chunks)."""
    wav = _wav_file(tmp_path, secs=2.5)
    msg = "1011001110" * 40
    ref = _whole_file(wav, 128, hide_str=msg)
    out = tmp_path / "out.mp3"
    info = encode_file_streaming(wav, str(out), bitrate=128,
                                 chunk_frames=9, hide_str=msg)
    assert out.read_bytes() == ref
    assert info["too_long"] is False

    # and the message reads back through the normal reveal path
    from mp3stego_tpu.bitstream import decoder_host as dh
    p = dh.parse_mp3(out.read_bytes(), 0)
    assert dh.stego_bits(p)[:len(msg)] == msg


def test_streaming_encode_mono_48k(tmp_path):
    wav = _wav_file(tmp_path, sr=48000, mono=True)
    ref = _whole_file(wav, 96)
    out = tmp_path / "out.mp3"
    encode_file_streaming(wav, str(out), bitrate=96, chunk_frames=11)
    assert out.read_bytes() == ref


@pytest.mark.parametrize("sr,br", [(22050, 64), (11025, 32)])
def test_streaming_encode_lsf(tmp_path, sr, br, monkeypatch):
    """MPEG-2/2.5 (gpf=1) through the chunked path, file-driven — read_wav
    admits all nine Layer III samplerates (deliberate superset; the
    reference's reader exits on non-MPEG-1 rates, WAV_Reader.py:68). With
    the spec-valid LSF writer the stream also decodes back."""
    monkeypatch.setenv("MP3STEGO_TPU_LSF_COMPLIANT", "1")
    wav = _wav_file(tmp_path, secs=1.5, sr=sr)
    ref = _whole_file(wav, br)
    out = tmp_path / "out.mp3"
    encode_file_streaming(wav, str(out), bitrate=br, chunk_frames=13)
    assert out.read_bytes() == ref

    from mp3stego_tpu.bitstream import decoder_host as dh
    p = dh.parse_mp3(out.read_bytes(), 0)
    assert p.header.sampling_rate == sr


def test_streaming_encode_uses_mmap(tmp_path):
    """The WAV buffer must be a memmap (O(1) input memory)."""
    wav = _wav_file(tmp_path, secs=0.5)
    w = read_wav(wav, 128, use_mmap=True)
    assert isinstance(w.buffer, np.memmap)
    # short/truncated tails read as zeros through the chunk slicer
    enc = MP3Encoder(read_wav(wav, 128))
    enc.encode(quiet=True)
    out = tmp_path / "out.mp3"
    encode_file_streaming(wav, str(out), bitrate=128, chunk_frames=3)
    assert out.read_bytes() == bytes(enc.out_buffer)
