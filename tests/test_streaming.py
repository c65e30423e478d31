"""Bounded-memory streaming decode (models/streaming.py): windowed parse +
decode with warm-up frames must produce byte-identical WAV output and the
same stego bit string as the whole-file path, for every window alignment."""

import numpy as np
import pytest

from mp3stego_tpu.bitstream import decoder_host as dh
from mp3stego_tpu.models.streaming import decode_file_streaming
from mp3stego_tpu.ops import decode_plane as dp
from mp3stego_tpu.utils.wav import write_wav


N_FRAMES = 383   # ~10 s at 44.1 kHz


@pytest.fixture(scope="module")
def long_mp3(tmp_path_factory):
    """A multi-chunk CBR stream: a 10 s synthetic signal encoded at
    128 kbps (~382 frames); the whole-file parse of it is the oracle."""
    from mp3stego_tpu.models.encoder import Encoder

    d = tmp_path_factory.mktemp("stream")
    rng = np.random.default_rng(7)
    t = np.arange(int(44100 * 10.0))
    sig = (0.4 * np.sin(2 * np.pi * 440 * t / 44100)
           + 0.08 * rng.standard_normal(len(t)))
    pcm = np.clip(sig * 22000, -32768, 32767).astype(np.int16)
    wav = d / "long.wav"
    write_wav(str(wav), 44100, np.stack([pcm, np.roll(pcm, 441)], axis=1))
    mp3 = d / "long.mp3"
    Encoder(str(wav), str(mp3), bitrate=128).encode(quiet=True)
    with open(mp3, "rb") as f:
        return str(mp3), f.read()


def _whole_file_wav(data, path):
    parsed = dh.parse_mp3(data, 0)
    pcm = dp.decode_pcm_i16_host(parsed)
    if pcm is None:
        pcm = (dp.decode_pcm(parsed, "float64") * 32767).astype(np.int16)
    write_wav(path, parsed.header.sampling_rate, pcm)
    return parsed


@pytest.mark.parametrize("chunk", [64, 100, N_FRAMES, 1000])
def test_streaming_matches_whole_file(long_mp3, tmp_path, chunk):
    path, data = long_mp3
    ref_wav = str(tmp_path / "ref.wav")
    parsed = _whole_file_wav(data, ref_wav)
    out_wav = str(tmp_path / f"s{chunk}.wav")
    info = decode_file_streaming(path, out_wav, chunk_frames=chunk)
    assert info["num_frames"] == parsed.num_frames == N_FRAMES
    assert info["bitrate"] == parsed.header.bit_rate // 1000
    with open(ref_wav, "rb") as a, open(out_wav, "rb") as b:
        assert a.read() == b.read()
    assert info["stego_bits"] == dh.stego_bits(parsed)


def test_streaming_duplicate_tail_quirk(long_mp3, tmp_path):
    """A bad sync mid-stream triggers the reference's stale-PCM duplication
    (MP3_Parser.py:79); the final streaming window must reproduce it."""
    _, data = long_mp3
    broken = data + b"\x12\x34\x56\x78" * 4   # trailing garbage, no sync
    p = tmp_path / "broken.mp3"
    p.write_bytes(broken)
    ref_wav = str(tmp_path / "ref.wav")
    parsed = _whole_file_wav(broken, ref_wav)
    assert parsed.duplicate_last_pcm
    out_wav = str(tmp_path / "s.wav")
    decode_file_streaming(str(p), out_wav, chunk_frames=100)
    with open(ref_wav, "rb") as a, open(out_wav, "rb") as b:
        assert a.read() == b.read()


def test_streaming_progress_and_single_chunk(long_mp3, tmp_path):
    path, data = long_mp3
    seen = []
    out_wav = str(tmp_path / "one.wav")
    decode_file_streaming(path, out_wav, chunk_frames=10_000,
                          progress_cb=lambda d, t: seen.append((d, t)))
    assert seen == [(N_FRAMES, N_FRAMES)]
