"""Constant-quality VBR encode (beyond the reference, which is CBR-only):
device cost-grid rate choice, per-frame header rates, Xing tag emission, and
true VBR decode through every surface.
"""

import numpy as np
import pytest

from mp3stego_tpu.bitstream import decoder_host as dh
from mp3stego_tpu.bitstream import vbr
from mp3stego_tpu.models.encoder import MP3Encoder
from mp3stego_tpu.ops import decode_plane as dp
from mp3stego_tpu.utils.wav import WavFile


def _wav(secs=2.0, sr=44100, target=128, seed=0):
    """Half quiet sine, half noisy — forces the per-frame rates apart."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * secs))
    sig = 0.3 * np.sin(2 * np.pi * 440 * t / sr)
    half = len(t) // 2
    sig[half:] += 0.4 * rng.standard_normal(len(t) - half)
    pcm = np.clip(sig * 20000, -32768, 32767).astype(np.int16)
    buf = np.empty(2 * len(pcm), np.int16)
    buf[0::2] = pcm
    buf[1::2] = pcm
    return WavFile(file_path="synth.wav", bitrate=target, num_of_channels=2,
                   samplerate=sr, bits_per_sample=16, num_of_samples=len(pcm),
                   mpeg_mode=0, buffer=buf)


@pytest.fixture(scope="module")
def vbr_mp3():
    enc = MP3Encoder(_wav(), vbr=True)
    enc.encode(quiet=True)
    return bytes(enc.out_buffer), enc


def test_vbr_stream_structure(vbr_mp3):
    data, enc = vbr_mp3
    tag = vbr.parse_vbr_tag(data, 0)
    assert tag is not None and tag.kind == "xing"
    assert tag.stream_bytes == len(data)
    assert tag.toc is not None and len(tag.toc) == 100
    assert (np.diff(tag.toc.astype(int)) >= 0).all()   # monotone seek table

    p = dh.parse_mp3(data, 0)
    assert p.num_frames == tag.frames + 1      # + the tag frame
    assert p.skip_first_pcm
    # every audio frame's byte size matches its own header (padding-free)
    assert (np.asarray(p.frame_sizes[1:-1])
            == enc._vbr_rates[:-1] * 144000 // 44100).all()
    # target average respected within one rate notch
    avg = vbr.avg_bitrate_kbps(tag, p.header)
    assert avg in (112, 128, 160)
    # content-adaptive: more than one rate in use, and the noisy half costs
    # strictly more than the quiet half on average
    rates = enc._vbr_rates
    assert len(set(rates.tolist())) >= 2
    h = len(rates) // 2
    assert rates[h:].mean() > rates[:h].mean()


def test_vbr_rejects_hide():
    with pytest.raises(ValueError):
        MP3Encoder(_wav(), hide_str="101", vbr=True)


def test_vbr_engines_byte_identical(monkeypatch):
    """The host C++ engine and the device search plane must emit the same
    VBR stream (same framing, same searches at the same budgets)."""
    outs = {}
    for eng in ("1", "0"):
        monkeypatch.setenv("MP3STEGO_TPU_ENC_HOST", eng)
        enc = MP3Encoder(_wav(secs=1.0), vbr=True)
        enc.encode(quiet=True)
        outs[eng] = bytes(enc.out_buffer)
    assert outs["1"] == outs["0"]


def test_vbr_decode_all_surfaces(vbr_mp3, tmp_path, monkeypatch):
    """True VBR decode: whole-file, batched (host + device), and streaming
    outputs agree — per-frame sizes and reservoir handling across varying
    frame lengths."""
    from mp3stego_tpu.models.streaming import decode_file_streaming
    from mp3stego_tpu.parallel import decode_files_batched
    from mp3stego_tpu.utils.wav import wav_header

    data, _ = vbr_mp3
    mp3 = tmp_path / "v.mp3"
    mp3.write_bytes(data)
    p = dh.parse_mp3(data, 0)
    ref = dp.decode_pcm_i16_host(p)
    if ref is None:
        ref = (dp.decode_pcm(p, "float64") * 32767).astype(np.int16)
    ref_f32 = dp.decode_pcm_i16(p)

    for host_g, want in ((None, ref), ("0", ref_f32)):
        if host_g is None:
            monkeypatch.delenv("MP3STEGO_TPU_BATCH_HOST_G", raising=False)
        else:
            monkeypatch.setenv("MP3STEGO_TPU_BATCH_HOST_G", host_g)
        outs = decode_files_batched([str(mp3)] * 2, out="int16")
        for o in outs:
            np.testing.assert_array_equal(o, want)

    out_wav = tmp_path / "v.wav"
    info = decode_file_streaming(str(mp3), str(out_wav), chunk_frames=13)
    assert out_wav.read_bytes() == wav_header(
        p.header.sampling_rate, ref.shape[1], ref.nbytes) + ref.tobytes()
    assert info["bitrate"] == vbr.avg_bitrate_kbps(vbr.parse_vbr_tag(data, 0),
                                                   p.header)


def test_vbr_driver_and_decoder_roundtrip(tmp_path):
    """Encoder(vbr=True) -> Decoder: reported bitrate is the Xing average,
    PCM length excludes the tag frame."""
    from mp3stego_tpu.models.decoder import Decoder
    from mp3stego_tpu.models.encoder import Encoder
    from mp3stego_tpu.utils.wav import write_wav

    w = _wav(secs=1.0)
    wav_path = tmp_path / "in.wav"
    write_wav(str(wav_path), 44100,
              w.buffer.reshape(-1, 2))
    mp3_path = tmp_path / "out.mp3"
    Encoder(str(wav_path), str(mp3_path), bitrate=128, vbr=True) \
        .encode(quiet=True)
    data = mp3_path.read_bytes()
    tag = vbr.parse_vbr_tag(data, 0)
    assert tag is not None
    out_wav = tmp_path / "out.wav"
    kbps = Decoder(str(mp3_path), str(out_wav)).decode(quiet=True)
    p = dh.parse_mp3(data, 0)
    assert kbps == vbr.avg_bitrate_kbps(tag, p.header)


def test_vbr_lsf_stream(tmp_path):
    """MPEG-2 VBR with the spec-compliant LSF writer: tags parse, every
    engine-surface decodes (virtual-frame packing with per-frame sizes)."""
    w = _wav(secs=1.5, sr=22050, target=48)
    enc = MP3Encoder(w, vbr=True, lsf_compliant=True)
    enc.encode(quiet=True)
    data = bytes(enc.out_buffer)
    tag = vbr.parse_vbr_tag(data, 0)
    assert tag is not None and tag.stream_bytes == len(data)
    p = dh.parse_mp3(data, 0)
    assert p.skip_first_pcm and p.lsf_granules == tag.frames + 1
    out = dp.decode_pcm_i16_host(p)
    if out is None:
        out = (dp.decode_pcm(p, "float64") * 32767).astype(np.int16)
    assert out.shape[0] == tag.frames * 576 + (
        576 if p.duplicate_last_pcm else 0)
