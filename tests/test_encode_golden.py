"""Unit-level bit-exactness of the encode pipeline against reference-captured
goldens: analysis/MDCT plane, quantized spectra, side-info fields, per-frame
byte chunks, final MP3 bytes, and the stego embed outputs."""

import types

import numpy as np
import pytest

from mp3stego_tpu.models.encoder import MP3Encoder
from mp3stego_tpu.utils.wav import read_wav


@pytest.fixture(scope="module")
def monkeypatch_module():
    mp = pytest.MonkeyPatch()
    yield mp
    mp.undo()


@pytest.fixture(scope="module")
def golden_wav(tmp_path_factory, stego_golden):
    p = tmp_path_factory.mktemp("wav") / "golden.wav"
    p.write_bytes(stego_golden["wav_bytes"].tobytes())
    return str(p)


@pytest.fixture(scope="module")
def encoded(golden_wav, monkeypatch_module):
    """Run the encoder once, capturing per-frame state at the same points the
    golden capture hooks used (post-iteration-loop, pre-sign-flip). Pins the
    sequential cost-grid engine — these hooks instrument its per-frame state;
    the search-plane engine is golden-tested in tests/test_search_plane.py."""
    monkeypatch_module.setenv("MP3STEGO_TPU_SEARCH_PLANE", "0")
    enc = MP3Encoder(read_wav(golden_wav, 320))
    caps = []
    orig_iter = enc._iteration_loop
    orig_frame = enc._encode_frame

    def iter_patched(self, mdct_frame):
        orig_iter(mdct_frame)
        caps.append(dict(
            mdct=mdct_frame.copy(),
            l3_enc=self.l3_enc.copy(),
            scfsi=self.scfsi.copy(),
            padding=self.padding,
            mean_bits=self.mean_bits,
            resv_size=self.resv_size,
            hide_str_offset=self.hide_str_offset,
            info={(g, c): vars(self.gr_info[g][c]).copy()
                  for g in range(2) for c in range(2)},
            ts=np.array([[self.gr_info[g][c].table_select.copy()
                          for c in range(2)] for g in range(2)]),
        ))

    chunks = []

    def frame_patched(self, mdct_frame):
        n0 = len(self.out_buffer)
        orig_frame(mdct_frame)
        self.out_buffer += self.bw.take_frame()
        chunks.append(bytes(self.out_buffer[n0:]))

    enc._iteration_loop = types.MethodType(iter_patched, enc)
    enc._encode_frame = types.MethodType(frame_patched, enc)
    enc.encode()
    return enc, caps, chunks


def test_mdct_plane(encoded, encode_golden):
    _, caps, _ = encoded
    for f, c in enumerate(caps):
        np.testing.assert_array_equal(
            c["mdct"].reshape(2, 2, 576), encode_golden["mdct_freq"][f],
            err_msg=f"frame {f}")


def test_quantized_spectra(encoded, encode_golden):
    _, caps, _ = encoded
    for f, c in enumerate(caps):
        np.testing.assert_array_equal(c["l3_enc"], encode_golden["l3_enc"][f],
                                      err_msg=f"frame {f}")


def test_side_info_fields(encoded, encode_golden):
    _, caps, _ = encoded
    g = encode_golden
    field_map = {
        "part2_3_length": "part2_3_length", "big_values": "big_values",
        "count1": "count1", "global_gain": "global_gain",
        "region0_count": "region0_count", "region1_count": "region1_count",
        "count1table_select": "count1table_select",
        "quantizerStepSize": "quantizerStepSize",
        "address1": "address1", "address2": "address2", "address3": "address3",
        "part2_length": "part2_length", "preflag": "preflag",
        "scale_fac_scale": "scale_fac_scale",
        "scale_fac_compress": "scale_fac_compress",
    }
    for f, c in enumerate(caps):
        for gr in range(2):
            for ch in range(2):
                info = c["info"][(gr, ch)]
                for mine, gold in field_map.items():
                    assert float(info[mine]) == g[gold][f][gr][ch], \
                        f"frame {f} gr {gr} ch {ch} field {mine}"
        np.testing.assert_array_equal(c["ts"], g["table_select"][f])
        np.testing.assert_array_equal(c["scfsi"], g["scfsi"][f])
        assert c["padding"] == g["padding"][f]
        assert c["mean_bits"] == g["mean_bits"][f]
        assert c["resv_size"] == g["resv_size"][f]
        assert c["hide_str_offset"] == g["hide_str_offset"][f]


def test_frame_chunks(encoded, encode_golden):
    _, _, chunks = encoded
    g = encode_golden
    cat = g["chunks"].tobytes()
    offs = g["chunk_offsets"]
    for f in range(len(offs) - 1):
        assert chunks[f] == cat[offs[f]:offs[f + 1]], f"frame {f}"


def test_final_bytes(encoded, encode_golden):
    enc, _, _ = encoded
    assert bytes(enc.out_buffer) == encode_golden["mp3_bytes"].tobytes()


def test_hide_bytes(golden_wav, stego_golden):
    """Embedding: the hide('ddd') output must match the reference byte-for-byte."""
    bits = stego_golden["bits_short"].tobytes().decode()
    enc = MP3Encoder(read_wav(golden_wav, 320), hide_str=bits)
    enc.encode()
    assert bytes(enc.out_buffer) == stego_golden["hidden_short"].tobytes()
    assert enc.hide_str_offset >= len(bits) - 1


@pytest.mark.parametrize("engine", ["host", "device", "costgrid"])
def test_hide_capacity_saturated_bytes(golden_wav, engine, monkeypatch):
    """Worst-case embedding: a 48-char message keeps the stego cursor live to
    the final frame (408 of the stream's 414 usable bits), so EVERY granule's
    search runs with the pair-transform feedback. All three engines must
    match the reference byte-for-byte (golden: tools/gen_golden_cap.py;
    reference hot path MP3_Encoder.py:958-996 + 1257-1263)."""
    import os
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "capstego_golden.npz"))
    msg = g["msg_cap"].tobytes().decode()
    from mp3stego_tpu.steganography import str_to_binary_str
    bits = str_to_binary_str(f"{len(msg)}#{msg}")
    if engine == "device":
        monkeypatch.setenv("MP3STEGO_TPU_ENC_HOST", "0")
        # the module-scoped `encoded` fixture pins SEARCH_PLANE=0 for the
        # rest of the module; restore it so this really tests the plane
        monkeypatch.setenv("MP3STEGO_TPU_SEARCH_PLANE", "1")
    elif engine == "costgrid":
        monkeypatch.setenv("MP3STEGO_TPU_SEARCH_PLANE", "0")
    enc = MP3Encoder(read_wav(golden_wav, 320), hide_str=bits)
    enc.encode()
    assert bytes(enc.out_buffer) == g["hidden_cap"].tobytes()
    assert enc.hide_str_offset >= len(bits) - 1
    if engine == "device":     # the fused A+pin+B program actually ran
        assert enc.last_hide_parallel_stats["fused"] is True


def test_hide_capacity_saturated_bytes_unfused(golden_wav, monkeypatch):
    """The parallel hide's big-file regime: a lane budget of 1 forces the
    chunked pass-A + pinned-pass-B loop instead of the fused one-program
    path — bytes must stay identical to the reference golden."""
    import os
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "capstego_golden.npz"))
    msg = g["msg_cap"].tobytes().decode()
    from mp3stego_tpu.steganography import str_to_binary_str
    bits = str_to_binary_str(f"{len(msg)}#{msg}")
    monkeypatch.setenv("MP3STEGO_TPU_ENC_HOST", "0")
    monkeypatch.setenv("MP3STEGO_TPU_SEARCH_PLANE", "1")
    monkeypatch.setenv("MP3STEGO_TPU_BATCH_ENC_LANES", "1")
    enc = MP3Encoder(read_wav(golden_wav, 320), hide_str=bits)
    enc.encode()
    assert bytes(enc.out_buffer) == g["hidden_cap"].tobytes()
    assert enc.last_hide_parallel_stats["fused"] is False
    assert enc.last_hide_parallel_stats["converged"] is True


def _synth_wav(tmp_path, sig, rate):
    import struct
    pcm = np.clip(np.stack([sig, sig[::-1]], axis=1), -32768,
                  32767).astype(np.int16)
    payload = pcm.tobytes()
    h = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    h += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, rate, rate * 4, 4, 16)
    h += b"data" + struct.pack("<I", len(payload)) + payload
    p = tmp_path / "synth.wav"
    p.write_bytes(h)
    return str(p)


@pytest.mark.parametrize("kind", ["noise", "silence", "square", "impulses"])
def test_device_search_matches_host_oracle(kind, tmp_path):
    """Differential fuzz: the device cost-grid replay must be byte-identical
    to the pure host search on adversarial signals (full-scale noise hits the
    float-path fallback; silence hits the big_values==0 stale-address path),
    in both clear and hide modes."""
    rng = np.random.default_rng(11)
    n = 4 * 1152
    t = np.arange(n) / 44100.0
    sig = {
        "noise": rng.integers(-32768, 32767, n).astype(float),
        "silence": np.zeros(n),
        "square": 32767 * np.sign(np.sin(2 * np.pi * 100 * t)),
        "impulses": np.where(rng.random(n) < 0.01, 32767.0, 0.0),
    }[kind]
    wav = _synth_wav(tmp_path, sig, 44100)
    for hide in ("", "10" * 40):
        e1 = MP3Encoder(read_wav(wav, 128), hide_str=hide)
        e1.encode()
        e2 = MP3Encoder(read_wav(wav, 128), hide_str=hide, device_search=False)
        e2.encode()
        assert bytes(e1.out_buffer) == bytes(e2.out_buffer), (kind, bool(hide))
