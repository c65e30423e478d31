"""Device search plane (ops/search_plane) correctness.

Three layers of evidence:
  1. the threshold-rank reproduction of the int2idx quantizer LUT is verified
     EXHAUSTIVELY over its whole domain (pure integer compares — backend
     independent);
  2. per-lane device search results equal the exact host oracle
     (ops/quant_np.oracle_search) on randomized spectra, including lanes that
     exercise the float64-fallback region;
  3. whole-file encodes through the plane are byte-identical to the cost-grid
     replay path and to the reference-captured golden.
"""

import os

import numpy as np
import pytest

from mp3stego_tpu import tables as T
from mp3stego_tpu.models.encoder import Encoder, MP3Encoder
from mp3stego_tpu.utils.wav import read_wav


def test_int2idx_threshold_rank_exhaustive():
    import jax.numpy as jnp

    from mp3stego_tpu.ops.search_plane import _sconsts

    _, _, int2idx = T.loop_tables()
    th = _sconsts()["th"]
    lnc = np.arange(10000, dtype=np.int32)
    rank = np.asarray(
        jnp.sum((jnp.asarray(lnc)[:, None] >= jnp.asarray(th)[None, :])
                .astype(jnp.int32), axis=-1))
    assert (rank == int2idx[:10000]).all()


def _random_lanes(rng, n, scale_bits):
    """Random spectra with realistic dynamic ranges (some quiet, some hot)."""
    xr = np.zeros((n, 576), np.int32)
    for i in range(n):
        b = int(rng.integers(4, scale_bits))
        row = rng.integers(-(1 << b), 1 << b, size=576)
        # sparsify the tail like a real spectrum
        cut = int(rng.integers(10, 576))
        row[cut:] = row[cut:] // (1 << min(b, 12))
        xr[i] = row.astype(np.int32)
    if n >= 2:
        xr[0] = 0            # silent lane: search skipped
        xr[1, 300:] = 0      # pure small-values lane
        xr[1, :300] = rng.integers(-1, 2, size=300)
    return xr


def test_plane_lanes_match_oracle():
    import jax.numpy as jnp

    from mp3stego_tpu.ops import quant_np
    from mp3stego_tpu.ops import search_plane as SP

    rng = np.random.default_rng(7)
    n = SP.CHUNK
    xr = _random_lanes(rng, n, 28)
    max_bits = rng.integers(500, 4000, size=n).astype(np.int32)
    res = SP.search_all(jnp.asarray(xr), max_bits, sr_idx=0)

    checked = 0
    for g in range(n):
        if res["xrmax0"][g]:
            continue
        if res["flags"][g]:
            continue  # flagged lanes go to the host oracle in production
        # verify the logged approx cells like production does
        ok = True
        nlog = min(int(res["nlog"][g]), SP.S_MAXLOG)
        if nlog:
            hb, hbv = quant_np.verify_cells(
                np.repeat(xr[g][None], nlog, 0),
                res["log_steps"][g, :nlog], 0)
            ok = (hb == res["log_bits"][g, :nlog]).all() and (hbv > 0).all()
        if not ok:
            continue
        r = quant_np.oracle_search(xr[g], int(max_bits[g]), (0, 0, 0), 0)
        for k in ("step", "bits", "bv", "c1", "a1", "a2", "a3", "r0c", "r1c",
                  "cts"):
            assert res[k][g] == r[k], (g, k, res[k][g], r[k])
        assert (res["ch0"][g], res["ch1"][g], res["ch2"][g]) == r["ch"], g
        assert (SP.dense_ix(res)[g] == r["ix"]).all(), g
        checked += 1
    assert checked > n // 2  # the sweep must actually compare most lanes


def _encode_bytes(wav_path, bitrate=320, plane=True):
    os.environ["MP3STEGO_TPU_SEARCH_PLANE"] = "1" if plane else "0"
    try:
        w = read_wav(wav_path, bitrate)
        e = MP3Encoder(w)
        e.encode(quiet=True)
        return bytes(e.out_buffer)
    finally:
        os.environ.pop("MP3STEGO_TPU_SEARCH_PLANE", None)


def test_plane_matches_golden_fixture(tmp_path, stego_golden, encode_golden):
    wav = tmp_path / "fx.wav"
    wav.write_bytes(stego_golden["wav_bytes"].tobytes())
    out = _encode_bytes(str(wav))
    assert out == encode_golden["mp3_bytes"].tobytes()


def test_plane_matches_grid_random(tmp_path):
    from mp3stego_tpu.utils.wav import write_wav

    rng = np.random.default_rng(3)
    sr = 44100
    t = np.arange(sr)  # 1 s
    sig = (0.5 * np.sin(2 * np.pi * 441 * t / sr)
           + 0.2 * rng.standard_normal(len(t)))
    pcm = np.clip(sig * 28000, -32768, 32767).astype(np.int16)
    stereo = np.stack([pcm, pcm[::-1]], axis=1)
    wav = tmp_path / "r.wav"
    write_wav(str(wav), sr, stereo)
    assert _encode_bytes(str(wav), plane=True) == \
        _encode_bytes(str(wav), plane=False)


def test_plane_forced_redo_path(tmp_path, stego_golden, encode_golden,
                                monkeypatch):
    """Force every lane through the host-oracle redo (flags all set): the
    sequential fallback with true cross-granule address chains must still be
    byte-identical to the golden."""
    from mp3stego_tpu.ops import search_plane as SP

    orig = SP.search_all

    def sabotage(xr_dev, max_bits, sr_idx):
        res = orig(xr_dev, max_bits, sr_idx)
        res["flags"] = np.where(res["xrmax0"] == 0, 1, res["flags"])
        return res

    monkeypatch.setattr(SP, "search_all", sabotage)
    wav = tmp_path / "fx.wav"
    wav.write_bytes(stego_golden["wav_bytes"].tobytes())
    out = _encode_bytes(str(wav))
    assert out == encode_golden["mp3_bytes"].tobytes()


def test_plane_multirate(tmp_path, stego_golden):
    """Plane output equals the grid path at other samplerates/bitrates."""
    from mp3stego_tpu.utils.wav import write_wav

    rng = np.random.default_rng(11)
    for sr, br in ((32000, 128), (48000, 256)):
        t = np.arange(sr // 2)
        sig = 0.4 * np.sin(2 * np.pi * 300 * t / sr) \
            + 0.1 * rng.standard_normal(len(t))
        pcm = np.clip(sig * 20000, -32768, 32767).astype(np.int16)
        stereo = np.stack([pcm, -pcm], axis=1)
        wav = tmp_path / f"m{sr}.wav"
        write_wav(str(wav), sr, stereo)
        assert _encode_bytes(str(wav), br, plane=True) == \
            _encode_bytes(str(wav), br, plane=False), (sr, br)


def test_hide_hybrid_matches_golden(tmp_path, stego_golden):
    """hide_str routes through the hide hybrid (sequential head while the
    stego cursor is live, device plane tail); output must match the committed
    hide golden byte for byte."""
    wav = tmp_path / "fx.wav"
    wav.write_bytes(stego_golden["wav_bytes"].tobytes())
    from mp3stego_tpu.steganography import _frame_message

    e = Encoder(str(wav), str(tmp_path / "h.mp3"), bitrate=320,
                hide_str=_frame_message("ddd"))
    too_long = e.encode(quiet=True)
    assert too_long is False
    assert (tmp_path / "h.mp3").read_bytes() == \
        stego_golden["hidden_short"].tobytes()


def test_hide_hybrid_matches_grid_long(tmp_path):
    """Hide into a longer file: hybrid (default) vs the grid replay engine
    must agree byte for byte, including the head->tail bitstream-cache
    handoff and the seeded cross-granule carries."""
    from mp3stego_tpu.steganography import _frame_message
    from mp3stego_tpu.utils.wav import write_wav

    rng = np.random.default_rng(17)
    sr = 44100
    t = np.arange(3 * sr)
    sig = 0.5 * np.sin(2 * np.pi * 500 * t / sr) \
        + 0.15 * rng.standard_normal(len(t))
    pcm = np.clip(sig * 24000, -32768, 32767).astype(np.int16)
    wav = tmp_path / "l.wav"
    write_wav(str(wav), sr, np.stack([pcm, -pcm], axis=1))
    bits = _frame_message("covert message")
    w1 = read_wav(str(wav), 128)
    e1 = MP3Encoder(w1, hide_str=bits)
    e1.encode(quiet=True)
    os.environ["MP3STEGO_TPU_SEARCH_PLANE"] = "0"
    try:
        w2 = read_wav(str(wav), 128)
        e2 = MP3Encoder(w2, hide_str=bits)
        e2.encode(quiet=True)
    finally:
        os.environ.pop("MP3STEGO_TPU_SEARCH_PLANE", None)
    assert bytes(e1.out_buffer) == bytes(e2.out_buffer)
    assert e1.hide_str_offset == e2.hide_str_offset


def test_hide_hybrid_too_long(tmp_path, stego_golden):
    """A message longer than the file's capacity keeps the sequential head
    for the whole file (the cursor never exhausts) and must reproduce the
    reference's too-long output."""
    from mp3stego_tpu.steganography import _frame_message

    wav = tmp_path / "fx.wav"
    wav.write_bytes(stego_golden["wav_bytes"].tobytes())
    e = Encoder(str(wav), str(tmp_path / "t.mp3"), bitrate=320,
                hide_str=_frame_message("ddd" * 100))
    too_long = e.encode(quiet=True)
    assert too_long is True
    assert (tmp_path / "t.mp3").read_bytes() == \
        stego_golden["hidden_toolong"].tobytes()


def test_search_all_wide_lane_int8_packing():
    """search_all ships ix as an int8 plane + re-gathered wide lanes
    (_search_chunk_packed); lanes with |ix| > 127 (linbits-scale values) must
    come back at full int16 width, boundary values unclipped."""
    import jax.numpy as jnp

    from mp3stego_tpu.ops import quant_np
    from mp3stego_tpu.ops import search_plane as SP

    rng = np.random.default_rng(11)
    n = SP.CHUNK
    xr = _random_lanes(rng, n, 24)
    # a near-pure tone: energy in few lines -> large quantized magnitudes
    xr[2] = 0
    xr[2, :8] = np.array([1 << 26, -(1 << 26), 1 << 25, -(1 << 24),
                          1 << 23, 1 << 22, 1 << 21, 1 << 20])
    max_bits = np.full(n, 4000, np.int32)
    res = SP.search_all(jnp.asarray(xr), max_bits, sr_idx=0)
    dense = SP.dense_ix(res)
    assert (np.abs(dense[2]) > 127).any(), "probe lane must be wide"
    assert 2 in res["ixw"], "wide lane must come back as an ixw patch"
    wide = np.flatnonzero((np.abs(dense) > 127).any(axis=1))
    checked = 0
    for g in wide[:8]:
        if res["flags"][g] or res["xrmax0"][g]:
            continue
        r = quant_np.oracle_search(xr[g], int(max_bits[g]), (0, 0, 0), 0)
        np.testing.assert_array_equal(dense[g], r["ix"])
        checked += 1
    assert checked >= 1


def test_verify_cells_batched_matches_loop():
    """The vectorized verify_cells must equal the per-cell loop twin on rows
    spanning the LUT region, the float64-fallback region, bail cells, and
    bv==0 cells."""
    from mp3stego_tpu.ops import quant_np

    rng = np.random.default_rng(23)
    rows = _random_lanes(rng, 96, 30)
    rows[3] = 0                                     # silent -> bv == 0
    rows[4, :8] = np.array([1 << 30, -(1 << 30), 1 << 29, 1 << 28,
                            1 << 27, 1 << 26, 1 << 25, 1 << 24])  # bail-ish
    steps = rng.integers(-120, 1, size=96).astype(np.int64)
    for sr_idx in (0, 1, 2):
        b1, v1 = quant_np.verify_cells(rows, steps, sr_idx)
        b0, v0 = quant_np.verify_cells_loop(rows, steps, sr_idx)
        np.testing.assert_array_equal(b1, b0, err_msg=f"bits sr={sr_idx}")
        np.testing.assert_array_equal(v1, v0, err_msg=f"bv sr={sr_idx}")


def test_hide_search_empty_and_exhausted_message_matches_plain():
    """An empty message (L=0 pads to a whole 4096-bit bucket, ADVICE r4) and
    cursors past the message end must leave the search identical to the
    transform-free plain search."""
    import jax

    from mp3stego_tpu.ops import search_plane as SP

    rng = np.random.default_rng(31)
    xr = jax.device_put(_random_lanes(rng, 8, 22))
    mb = np.full(8, 1631, np.int32)
    plain = SP.search_all(xr, mb, 0)
    empty = SP.search_all(xr, mb, 0, hide_bits=np.zeros(0, np.uint8),
                          hide_cur=np.zeros(8, np.int32))
    past = SP.search_all(xr, mb, 0, hide_bits=np.ones(4, np.uint8),
                         hide_cur=np.full(8, 100, np.int32))
    for k in ("step", "bits", "ch0", "ch1", "ch2", "bv", "c1", "cts"):
        np.testing.assert_array_equal(plain[k], empty[k], err_msg=k)
        np.testing.assert_array_equal(plain[k], past[k], err_msg=k)


def test_verify_cells_hide_batched_matches_loop():
    """The vectorized verify_cells_hide (stego transform + emitted-table
    re-cost) must equal the per-cell loop twin, including cells whose cursor
    runs past the message end mid-granule and out-of-message cells."""
    from mp3stego_tpu.ops import quant_np

    rng = np.random.default_rng(29)
    rows = _random_lanes(rng, 96, 30)
    rows[3] = 0
    rows[4, :8] = np.array([1 << 30, -(1 << 30), 1 << 29, 1 << 28,
                            1 << 27, 1 << 26, 1 << 25, 1 << 24])
    steps = rng.integers(-120, 1, size=96).astype(np.int64)
    bits_u8 = rng.integers(0, 2, size=40).astype(np.uint8)
    # cursors spanning: fully in-message, straddling the end (a granule's
    # 2nd/3rd region falls off), fully past the end
    cursors = rng.integers(0, 45, size=96).astype(np.int64)
    for sr_idx in (0, 1, 2):
        b1, v1 = quant_np.verify_cells_hide(rows, steps, sr_idx,
                                            bits_u8, cursors)
        b0, v0 = quant_np.verify_cells_hide_loop(rows, steps, sr_idx,
                                                 bits_u8, cursors)
        np.testing.assert_array_equal(b1, b0, err_msg=f"bits sr={sr_idx}")
        np.testing.assert_array_equal(v1, v0, err_msg=f"bv sr={sr_idx}")


def test_host_engine_matches_device_plane(tmp_path, monkeypatch):
    """The fully-host C++ engine (encode_analysis + rate_search_file) must be
    byte-identical to the device search plane, plain and hide mode."""
    from mp3stego_tpu.models.encoder import _native_rate_lib
    if _native_rate_lib() is None:
        pytest.skip("native library unavailable")
    from mp3stego_tpu.utils.wav import write_wav

    rng = np.random.default_rng(5)
    sr = 44100
    t = np.arange(sr)
    sig = 0.5 * np.sin(2 * np.pi * 700 * t / sr) \
        + 0.08 * rng.standard_normal(len(t))
    pcm = np.clip(sig * 24000, -32768, 32767).astype(np.int16)
    wav = tmp_path / "h.wav"
    write_wav(str(wav), sr, np.stack([pcm, np.roll(pcm, 99)], axis=1))

    bits = "".join(format(b, "08b") for b in b"7#payload")
    for hide in ("", bits):
        outs = {}
        for env in ("1", "0"):
            monkeypatch.setenv("MP3STEGO_TPU_ENC_HOST", env)
            e = MP3Encoder(read_wav(str(wav), 320), hide_str=hide)
            e.encode(quiet=True)
            outs[env] = (bytes(e.out_buffer), e.hide_str_offset)
        assert outs["1"] == outs["0"], f"hide={bool(hide)}"


def test_native_analysis_matches_device():
    """encode_analysis (C++) must equal the jitted Q31 device plane exactly."""
    from mp3stego_tpu.ops import encode_plane as EP
    rng = np.random.default_rng(9)
    pcm = rng.integers(-32768, 32768, (2, 7 * 576)).astype(np.int16)
    host = EP.run_analysis_native(pcm, 7)
    if host is None:
        pytest.skip("native library unavailable")
    dev = EP.run_analysis(pcm.astype(np.int32) << 16, 7)
    np.testing.assert_array_equal(host, np.asarray(dev))


def test_three_engines_fuzz(tmp_path, monkeypatch):
    """Differential fuzz: host C++ engine vs device search plane vs the
    all-steps grid engine over varied random content (tonal, noisy, quiet,
    clipped), plain and hide — all byte-identical."""
    from mp3stego_tpu.models.encoder import _native_rate_lib
    if _native_rate_lib() is None:
        pytest.skip("native library unavailable")
    from mp3stego_tpu.utils.wav import write_wav

    rng = np.random.default_rng(13)
    sr = 44100
    bits = "".join(format(b, "08b") for b in b"9#fuzz-load")
    for trial, kind in enumerate(("tone", "noise", "quiet", "clip")):
        t = np.arange(int(sr * 0.4))
        if kind == "tone":
            sig = 0.6 * np.sin(2 * np.pi * (300 + 217 * trial) * t / sr)
        elif kind == "noise":
            sig = 0.3 * rng.standard_normal(len(t))
        elif kind == "quiet":
            sig = 0.003 * np.sin(2 * np.pi * 50 * t / sr)
        else:
            sig = np.sign(np.sin(2 * np.pi * 97 * t / sr)) * 1.2
        pcm = np.clip(sig * 30000, -32768, 32767).astype(np.int16)
        wav = tmp_path / f"f{trial}.wav"
        write_wav(str(wav), sr, np.stack([pcm, np.roll(pcm, 7)], axis=1))

        for hide in ("", bits):
            outs = []
            for env in ({"MP3STEGO_TPU_ENC_HOST": "1"},
                        {"MP3STEGO_TPU_ENC_HOST": "0"},
                        {"MP3STEGO_TPU_ENC_HOST": "0",
                         "MP3STEGO_TPU_SEARCH_PLANE": "0"}):
                for k in ("MP3STEGO_TPU_ENC_HOST", "MP3STEGO_TPU_SEARCH_PLANE"):
                    monkeypatch.delenv(k, raising=False)
                for k, v in env.items():
                    monkeypatch.setenv(k, v)
                e = MP3Encoder(read_wav(str(wav), 128), hide_str=hide)
                e.encode(quiet=True)
                outs.append((bytes(e.out_buffer), e.hide_str_offset))
            assert outs[0] == outs[1] == outs[2], (kind, bool(hide))
