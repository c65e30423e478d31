"""On-device Huffman bit-scan (ops/huffman_device, SURVEY §7.3 plan B):
must reproduce the host symbol decode exactly, and the full-device decode
path must match the float32 plane bit-for-bit."""

import numpy as np
import pytest

from mp3stego_tpu.bitstream import decoder_host as dh
from mp3stego_tpu.ops import decode_plane as dp
from mp3stego_tpu.ops import huffman_device as hd


def _ref_raw(data):
    p = dh.parse_mp3(data, 0, backend="python")
    return np.ascontiguousarray(
        np.moveaxis(p.raw_samples, 2, 0).reshape(2, -1, 576)).astype(np.int32)


def test_device_scan_matches_host(original_fixture_mp3):
    with open(original_fixture_mp3, "rb") as f:
        data = f.read()
    _, desc = dh.parse_mp3_light(data, 0)
    raw_dev = np.asarray(hd.decode_raw_device(desc))
    np.testing.assert_array_equal(raw_dev, _ref_raw(data))


@pytest.mark.parametrize("tag", ["48000_320", "32000_64"])
def test_device_scan_multirate(tag, multirate_golden=None):
    import os
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "multirate_golden.npz")
    z = np.load(path)
    data = z[f"mp3_{tag}"].tobytes()
    _, desc = dh.parse_mp3_light(data, 0)
    raw_dev = np.asarray(hd.decode_raw_device(desc))
    np.testing.assert_array_equal(raw_dev, _ref_raw(data))


def test_full_device_decode_matches_f32_plane(original_fixture_mp3):
    with open(original_fixture_mp3, "rb") as f:
        data = f.read()
    pcm_dev, parsed = hd.decode_pcm_device(data, 0)
    pcm_ref = dp.decode_pcm(dh.parse_mp3(data, 0), "float32")
    np.testing.assert_array_equal(pcm_dev, np.asarray(pcm_ref, np.float32))
    assert parsed.header.bit_rate == 320000


def test_device_scan_corrupt_stream_parity(original_fixture_mp3):
    """Bit-flipped stream: the device scan still agrees with the host scan
    (same skip-on-no-codeword semantics)."""
    with open(original_fixture_mp3, "rb") as f:
        data = bytearray(f.read())
    rng = np.random.default_rng(99)
    for _ in range(10):
        i = int(rng.integers(200, len(data)))
        data[i] ^= 1 << int(rng.integers(0, 8))
    b = bytes(data)
    _, desc = dh.parse_mp3_light(b, 0)
    raw_dev = np.asarray(hd.decode_raw_device(desc))
    np.testing.assert_array_equal(raw_dev, _ref_raw(b))
