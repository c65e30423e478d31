"""Pallas synthesis-FIR kernel tests.

The ``pk`` fixture tests need a real TPU backend (the CPU test mesh skips
them); they run when the suite executes under the TPU tunnel (unset
JAX_PLATFORMS / conftest override removed) and bench.py records their
PASS/FAIL on the real chip every round. The ``interpret``-mode tests at the
bottom run the same kernel under the Pallas interpreter on CPU, so the
kernel's tracing / DMA / semaphore / shape logic is compiled on every CI
push with no unconditional skips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def pk():
    from mp3stego_tpu.ops import pallas_kernels as pk
    if not pk.available():
        pytest.skip("Pallas TPU backend unavailable")
    return pk


def _fir_reference(v_ext, s):
    """The 16-shifted-adds jnp-equivalent expression (decoder/Frame.py:80-101
    windowing sum) computed in NumPy."""
    from mp3stego_tpu import tables as T
    d = T.SYNTH_WINDOW.reshape(16, 32).astype(np.float32)
    va, vb = v_ext[..., :32], v_ext[..., 32:]
    ref = np.zeros(v_ext.shape[:1] + (s, 32), np.float32)
    for j in range(16):
        src = va if j % 2 == 0 else vb
        ref = ref + d[j] * src[:, 15 - j:15 - j + s]
    return ref


def test_synth_fir_interpret_mode_cpu():
    """CI coverage of the kernel body without TPU hardware: interpret=True
    executes the grid, DMAs, and accumulation on the host backend."""
    from mp3stego_tpu.ops import pallas_kernels as pk
    rng = np.random.default_rng(2)
    s = 2 * pk._TILE   # two grid steps per channel
    v_ext = rng.standard_normal((2, 15 + s, 64)).astype(np.float32)
    out = np.asarray(pk.synth_fir_host(jnp.asarray(v_ext), s, interpret=True))
    np.testing.assert_allclose(out, _fir_reference(v_ext, s),
                               rtol=1e-5, atol=1e-5)


def test_synth_fir_interpret_unaligned_total():
    """ts_total not a multiple of _TILE exercises the pad/truncate path."""
    from mp3stego_tpu.ops import pallas_kernels as pk
    rng = np.random.default_rng(3)
    s = pk._TILE + 18   # one full tile + a partial one
    v_ext = rng.standard_normal((1, 15 + s, 64)).astype(np.float32)
    out = np.asarray(pk.synth_fir_host(jnp.asarray(v_ext), s, interpret=True))
    assert out.shape == (1, s, 32)
    np.testing.assert_allclose(out, _fir_reference(v_ext, s),
                               rtol=1e-5, atol=1e-5)


def test_synth_fir_matches_jnp(pk):
    from mp3stego_tpu import tables as T
    rng = np.random.default_rng(0)
    s = 1024
    v_ext = rng.standard_normal((2, 15 + s, 64)).astype(np.float32)
    d = T.SYNTH_WINDOW.reshape(16, 32).astype(np.float32)
    va, vb = v_ext[..., :32], v_ext[..., 32:]
    ref = np.zeros((2, s, 32), np.float32)
    for j in range(16):
        src = va if j % 2 == 0 else vb
        ref = ref + d[j] * src[:, 15 - j:15 - j + s]
    out = np.asarray(pk.synth_fir_host(jnp.asarray(v_ext), s))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_synth_fir_halo_continuity(pk):
    """Splitting a stream in two with the 15-step halo must equal one pass."""
    rng = np.random.default_rng(1)
    s = 512
    v_full = rng.standard_normal((1, 15 + 2 * s, 64)).astype(np.float32)
    whole = np.asarray(pk.synth_fir_host(jnp.asarray(v_full), 2 * s))
    first = np.asarray(pk.synth_fir_host(jnp.asarray(v_full[:, :15 + s]), s))
    second_in = v_full[:, s:15 + 2 * s]   # 15-halo = end of first half
    second = np.asarray(pk.synth_fir_host(jnp.asarray(second_in), s))
    np.testing.assert_allclose(np.concatenate([first, second], axis=1), whole,
                               rtol=1e-6, atol=1e-6)


def test_decode_plane_pallas_flag(pk, monkeypatch):
    """MP3STEGO_TPU_PALLAS=1 routes synth through the kernel with int16-level
    agreement on real granules."""
    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp
    with open("/root/reference/tests/test.mp3", "rb") as f:
        p = dh.parse_mp3(f.read(), 0)
    prep = dp.host_prepare(p)
    base = np.asarray(dp._decode_call(prep, "float32"))

    monkeypatch.setenv("MP3STEGO_TPU_PALLAS", "1")
    dp._pallas_fir_enabled.cache_clear()
    dp.decode_granules._clear_cache()
    try:
        fast = np.asarray(dp._decode_call(prep, "float32"))
    finally:
        monkeypatch.delenv("MP3STEGO_TPU_PALLAS")
        dp._pallas_fir_enabled.cache_clear()
        dp.decode_granules._clear_cache()
    np.testing.assert_allclose(fast, base, rtol=1e-4, atol=1e-5)
