"""Pallas TPU kernels for the decode plane's hot tail.

``synth_fir`` fuses the polyphase synthesis filterbank's 16-tap FIR over the
V-vector history (decoder/Frame.py:80-101: the u/w windowing + 16-way sum)
into one VMEM-resident pass. The XLA expression of the same computation is 16
shifted adds — 16 HBM round trips over the (ch, 18T, 32) stream; here each
grid program issues one pre-shifted DMA per tap (overlapping/unaligned tile
reads that BlockSpec tiling cannot express) and accumulates every tap on the
VPU in one pass.

Backend constraints discovered by bisection on this Mosaic toolchain (see
tests/test_pallas.py):
  * manual DMAs require a 128-lane minor dimension (32/64-lane DMAs crash the
    compiler), so V ships in a 128-lane layout: lanes [0:32) = V[:, :32)
    ("va", even taps), lanes [32:64) = V[:, 32:64) ("vb", odd taps);
  * scratch/semaphore indices must be static numpy int32, and the whole
    kernel must trace with x64 disabled (the package enables jax x64
    globally; i64 index IR crashes this remote Mosaic toolchain), hence the
    enable_x64(False) scope around the call.

The window table masks each tap to its parity's lanes, so even and odd taps
accumulate in separate lane groups; the final even+odd fold happens outside
the kernel. That reassociates the reference's interleaved j-ascending sum, so
this path matches the jnp fallback to ~1 ulp (f32), not bitwise — it is the
throughput mode's kernel, while the jnp path remains the default and the
float64 NumPy plane remains the parity oracle.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 256   # sub-steps per grid program (16-tap scratch = 2 MiB VMEM)
_HALO = 16    # 15 taps of history, padded to a sublane-aligned 16


def _fir_kernel(v_hbm, d_ref, out_ref):
    c = pl.program_id(0)
    t = pl.program_id(1)

    def body(taps, sems):
        dmas = []
        for j in range(16):
            dma = pltpu.make_async_copy(
                v_hbm.at[c, pl.ds(t * _TILE + _HALO - j, _TILE), :],
                taps.at[np.int32(j)],
                sems.at[np.int32(j)])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()
        acc = jnp.zeros((_TILE, 128), jnp.float32)
        for j in range(16):
            acc = acc + d_ref[np.int32(j)] * taps[np.int32(j)]
        out_ref[0, :, :] = acc

    pl.run_scoped(
        body,
        taps=pltpu.VMEM((16, _TILE, 128), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((16,)),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _synth_fir_128(v128, d128, interpret=False):
    """(ch, HALO+S, 128) -> (ch, S, 128) accumulated per-parity lanes.

    ``interpret=True`` runs the kernel under the Pallas interpreter (works on
    CPU) — used by CI (tests/test_pallas.py) to exercise the kernel's
    tracing, DMA/semaphore, and shape logic on every push; the numerical
    on-chip check stays in bench.py.
    """
    ch = v128.shape[0]
    s = v128.shape[1] - _HALO
    nt = s // _TILE
    return pl.pallas_call(
        _fir_kernel,
        grid=(ch, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # full V, DMA'd per tap
            pl.BlockSpec((16, 1, 128), lambda c, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE, 128), lambda c, t: (c, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ch, s, 128), jnp.float32),
        interpret=interpret,
    )(v128, d128)


@functools.lru_cache(maxsize=1)
def _d128():
    """(16, 1, 128) window table: tap j masked to its parity's lane group."""
    from mp3stego_tpu import tables as T
    d = T.SYNTH_WINDOW.reshape(16, 32).astype(np.float32)
    out = np.zeros((16, 1, 128), np.float32)
    for j in range(16):
        half = (j % 2) * 32
        out[j, 0, half:half + 32] = d[j]
    return jnp.asarray(out)


def synth_fir_host(v_ext, ts_total: int, interpret: bool = False):
    """(ch, 15+S, 64) V history (15-front-halo layout of synth_from_blocks)
    -> (ch, S, 32) PCM sub-steps via the Pallas kernel."""
    ch = v_ext.shape[0]
    s_pad = (-ts_total) % _TILE
    rows = jnp.concatenate([
        jnp.zeros((ch, 1, 64), jnp.float32),       # halo row 0 (dead)
        v_ext.astype(jnp.float32),
        jnp.zeros((ch, s_pad, 64), jnp.float32),
    ], axis=1)
    v128 = jnp.concatenate(
        [rows, jnp.zeros(rows.shape[:2] + (64,), jnp.float32)], axis=-1)
    with jax.enable_x64(False):
        acc = _synth_fir_128(v128, _d128(), interpret=interpret)
    pcm = acc[:, :ts_total, 0:32] + acc[:, :ts_total, 32:64]
    return pcm


@functools.lru_cache(maxsize=1)
def available() -> bool:
    """True when the Pallas TPU path compiles+runs on the current backend."""
    import jax as _jax
    if _jax.default_backend() not in ("tpu", "axon"):
        return False
    try:
        v = jnp.zeros((1, 15 + _TILE, 64), jnp.float32)
        np.asarray(synth_fir_host(v, _TILE))
        return True
    except Exception:
        return False
