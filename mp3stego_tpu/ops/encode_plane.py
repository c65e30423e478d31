"""Batched TPU encode numeric plane: polyphase analysis filterbank + forward MDCT
+ alias butterflies, in exact Q31 fixed point.

The reference feeds a 512-sample ring buffer 32 samples at a time
(MP3_Encoder.py:321-370, 751-758); the ring arithmetic reduces to a pure sliding
window over the per-channel PCM stream:

    tmp_t[i]  = sum_k mul(s[32t + 31 - i - 64k], enwindow[i + 64k])   k<8, i<64
    sb_t[b]   = sum_j mul(fl[b][j], tmp_t[j])                          j<64

so the whole file becomes one dense batched gather + multiply + reduce. The MDCT
input for granule g is [subband(g-1) ; subband(g)] per band (MP3_Encoder.py:681-701)
— a shifted concat over the granule axis, not a scan. Alias butterflies
(MP3_Encoder.py:703-744) only ever read unmodified MDCT outputs, so they batch
cleanly.

int32 sums wrap mod 2^32 (associative), hence every reduction is order-free and
bit-exact vs the sequential reference.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mp3stego_tpu import tables as T
from mp3stego_tpu.ops import fixedpoint as fx


@functools.lru_cache(maxsize=None)
def _window_gather_index():
    """(64,8) sample offsets relative to 32t: 31 - i - 64k (negative = past)."""
    i = np.arange(64)[:, None]
    k = np.arange(8)[None, :]
    return (31 - i - 64 * k).astype(np.int32)


_PAST = 480  # deepest lookback: 31-63-448 = -480


@jax.jit
def analysis_mdct(pcm):
    """PCM (ch, N) int32 (already <<16) -> mdct_freq (ch, Tg, 576) int32.

    ``pcm`` must be front-padded with 480 zeros; N-480 must be a multiple of
    576 (= 18 steps * 32). Tg granules = (N-480)//576.
    """
    ch, n = pcm.shape
    ts = (n - _PAST) // 32                 # window steps
    tg = ts // 18                          # granules

    # ---- windowing: gather sliding windows then mul-reduce over 8 taps
    idx = jnp.asarray(_window_gather_index())            # (64,8)
    t_base = jnp.arange(ts, dtype=jnp.int32) * 32 + _PAST
    gather = t_base[:, None, None] + idx[None]           # (ts,64,8)
    win = jnp.asarray(T.ENWINDOW.reshape(64, 8, order="F"))  # en[i+64k] -> [i,k]
    xs = pcm[:, gather]                                  # (ch,ts,64,8)
    prod = fx.mul(xs, win[None, None], xp=jnp)           # int32
    tmp = jnp.sum(prod.astype(jnp.int32), axis=-1, dtype=jnp.int32)   # (ch,ts,64)

    # ---- 32-band filter: sum_j mul(fl[b,j], tmp[j])
    fl = jnp.asarray(T.subband_filter_fixed())           # (32,64)
    prod2 = fx.mul(fl[None, None], tmp[:, :, None, :], xp=jnp)        # (ch,ts,32,64)
    sb = jnp.sum(prod2.astype(jnp.int32), axis=-1, dtype=jnp.int32)   # (ch,ts,32)

    # ---- analysis-inversion compensation: odd step within granule, odd band
    step_in_gr = jnp.arange(ts) % 18
    inv = jnp.where((step_in_gr[:, None] % 2 == 1) & (jnp.arange(32)[None] % 2 == 1),
                    -1, 1).astype(jnp.int32)
    sb = sb * inv[None]

    sbg = sb.reshape(ch, tg, 18, 32)

    # ---- MDCT over [prev granule ; current granule] per band
    prev = jnp.concatenate([jnp.zeros_like(sbg[:, :1]), sbg[:, :-1]], axis=1)
    mdct_in = jnp.concatenate([prev, sbg], axis=2)       # (ch,tg,36,32)
    mdct_in = mdct_in.transpose(0, 1, 3, 2)              # (ch,tg,32,36)
    cos_l = jnp.asarray(T.mdct_cos_fixed())              # (18,36)
    prod3 = fx.mul(mdct_in[:, :, :, None, :], cos_l[None, None, None], xp=jnp)
    freq = jnp.sum(prod3.astype(jnp.int32), axis=-1, dtype=jnp.int32)  # (ch,tg,32,18)

    # ---- alias butterflies: band b slot i (bu) with band b-1 slot 17-i (bd)
    cs = jnp.asarray(T.MDCT_CS_FIX)                      # (8,)
    ca = jnp.asarray(T.MDCT_CA_FIX)
    up = freq[:, :, 1:, :8]                              # (ch,tg,31,8) "bu" inputs
    dn = freq[:, :, :-1, 17:9:-1]                        # band-1 slots 17..10
    bu, bd = fx.cmuls(up, dn, cs[None, None, None], ca[None, None, None], xp=jnp)
    freq = freq.at[:, :, 1:, :8].set(bu)
    freq = freq.at[:, :, :-1, 17:9:-1].set(bd)

    return freq.reshape(ch, tg, 576)


def run_analysis(pcm_ch: np.ndarray, num_granules: int) -> np.ndarray:
    """Host wrapper: pad, run, return (ch, Tg, 576) int32 numpy."""
    ch, n = pcm_ch.shape
    need = num_granules * 576
    pad_front = np.zeros((ch, _PAST), dtype=np.int32)
    if n < need:
        pcm_ch = np.concatenate(
            [pcm_ch, np.zeros((ch, need - n), dtype=np.int32)], axis=1)
    else:
        pcm_ch = pcm_ch[:, :need]
    full = np.concatenate([pad_front, pcm_ch], axis=1)
    out = analysis_mdct(jnp.asarray(full))
    return np.asarray(out)
