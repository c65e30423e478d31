"""Sequence parallelism over the granule/time axis of one MP3 stream.

The reference decodes granules strictly sequentially because of two carries
(SURVEY.md §2.2): the IMDCT overlap-add `prev_samples` (one granule of lookback,
Frame.py:150-154) and the synthesis FIFO (15 sub-steps < 1 granule,
Frame.py:80-101). Both carries are *bounded halos*, so a time-range shard only
needs its left neighbour's boundary state: this module shard_maps the decode
plane over a ``frames`` mesh axis and exchanges the halos with a single
`jax.lax.ppermute` shift over ICI. Everything else is granule-local and runs
without communication.

This is the workload's context parallelism (SURVEY.md §5.7): the frame axis is
the "sequence", the halo exchange is the ring collective.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

from mp3stego_tpu.ops import decode_plane as dp


def _shard_body(raw, exp1_idx, exp2x2, reorder_mask, ms_mask, win_row,
                is_short_blk, reorder_perm, dtype):
    """Per-shard decode: local blocks, then halo exchange of the two carries."""
    blk = dp.granule_blocks(raw, exp1_idx, exp2x2, reorder_mask, ms_mask,
                            win_row, is_short_blk, reorder_perm, dtype)

    n = jax.lax.axis_size("frames")
    shift_right = [(i, i + 1) for i in range(n - 1)]  # shard i -> i+1

    # halo 1: previous shard's last granule tail (zeros into shard 0)
    tail_halo = jax.lax.ppermute(blk[:, -1:, :, 18:], "frames", shift_right)

    # overlap-add + V matmul happen locally; the FIR needs the previous
    # shard's last 15 V sub-steps. V depends only on local blk + tail_halo,
    # so each shard recomputes its boundary V and ships it right.
    pcm, _, last_v = dp.synth_from_blocks(blk, dtype, tail_halo=tail_halo)
    v_halo = jax.lax.ppermute(last_v, "frames", shift_right)

    # redo only the FIR with the true left-neighbour V history: cheap —
    # implemented by re-running synth with both halos (XLA dedups the matmul)
    pcm, _, _ = dp.synth_from_blocks(blk, dtype, tail_halo=tail_halo,
                                     v_halo=v_halo)
    return pcm


@functools.partial(jax.jit, static_argnames=("mesh", "dtype_name"))
def _decode_sharded(raw, exp1_idx, exp2x2, reorder_mask, ms_mask, win_row,
                    is_short_blk, reorder_perm, mesh: Mesh,
                    dtype_name="float32"):
    dtype = jnp.dtype(dtype_name)
    t_spec = P(None, "frames")                 # (ch, T, ...) split on time
    body = shard_map(
        functools.partial(_shard_body, dtype=dtype),
        mesh=mesh,
        in_specs=(t_spec, t_spec, t_spec, t_spec, P("frames"), t_spec,
                  t_spec, P()),
        out_specs=t_spec,
    )
    return body(raw, exp1_idx, exp2x2, reorder_mask, ms_mask, win_row,
                is_short_blk, reorder_perm)


def decode_granules_sharded(prep: dict, mesh: Mesh,
                            dtype: str = "float32") -> np.ndarray:
    """Decode one parsed stream with its granule axis sharded over the mesh's
    ``frames`` axis. Pads T up to a multiple of the axis size (padded granules
    decode as silence and are trimmed)."""
    n = mesh.shape["frames"]
    t = prep["raw"].shape[1]
    t_pad = (-t) % n

    def pad(a, axis=1):
        if t_pad == 0:
            return a
        width = [(0, 0)] * a.ndim
        width[axis] = (0, t_pad)
        return np.pad(a, width)

    spec_t = NamedSharding(mesh, P(None, "frames"))
    out = _decode_sharded(
        jax.device_put(pad(prep["raw"]), spec_t),
        jax.device_put(pad(prep["exp1_idx"]), spec_t),
        jax.device_put(pad(prep["exp2x2"]), spec_t),
        jax.device_put(pad(prep["reorder_mask"]), spec_t),
        jax.device_put(pad(prep["ms_mask"], axis=0),
                       NamedSharding(mesh, P("frames"))),
        jax.device_put(pad(prep["win_row"]), spec_t),
        jax.device_put(pad(prep["is_short_blk"]), spec_t),
        jax.device_put(prep["reorder_perm"], NamedSharding(mesh, P())),
        mesh=mesh, dtype_name=dtype)
    return np.asarray(out)[:, :t]
