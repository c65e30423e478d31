"""Data-parallel batched decode: many MP3 files at once, sharded over a mesh.

The directory-decode throughput mode from BASELINE.json ("frames vmapped across
files"): host parses each file into dense granule tensors (bitstream plane),
pads to a common granule count, stacks a file axis, and the whole batch decodes
as one vmapped device program with the file axis sharded over the mesh's
``files`` axis. Decoding is embarrassingly parallel across files, so this path
scales linearly over ICI with zero collectives.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mp3stego_tpu.bitstream import decoder_host as dh
from mp3stego_tpu.ops import decode_plane as dp


def prepare_batch(preps: list) -> dict:
    """Stack per-file host_prepare outputs into one padded batch.

    Padded granules carry raw==0 / exp indices 0 and decode to silence; callers
    trim with the returned ``lengths``.
    """
    if not preps:
        raise ValueError("prepare_batch: no files to batch")
    n = len(preps)
    t_max = max(p["raw"].shape[1] for p in preps)

    def stack(key, axis=1, fill=0):
        outs = []
        for p in preps:
            a = p[key]
            pad = t_max - a.shape[axis]
            if pad:
                width = [(0, 0)] * a.ndim
                width[axis] = (0, pad)
                a = np.pad(a, width, constant_values=fill)
            outs.append(a)
        return np.stack(outs)

    return dict(
        raw=stack("raw"),
        exp1_idx=stack("exp1_idx"),
        exp2x2=stack("exp2x2"),
        reorder_mask=stack("reorder_mask"),
        ms_mask=stack("ms_mask", axis=0),
        win_row=stack("win_row"),
        is_short_blk=stack("is_short_blk"),
        reorder_perm=np.stack([p["reorder_perm"] for p in preps]),
        lengths=np.array([p["raw"].shape[1] for p in preps]),
        num_files=n,
    )


@functools.partial(jax.jit, static_argnames=("dtype_name",))
def _decode_batch(raw, exp1_idx, exp2x2, reorder_mask, ms_mask, win_row,
                  is_short_blk, reorder_perm, dtype_name="float32"):
    fn = functools.partial(dp.decode_granules_impl, dtype_name=dtype_name)
    return jax.vmap(fn)(raw, exp1_idx, exp2x2, reorder_mask, ms_mask,
                        win_row, is_short_blk, reorder_perm)


def decode_batch_device(batch: dict, mesh: Mesh = None,
                        dtype: str = "float32"):
    """Run the stacked batch on device; file axis sharded over ``files``."""
    if mesh is not None:
        n_shard = mesh.shape["files"]
        spec = NamedSharding(mesh, P("files"))
        put = lambda a: jax.device_put(_pad_files(a, n_shard), spec)  # noqa: E731
    else:
        put = jnp.asarray
    out = _decode_batch(
        put(batch["raw"]), put(batch["exp1_idx"]), put(batch["exp2x2"]),
        put(batch["reorder_mask"]), put(batch["ms_mask"]),
        put(batch["win_row"]), put(batch["is_short_blk"]),
        put(batch["reorder_perm"]), dtype_name=dtype)
    return out[:batch["num_files"]]


def _pad_files(a: np.ndarray, n_shard: int) -> np.ndarray:
    pad = (-a.shape[0]) % n_shard
    if pad == 0:
        return a
    width = [(0, 0)] * a.ndim
    width[0] = (0, pad)
    return np.pad(a, width)


def decode_files_batched(paths: list, mesh: Mesh = None,
                         dtype: str = "float32") -> list:
    """Decode many MP3 files in one batched device program.

    Returns a list of interleaved PCM float arrays (samples, channels), one per
    file, matching Decoder/decode_pcm output per file.
    """
    preps = []
    metas = []
    for path in paths:
        with open(path, "rb") as f:
            data = f.read()
        from mp3stego_tpu.bitstream.id3 import parse_id3
        id3 = parse_id3(data)
        parsed = dh.parse_mp3(data, id3.offset if id3.is_valid else 0)
        preps.append(dp.host_prepare(parsed))
        metas.append(parsed)

    batch = prepare_batch(preps)
    out = np.asarray(decode_batch_device(batch, mesh, dtype))

    results = []
    for i, parsed in enumerate(metas):
        t = int(batch["lengths"][i])
        pcm = out[i, :, :t]
        ch = parsed.header.channels
        inter = pcm[:ch].transpose(1, 2, 0).reshape(t * 576, ch)
        if parsed.duplicate_last_pcm:
            inter = np.concatenate([inter, inter[-1152:]], axis=0)
        results.append(inter)
    return results
