"""Host<->device transfer helpers tuned for latency-bound links.

The tunneled TPU used in this environment (and PCIe hosts generally) moves
many medium buffers in one batched fetch far faster than one large buffer:
measured here, a single 8 MB device->host read runs at ~7 MB/s while the same
bytes as ~1 MB pieces in one ``jax.device_get`` run at 25-35 MB/s. Every
fetch of a tensor bigger than ~1 MB should go through :func:`fetch_pieces`.
"""

import jax
import numpy as np

PIECE_BYTES = 1 << 20


def fetch_pieces(bufs, piece_bytes: int = PIECE_BYTES):
    """device_get with every buffer split into ~piece_bytes row slices."""
    split = []
    plan = []
    for b in bufs:
        nbytes = b.size * b.dtype.itemsize
        if nbytes <= piece_bytes or b.ndim == 0 or b.shape[0] <= 1:
            split.append(b)
            plan.append(None)
            continue
        rows_per = max(1, int(piece_bytes // max(1, (nbytes // b.shape[0]))))
        pieces = [b[i:i + rows_per] for i in range(0, b.shape[0], rows_per)]
        plan.append(len(pieces))
        split.extend(pieces)
    got = jax.device_get(split)
    out = []
    pos = 0
    for p in plan:
        if p is None:
            out.append(got[pos])
            pos += 1
        else:
            out.append(np.concatenate(got[pos:pos + p], axis=0))
            pos += p
    return out
