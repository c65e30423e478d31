"""Q31 fixed-point primitives, exact vs encoder/util.py:123-172.

All take int arrays (any shape), use int64 intermediates, and return int32 with
two's-complement wraparound — bit-identical to the numba kernels. int32 addition
is associative/commutative mod 2^32, so batched reductions of `mul` products are
order-independent and safe to vectorize.

Works on both NumPy and jax.numpy arrays (pass the namespace as ``xp``).
"""

import numpy as np


def _i64(a, xp):
    return xp.asarray(a).astype(xp.int64)


def mul(a, b, xp=np):
    """(a*b) >> 32, truncated to int32."""
    return (xp.right_shift(_i64(a, xp) * _i64(b, xp), 32)).astype(xp.int32)


def mulr(a, b, xp=np):
    """Rounded: (a*b + 2^31) >> 32, to int32."""
    return (xp.right_shift(_i64(a, xp) * _i64(b, xp) + np.int64(2147483648), 32)
            ).astype(xp.int32)


def mulsr(a, b, xp=np):
    """Rounded Q31: (a*b + 2^30) >> 31, to int32."""
    return (xp.right_shift(_i64(a, xp) * _i64(b, xp) + np.int64(1073741824), 31)
            ).astype(xp.int32)


def cmuls(are, aim, bre, bim, xp=np):
    """Complex butterfly: ((are*bre - aim*bim)>>31, (are*bim + aim*bre)>>31)."""
    are, aim = _i64(are, xp), _i64(aim, xp)
    bre, bim = _i64(bre, xp), _i64(bim, xp)
    dre = (xp.right_shift(are * bre - aim * bim, 31)).astype(xp.int32)
    dim = (xp.right_shift(are * bim + aim * bre, 31)).astype(xp.int32)
    return dre, dim
