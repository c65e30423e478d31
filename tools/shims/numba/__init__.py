"""Minimal numba stand-in so the reference library (which only uses @njit as a
pure-Python-compatible JIT decorator) can run in this environment for golden-vector
generation. Not a real JIT: functions run as plain Python."""


def njit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(f):
        return f

    return deco


def jit(*args, **kwargs):
    return njit(*args, **kwargs)
