"""Device numeric plane: batched JAX/XLA/Pallas kernels for the MP3 codec.

Decode: requantize -> MS stereo -> reorder/alias -> IMDCT -> frequency inversion ->
polyphase synthesis. Encode: polyphase analysis -> MDCT -> alias butterflies ->
quantization rate loop -> Huffman bit costs. All kernels are batched over
granules (and files); the only sequential structures in the MP3 format — the
IMDCT overlap-add and the synthesis FIFO — are reformulated as shifted adds and
a 16-tap FIR over V-vectors, so nothing needs a `lax.scan`.

Importing this package enables jax x64 mode: the bit-exact decode path is
float64 and the fixed-point encode path needs int64 intermediates.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the codec kernels have a handful of static
# shapes per file length, so cross-process cache hits are the common case.
# The default directory is host-fingerprinted (same scheme as the native .so
# loader, native/__init__.py): XLA's CPU AOT entries are compiled for the
# build machine's microarchitecture, and loading entries cached on a
# different CPU spews cpu_aot_loader "machine type mismatch" errors and can
# SIGILL. A per-host directory makes a copied/imaged home dir start clean.


def _host_cache_tag() -> str:
    import hashlib
    import platform
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(line.strip())
                    break
    except OSError:
        bits.append(platform.processor() or "")
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


# MP3STEGO_TPU_JAX_CACHE="" (empty) disables the persistent cache entirely —
# the multichip dryrun uses this: XLA:CPU AOT entries embed tuning pseudo-
# features (+prefer-no-scatter/-gather) that the loader's host-feature probe
# never reports, so every load logs a machine-type-mismatch error even on
# the machine that wrote the entry.
_cache_dir = os.environ.get(
    "MP3STEGO_TPU_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache",
                 f"mp3stego_tpu_jax-{_host_cache_tag()}"))
if _cache_dir:
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # cache is an optimization only
        pass

