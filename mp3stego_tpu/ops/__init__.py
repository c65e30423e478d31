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

import jax

jax.config.update("jax_enable_x64", True)

