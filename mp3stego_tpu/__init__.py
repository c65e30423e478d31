"""mp3stego_tpu — TPU-native MP3 steganography framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tomershay100/mp3-steganography-lib (mp3stego-lib): a complete MPEG-1 Layer III
decoder and Shine-style fixed-point encoder with a Huffman-pair steganographic
channel, batched over granules/files on TPU, plus the five-operation
``Steganography`` façade.

Public API mirrors the reference package (__init__.py:1-4):
    from mp3stego_tpu import Steganography, Decoder, Encoder
"""

from mp3stego_tpu.models.decoder import Decoder
from mp3stego_tpu.models.encoder import Encoder
from mp3stego_tpu.steganography import Steganography, str_to_binary_str

__version__ = "0.1.0"

__all__ = ["Steganography", "Decoder", "Encoder", "str_to_binary_str"]
