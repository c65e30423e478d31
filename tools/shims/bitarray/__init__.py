"""Minimal bitarray stand-in: only what mp3stego.steganography.str_to_binary_str
uses (construct, frombytes, iteration yielding 0/1 ints, MSB-first)."""


class bitarray:
    def __init__(self, initial=None):
        self._bits = []
        if initial:
            self._bits = [int(b) for b in initial]

    def frombytes(self, data: bytes):
        for byte in data:
            for i in range(7, -1, -1):
                self._bits.append((byte >> i) & 1)

    def __iter__(self):
        return iter(self._bits)

    def __len__(self):
        return len(self._bits)
