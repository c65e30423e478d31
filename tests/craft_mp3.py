"""Hand-crafted MPEG-1 Layer III frame builder for decoder validation.

Builds bit-exact MP3 frames with full control over every side-info field,
scalefactor, and spectral value — the tool for validating decode paths that
no available encoder exercises (intensity stereo, arbitrary is_pos values,
MS+IS combinations). Streams are validated against libmpg123, which decodes
anything spec-shaped.

Built from this framework's own ISO table pack (tables.HUFF_*) and BitWriter;
no reference-code derivation.
"""

import numpy as np

from mp3stego_tpu import tables as T
from mp3stego_tpu.bitstream.bits import BitWriter


def _huff_pair_bits(table: int, x: int, y: int):
    """(code, nbits, linbits_x, linbits_y) for |x|,|y| under a big-values
    table; caller emits sign bits after each nonzero."""
    xl = int(T.HUFF_XLEN[table])
    lin = int(T.HUFF_LINBITS[table])
    ax, ay = abs(x), abs(y)
    lx = max(0, ax - (xl - 1)) if lin and ax >= xl - 1 else 0
    ly = max(0, ay - (xl - 1)) if lin and ay >= xl - 1 else 0
    cx = min(ax, xl - 1)
    cy = min(ay, xl - 1)
    return (int(T.HUFF_CODE[table, cx, cy]), int(T.HUFF_LEN[table, cx, cy]),
            (lx, lin) if ax >= xl - 1 and lin else None,
            (ly, lin) if ay >= xl - 1 and lin else None)


class Granule:
    """One granule-channel's content. Long blocks by default; pass
    ``short=True`` for a window-switching block-type-2 granule whose
    ``scalefac`` is then (3,12) per-window values and ``values`` are the
    pre-reorder (sfb, window, sample) spectra."""

    def __init__(self, values=(), scalefac=(0,) * 21, global_gain=210,
                 table=1, scalefac_compress=0, region0_count=4,
                 region1_count=3, scale_fac_scale=0, preflag=0,
                 short=False, sub_block_gain=(0, 0, 0)):
        self.values = list(values)            # spectral ints from sample 0
        assert len(self.values) % 2 == 0
        self.short = short
        if short:
            sf = np.zeros((3, 12), np.int32)
            arr = np.asarray(scalefac)
            if arr.ndim == 1:
                arr = np.tile(arr[:12], (3, 1))
            sf[:, :arr.shape[-1]] = arr[:, :12]
            self.scalefac = sf
        else:
            self.scalefac = list(scalefac) + [0] * (21 - len(scalefac))
        self.global_gain = global_gain
        self.table = table
        self.sfc = scalefac_compress
        self.r0c = region0_count
        self.r1c = region1_count
        self.sfs = scale_fac_scale
        self.pre = preflag
        self.sbg = list(sub_block_gain)

    def main_bits(self, bw: BitWriter) -> int:
        """Write scalefactors + Huffman data; returns part2_3_length."""
        start = bw.bits_count()
        sl1, sl2 = int(T.SLEN[self.sfc][0]), int(T.SLEN[self.sfc][1])
        if self.short:
            for sfb in range(6):
                for win in range(3):
                    bw.put(int(self.scalefac[win, sfb]), sl1)
            for sfb in range(6, 12):
                for win in range(3):
                    bw.put(int(self.scalefac[win, sfb]), sl2)
            return self._huffman_bits(bw, start)
        for sfb in range(11):
            bw.put(self.scalefac[sfb], sl1)
        for sfb in range(11, 21):
            bw.put(self.scalefac[sfb], sl2)
        return self._huffman_bits(bw, start)

    def _huffman_bits(self, bw: BitWriter, start: int) -> int:
        for i in range(0, len(self.values), 2):
            x, y = self.values[i], self.values[i + 1]
            code, n, lx, ly = _huff_pair_bits(self.table, x, y)
            bw.put(code, n)
            if lx:
                bw.put(lx[0], lx[1])
            if x != 0:
                bw.put(1 if x < 0 else 0, 1)
            if ly:
                bw.put(ly[0], ly[1])
            if y != 0:
                bw.put(1 if y < 0 else 0, 1)
        return bw.bits_count() - start


def build_stream(granules, bitrate=128, samplerate=44100, mode=1,
                 mode_ext=2, n_frames=None):
    """granules: list of frames, each [(gr0_ch0, gr0_ch1), (gr1_ch0,
    gr1_ch1)] -> MP3 bytes. mode 1 = joint stereo; mode_ext bits:
    bit1 (value 2) = MS, bit0 (value 1) = intensity."""
    br_idx = {32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8,
              128: 9, 160: 10, 192: 11, 224: 12, 256: 13, 320: 14}[bitrate]
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[samplerate]
    frame_size = int(144 * bitrate * 1000 / samplerate)   # no padding
    out = bytearray()
    for frame in granules:
        # main data first (to measure part2_3_length), no reservoir
        mbw = BitWriter()
        p23 = [[0, 0], [0, 0]]
        for g in range(2):
            for ch in range(2):
                p23[g][ch] = frame[g][ch].main_bits(mbw)
        mbw.put(0, (8 - mbw.bits_count() % 8) % 8)   # flush to byte boundary
        main = mbw.take_frame()

        bw = BitWriter()
        # header: sync, MPEG-1 layer III, no CRC
        bw.put(0x7FF, 11)
        bw.put(3, 2)          # version 1
        bw.put(1, 2)          # layer III
        bw.put(1, 1)          # no CRC
        bw.put(br_idx, 4)
        bw.put(sr_idx, 2)
        bw.put(0, 1)          # padding
        bw.put(0, 1)          # private
        bw.put(mode, 2)
        bw.put(mode_ext, 2)
        bw.put(0, 2)          # copyright/original
        bw.put(0, 2)          # emphasis
        # side info (stereo, 32 bytes)
        bw.put(0, 9)          # main_data_begin (no reservoir)
        bw.put(0, 3)          # private
        for ch in range(2):
            bw.put(0, 4)      # scfsi
        for g in range(2):
            for ch in range(2):
                gr = frame[g][ch]
                bw.put(p23[g][ch], 12)
                bw.put(len(gr.values) // 2, 9)
                bw.put(gr.global_gain, 8)
                bw.put(gr.sfc, 4)
                if gr.short:
                    bw.put(1, 1)          # window_switching
                    bw.put(2, 2)          # block_type 2
                    bw.put(0, 1)          # mixed_block_flag
                    for _ in range(2):
                        bw.put(gr.table, 5)
                    for w in range(3):
                        bw.put(gr.sbg[w], 3)
                else:
                    bw.put(0, 1)          # window_switching
                    for _ in range(3):
                        bw.put(gr.table, 5)
                    bw.put(gr.r0c, 4)
                    bw.put(gr.r1c, 3)
                bw.put(gr.pre, 1)
                bw.put(gr.sfs, 1)
                bw.put(0, 1)  # count1table_select
        head = bw.take_frame()
        body = head + main
        assert len(body) <= frame_size, (len(body), frame_size)
        out += body + b"\x00" * (frame_size - len(body))
    return bytes(out)
