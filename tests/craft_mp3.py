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
from mp3stego_tpu.bitstream import decoder_host as dh
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


def lsf_sfc(s1=0, s2=0, s3=0, s4=0):
    """Compose a normal-channel LSF scalefac_compress (class 0, sfc < 400)
    from four slen values (s1,s2 < 5; s3,s4 < 4)."""
    assert s1 < 5 and s2 < 5 and s3 < 4 and s4 < 4
    return ((s1 * 5 + s2) << 4) | (s3 << 2) | s4


def lsf_sfc_is(s1=0, s2=0, s3=0, cls=0, scale=0):
    """Compose an intensity-channel LSF scalefac_compress: int_sfc packs the
    slen triple per class (0: <180, 1: 180.., 2: 244..), the LSB is
    intensity_scale."""
    if cls == 0:
        assert s1 < 5 and s2 < 6 and s3 < 6
        n = s1 * 36 + s2 * 6 + s3
    elif cls == 1:
        assert max(s1, s2, s3) < 4
        n = 180 + s1 * 16 + s2 * 4 + s3
    else:
        assert s1 < 4 and s2 < 3 and s3 == 0
        n = 244 + s1 * 3 + s2
    return n * 2 + scale


class Granule:
    """One granule-channel's content. Long blocks by default; pass
    ``short=True`` for a window-switching block-type-2 granule whose
    ``scalefac`` is then (3,12) per-window values and ``values`` are the
    pre-reorder (sfb, window, sample) spectra. ``lsf=True`` writes the
    MPEG-2/2.5 scalefactor layout (9-bit scalefac_compress; partitions from
    the decoder's class tables), ``i_stereo=True`` the intensity-channel
    variant (ISO 13818-3)."""

    def __init__(self, values=(), scalefac=(0,) * 21, global_gain=210,
                 table=1, scalefac_compress=0, region0_count=4,
                 region1_count=3, scale_fac_scale=0, preflag=0,
                 short=False, sub_block_gain=(0, 0, 0),
                 lsf=False, i_stereo=False, mixed=False,
                 scalefac_long=(0,) * 8):
        self.lsf = lsf
        self.i_stereo = i_stereo
        self.values = list(values)            # spectral ints from sample 0
        assert len(self.values) % 2 == 0
        self.mixed = mixed                    # block_type 2 + mixed_block_flag
        if mixed:
            short = True
            # long scalefactor prefix: bands 0..7 (MPEG-1) / 0..5 (LSF);
            # the short array's bands 0..2 are then never transmitted
            self.scalefac_long = list(scalefac_long) + [0] * 8
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
        if self.lsf:
            return self._main_bits_lsf(bw)
        start = bw.bits_count()
        sl1, sl2 = int(T.SLEN[self.sfc][0]), int(T.SLEN[self.sfc][1])
        if self.short:
            if self.mixed:
                for sfb in range(8):
                    bw.put(int(self.scalefac_long[sfb]), sl1)
                for sfb in range(3, 6):
                    for win in range(3):
                        bw.put(int(self.scalefac[win, sfb]), sl1)
            else:
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

    def _main_bits_lsf(self, bw: BitWriter) -> int:
        start = bw.bits_count()
        if self.i_stereo:
            slen, cls = dh._lsf_slen_is(self.sfc)
            if self.mixed:
                nr = dh._LSF_NR_MIXED_IS[cls]
            else:
                nr = (dh._LSF_NR_SHORT_IS if self.short
                      else dh._LSF_NR_LONG_IS)[cls]
        else:
            slen, cls, _pre = dh._lsf_slen(self.sfc)
            if self.mixed:
                nr = dh._LSF_NR_MIXED[cls]
            else:
                nr = (dh._LSF_NR_SHORT if self.short
                      else dh._LSF_NR_LONG)[cls]
        if self.mixed:     # 6 long bands, then (sfb, window) from band 3
            vals = [int(self.scalefac_long[sfb]) for sfb in range(6)] + \
                [int(self.scalefac[win, sfb])
                 for sfb in range(3, 12) for win in range(3)]
        elif self.short:   # (sfb, window)-major linear transmission order
            vals = [int(self.scalefac[win, sfb])
                    for sfb in range(12) for win in range(3)]
        else:
            vals = [int(v) for v in self.scalefac[:21]]
        k = 0
        for g in range(4):
            for _ in range(nr[g]):
                assert vals[k] < (1 << slen[g]) or slen[g] == 0, \
                    (k, vals[k], slen[g])
                bw.put(vals[k], slen[g])
                k += 1
        assert k == len(vals), (k, len(vals))
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
        main = mbw.take_all()

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
                    bw.put(1 if gr.mixed else 0, 1)   # mixed_block_flag
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
        head = bw.take_all()
        body = head + main
        assert len(body) <= frame_size, (len(body), frame_size)
        out += body + b"\x00" * (frame_size - len(body))
    return bytes(out)


def build_stream_lsf(frames, bitrate=64, samplerate=22050, mode=1,
                     mode_ext=2):
    """LSF (MPEG-2/2.5) builder: frames is a list of (ch0, ch1) Granule
    pairs (one granule per frame); granules must be built with ``lsf=True``
    (and ``i_stereo=True`` on ch1 when mode_ext bit0 is set). mode_ext
    bits as in build_stream: bit1 (value 2) = MS, bit0 (value 1) =
    intensity."""
    br_idx = {8: 1, 16: 2, 24: 3, 32: 4, 40: 5, 48: 6, 56: 7, 64: 8,
              80: 9, 96: 10, 112: 11, 128: 12, 144: 13, 160: 14}[bitrate]
    if samplerate in (22050, 24000, 16000):
        version_bits = 2
        sr_idx = {22050: 0, 24000: 1, 16000: 2}[samplerate]
    else:
        version_bits = 0    # MPEG-2.5
        sr_idx = {11025: 0, 12000: 1, 8000: 2}[samplerate]
    frame_size = 72 * bitrate * 1000 // samplerate   # no padding
    out = bytearray()
    for c0, c1 in frames:
        mbw = BitWriter()
        p23 = [g.main_bits(mbw) for g in (c0, c1)]
        mbw.put(0, (8 - mbw.bits_count() % 8) % 8)
        main = mbw.take_all()

        bw = BitWriter()
        bw.put(0x7FF, 11)
        bw.put(version_bits, 2)
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
        # LSF side info (stereo, 17 bytes): 8-bit mdb, 2 private bits,
        # NO scfsi, one granule, 9-bit scalefac_compress, no preflag bit
        bw.put(0, 8)
        bw.put(0, 2)
        for g in (c0, c1):
            bw.put(p23[0] if g is c0 else p23[1], 12)
            bw.put(len(g.values) // 2, 9)
            bw.put(g.global_gain, 8)
            bw.put(g.sfc, 9)
            if g.short:
                bw.put(1, 1)          # window_switching
                bw.put(2, 2)          # block_type 2
                bw.put(1 if g.mixed else 0, 1)   # mixed_block_flag
                for _ in range(2):
                    bw.put(g.table, 5)
                for w in range(3):
                    bw.put(g.sbg[w], 3)
            else:
                bw.put(0, 1)
                for _ in range(3):
                    bw.put(g.table, 5)
                bw.put(g.r0c, 4)
                bw.put(g.r1c, 3)
            bw.put(g.sfs, 1)
            bw.put(0, 1)  # count1table_select
        head = bw.take_all()
        body = head + main
        assert len(body) <= frame_size, (len(body), frame_size)
        out += body + b"\x00" * (frame_size - len(body))
    return bytes(out)
