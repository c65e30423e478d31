#!/usr/bin/env python
"""Cross-verify the committed ISO scalefactor band tables against the tables
embedded in the system libmpg123 binary.

libmpg123 (an independent production decoder) compiles the ISO band tables
into a static ``bandInfoStruct bandInfo[9]`` array::

    struct bandInfoStruct {
      unsigned short longIdx[23];
      unsigned char  longDiff[22];
      unsigned short shortIdx[14];
      unsigned char  shortDiff[13];
    };                                   // 109 bytes, padded to 110

The array is located in .rodata by scanning for the (unambiguous) 44.1 kHz
longDiff byte pattern, which is independently known from the MPEG-1 decoder
tables this framework already cross-verifies against spec formulas. Row
order: 44.1k, 48k, 32k, 22.05k, 24k, 16k, 11.025k, 12k, 8k — the same order
as mp3stego_tpu.tables.BAND_INDEX_ISO.

Exit 0 when every row of BAND_INDEX_ISO and BAND_WIDTH_SHORT_ISO matches the
binary, plus a report of where the reference's SCALE_FACT_BAND_INDEX
deviates (expected: exactly the two 16 kHz typos).
"""

import glob
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_KEY_44K_LONGDIFF = bytes(
    [4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24, 28, 34, 42, 50, 54,
     76, 158])
_ROW_BYTES = 110


def find_lib() -> str:
    pats = ["/usr/lib/*/libmpg123.so*", "/usr/lib/libmpg123.so*",
            "/usr/local/lib/libmpg123.so*"]
    for p in pats:
        hits = [h for h in glob.glob(p) if not h.endswith(".la")]
        if hits:
            return sorted(hits)[-1]
    raise FileNotFoundError("libmpg123 not found")


def extract_bands(path: str):
    """-> (long_idx (9,23), short_widths (9,13)) from the binary."""
    data = open(path, "rb").read()
    i = data.find(_KEY_44K_LONGDIFF)
    if i < 0:
        raise ValueError("44.1 kHz longDiff pattern not found")
    if data.find(_KEY_44K_LONGDIFF, i + 1) >= 0:
        raise ValueError("44.1 kHz longDiff pattern is ambiguous")
    base = i - 46                      # longDiff sits after longIdx[23]
    long_idx = np.zeros((9, 23), np.int32)
    short_w = np.zeros((9, 13), np.int32)
    for r in range(9):
        off = base + r * _ROW_BYTES
        long_idx[r] = struct.unpack_from("<23H", data, off)
        short_idx = struct.unpack_from("<14H", data, off + 68)
        short_w[r] = struct.unpack_from("<13B", data, off + 96)
        # internal consistency of the struct decode itself
        assert long_idx[r, 0] == 0 and long_idx[r, 22] == 576, r
        assert short_idx[0] == 0 and short_idx[13] == 576, r
        assert (np.diff(short_idx) == 3 * short_w[r]).all(), r
        ld = struct.unpack_from("<22B", data, off + 46)
        assert (np.diff(long_idx[r]) == ld).all(), r
    return long_idx, short_w


def main() -> int:
    from mp3stego_tpu import tables as T
    lib = find_lib()
    long_idx, short_w = extract_bands(lib)
    ok = True
    if not (long_idx == T.BAND_INDEX_ISO).all():
        print("MISMATCH: BAND_INDEX_ISO vs", lib)
        print(np.argwhere(long_idx != T.BAND_INDEX_ISO))
        ok = False
    if not (short_w == T.BAND_WIDTH_SHORT_ISO).all():
        print("MISMATCH: BAND_WIDTH_SHORT_ISO vs", lib)
        print(np.argwhere(short_w != T.BAND_WIDTH_SHORT_ISO))
        ok = False
    ref_diff = np.argwhere(long_idx != T.SCALE_FACT_BAND_INDEX)
    print(f"verified against {lib}")
    print(f"BAND_INDEX_ISO: {'OK' if ok else 'MISMATCH'} (9x23)")
    print(f"BAND_WIDTH_SHORT_ISO: {'OK' if ok else 'MISMATCH'} (9x13)")
    expected = [[4, 18], [5, 8], [5, 17]]
    print("reference SCALE_FACT_BAND_INDEX deviations from ISO:",
          ref_diff.tolist(),
          f"(expected {expected} — the 24 kHz ecosystem divergence and the "
          "two 16 kHz typos)")
    return 0 if ok and ref_diff.tolist() == expected else 1


if __name__ == "__main__":
    sys.exit(main())
