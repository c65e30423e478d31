"""Exact host twins of the device search: cell evaluation and full-granule
oracle search, in NumPy with the reference's float64 fallback.

Used by models/encoder.py's search-plane path to (a) verify the bits the
device trajectory consumed at float-fallback (``approx``) cells and (b) redo
flagged granules sequentially with true cross-granule address state. Both
reuse ops/quant.py primitives (golden-tested against the reference,
MP3_Encoder.py:373-415,958-996,1064-1095).
"""

import numpy as np

from mp3stego_tpu.ops import quant as Q


def _cost_exact(ix: np.ndarray, addr_in, sr_idx: int):
    """calc_run_len -> count1 -> subdivide -> table select -> big-values bits,
    carrying ``addr_in`` as the stale-address state. Returns (bits, GrInfo)."""
    gi = Q.GrInfo()
    gi.address1, gi.address2, gi.address3 = (int(a) for a in addr_in)
    Q.calc_run_len(ix, gi)
    bits = Q.count1_bit_count(ix, gi)
    Q.subdivide(gi, sr_idx)
    _tab_select(ix, gi)
    bits += Q.big_v_bit_count(ix, gi)
    return bits, gi


def _tab_select(ix, gi):
    """_big_v_tab_select without the stego transform (MP3_Encoder.py:1147-68)."""
    gi.table_select[0] = 0 if gi.address1 <= 0 else \
        Q.choose_table(ix, 0, gi.address1)
    gi.table_select[1] = 0 if gi.address2 <= gi.address1 else \
        Q.choose_table(ix, gi.address1, gi.address2)
    gi.table_select[2] = 0 if (gi.big_values << 1) <= gi.address2 else \
        Q.choose_table(ix, gi.address2, gi.big_values << 1)


def verify_cells(xr_rows: np.ndarray, steps: np.ndarray, sr_idx: int):
    """Exact bits for M (row, step) cells; also returns per-cell big_values
    (cells with bv == 0 are address-dependent and cannot be verified without
    the trajectory's address state — callers treat them as mismatches).
    Cells that bail or overflow ixmax report bits=100000, bv=-1."""
    m = len(steps)
    bits = np.zeros(m, np.int64)
    bvs = np.full(m, -1, np.int64)
    for i in range(m):
        row = xr_rows[i]
        xrabs = np.abs(row)
        xrmax = int(max(0, xrabs.max()))
        ix, ix_max = Q.quantize(row, xrabs, xrmax, int(steps[i]))
        if ix_max > Q.MAX_QUANTIZE_STEP:
            bits[i] = 100000
            continue
        b, gi = _cost_exact(ix, (0, 0, 0), sr_idx)
        bits[i] = b
        bvs[i] = gi.big_values
    return bits, bvs


def oracle_search(xr_row: np.ndarray, max_bits: int, addr_in, sr_idx: int):
    """The reference's full outer loop for one granule, exact on host
    (_bin_search_step_size + _inner_loop, MP3_Encoder.py:933-996,1064-1095).

    :param addr_in: (address1, address2, address3) carried in from the
        previous granule of the same (gr, ch) slot.
    :return: dict with step, bits, big_values, count1, addresses, region
        counts, table_select, count1table_select and the signed ix row.
    """
    xrabs = np.abs(xr_row)
    xrmax = int(max(0, xrabs.max()))
    state = dict(addr=tuple(int(a) for a in addr_in), gi=None, ix=None)

    def evaluate(step):
        ix, ix_max = Q.quantize(xr_row, xrabs, xrmax, step)
        if ix_max > Q.MAX_QUANTIZE_STEP:
            return 100000
        bits, gi = _cost_exact(ix, state["addr"], sr_idx)
        state["addr"] = (gi.address1, gi.address2, gi.address3)
        state["gi"] = gi
        state["ix"] = ix
        return bits

    # bisection (MP3_Encoder.py:958-996)
    nxt, count = -120, 120
    while True:
        half = count // 2
        bits = evaluate(nxt + half)
        if bits < max_bits:
            count = half
        else:
            nxt += half
            count -= half
        if count <= 1:
            break
    step = nxt

    huff_bits = max_bits  # part2_length == 0 (slen tables start at 0)
    if huff_bits < 0:
        step -= 1
    while True:
        while True:
            _, ix_max = Q.quantize(xr_row, xrabs, xrmax, step + 1)
            if ix_max <= Q.MAX_QUANTIZE_STEP:
                break
            step += 1
        step += 1
        bits = evaluate(step)
        if bits <= huff_bits:
            break

    gi = state["gi"]
    ix = state["ix"]
    ix_signed = np.where((xr_row < 0) & (ix > 0), -ix, ix)
    return dict(step=step, bits=bits, bv=gi.big_values, c1=gi.count1,
                a1=gi.address1, a2=gi.address2, a3=gi.address3,
                r0c=gi.region0_count, r1c=gi.region1_count,
                ch=tuple(int(t) for t in gi.table_select),
                cts=gi.count1table_select,
                ix=ix_signed.astype(np.int16))
