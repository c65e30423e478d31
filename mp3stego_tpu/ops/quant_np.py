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


def _cost_exact(ix: np.ndarray, addr_in, sr_idx: int, hide=None):
    """calc_run_len -> count1 -> subdivide -> table select -> big-values bits,
    carrying ``addr_in`` as the stale-address state. Returns (bits, GrInfo).
    ``hide`` = (bits_u8, cursor) applies the stego pair transform at the
    granule's pinned embedded-bit cursor (MP3_Encoder.py:1147-1263)."""
    gi = Q.GrInfo()
    gi.address1, gi.address2, gi.address3 = (int(a) for a in addr_in)
    Q.calc_run_len(ix, gi)
    bits = Q.count1_bit_count(ix, gi)
    Q.subdivide(gi, sr_idx)
    _tab_select(ix, gi, hide)
    bits += Q.big_v_bit_count(ix, gi)
    return bits, gi


def _tab_select(ix, gi, hide=None):
    """_big_v_tab_select (MP3_Encoder.py:1147-68); with ``hide`` the chosen
    tables are mapped through IDX_TO_TRANSFORM_HUF by the message bits at the
    pinned cursor (the cursor index advances over nonzero choices within the
    granule, exactly like the reference's idx)."""
    from mp3stego_tpu import tables as T

    def pick(begin, end, idx):
        c = Q.choose_table(ix, begin, end)
        if hide is not None and c > 0:
            bits_u8, cur = hide
            j = cur + idx
            if j < len(bits_u8):
                c = int(T.TRANSFORM_HUF[c, int(bits_u8[j])])
        return c

    idx = 0
    gi.table_select[0] = 0 if gi.address1 <= 0 else \
        pick(0, gi.address1, idx)
    idx += int(gi.table_select[0] > 0)
    gi.table_select[1] = 0 if gi.address2 <= gi.address1 else \
        pick(gi.address1, gi.address2, idx)
    idx += int(gi.table_select[1] > 0)
    gi.table_select[2] = 0 if (gi.big_values << 1) <= gi.address2 else \
        pick(gi.address2, gi.big_values << 1, idx)


def verify_cells_loop(xr_rows: np.ndarray, steps: np.ndarray, sr_idx: int):
    """Per-cell reference twin of :func:`verify_cells` (kept as the oracle for
    its batched rewrite; ~0.8 ms/cell of Python overhead)."""
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


def _quantize_batch(rows: np.ndarray, steps: np.ndarray):
    """Vectorized exact quantize for M (row, step) cells (MP3_Encoder.py:
    373-415): int LUT region + float64 fallback, int32-wrapped bail check.
    Returns (ix (M,576) int32, ix_max (M,), bail (M,) bool)."""
    steps = np.asarray(steps, np.int64)
    scalei = Q.STEPTABI[steps + 127].astype(np.int64)            # (M,)
    labs = np.abs(rows.astype(np.int64))
    xrmax = np.maximum(labs.max(axis=1), 0)
    mr = (xrmax * scalei + 2147483648) >> 32
    mr = ((mr + 2**31) % 2**32) - 2**31                          # mulr wrap
    bail = mr > 165140                                           # 8192**(4/3)
    ln = ((labs * scalei[:, None] + 2147483648) >> 32).astype(np.int32)
    small = ln < 10000
    ix = Q.INT2IDX[np.minimum(ln, 9999)].astype(np.int32)
    if not small.all():
        scale = Q.STEPTAB[steps + 127]                           # (M,) f64
        dbl = np.abs(rows).astype(np.float64) * scale[:, None] \
            * 4.656612875e-10
        ixa = np.sqrt(np.sqrt(dbl) * dbl).astype(np.int32)
        ix = np.where(small, ix, ixa)
    ix_max = np.maximum(ix.max(axis=1), 0)
    return ix, ix_max, bail


def _cost_batch(ix: np.ndarray, sr_idx: int, hide=None):
    """Vectorized exact cost for M granule rows with addr_in == 0: run lengths
    -> count1 -> subdivide -> table select -> bits. NumPy twin of the device
    body (ops/search_plane._cost, itself oracle-verified); direct gathers
    replace the device's one-hot reductions. ``hide`` = (bits_u8, per-cell
    cursors) applies the stego pair transform and re-costs each region under
    its EMITTED table, mirroring the device hide branch. Returns
    (bits (M,), bv (M,))."""
    from mp3stego_tpu import tables as T
    m, _ = ix.shape
    pos = np.arange(576, dtype=np.int32)
    nz = ix != 0
    any_nz = nz.any(axis=1)
    last = np.max(np.where(nz, pos, -1), axis=1)
    i0 = np.where(any_nz, ((last + 2) >> 1) << 1, 0)
    lim = np.max(np.where(ix > 1, pos + 1, 0), axis=1)
    c1 = np.maximum(0, np.minimum((i0 - lim) // 4, i0 // 4))
    bvr = i0 - 4 * c1
    bv = bvr >> 1

    # count1 quads in both alignments (region starts at bvr mod 4)
    def quad_costs(vals):
        sb = (vals != 0).sum(axis=-1).astype(np.int64)
        p = np.clip(vals[..., 0] + (vals[..., 1] << 1)
                    + (vals[..., 2] << 2) + (vals[..., 3] << 3), 0, 15)
        return Q._QLEN0[p] + sb, Q._QLEN1[p] + sb

    qe0, qe1 = quad_costs(ix.reshape(m, 144, 4))
    qo0, qo1 = quad_costs(ix[:, 2:574].reshape(m, 143, 4))
    qidx_e = np.arange(144, dtype=np.int32)
    qidx_o = np.arange(143, dtype=np.int32)
    first_e = bvr >> 2
    first_o = (bvr - 2) >> 2
    me = ((qidx_e[None, :] >= first_e[:, None])
          & (qidx_e[None, :] < first_e[:, None] + c1[:, None]))
    mo = ((qidx_o[None, :] >= first_o[:, None])
          & (qidx_o[None, :] < first_o[:, None] + c1[:, None]))
    even = (bvr & 3) == 0
    sum0 = np.where(even, np.where(me, qe0, 0).sum(axis=1),
                    np.where(mo, qo0, 0).sum(axis=1))
    sum1 = np.where(even, np.where(me, qe1, 0).sum(axis=1),
                    np.where(mo, qo1, 0).sum(axis=1))

    # subdivide (addresses 0 when big_values == 0, matching addr_in == 0)
    band = T.BAND_ALL[sr_idx].astype(np.int64)      # (23,)
    subdv = T.SUBDV_TABLE.astype(np.int64)
    scfb_anz = (band[None, :] < bvr[:, None]).sum(axis=1)
    kmax = (band[None, :] <= bvr[:, None]).sum(axis=1) - 1
    sd = subdv[np.clip(scfb_anz, 0, 22)]
    tc0 = np.maximum(0, np.minimum(sd[:, 0], kmax - 1))
    a1n = band[tc0 + 1]
    tc1 = np.maximum(0, np.minimum(sd[:, 1], kmax - (tc0 + 1) - 1))
    a2n = band[np.clip(tc0 + 1 + tc1 + 1, 0, 22)]
    has_bv = bv > 0
    a1 = np.where(has_bv, a1n, 0)
    a2 = np.where(has_bv, a2n, 0)
    a3 = np.where(has_bv, bvr, 0)

    # per-pair cost channels under the 4 representative tables
    x = ix[:, 0::2].astype(np.int64)
    y = ix[:, 1::2].astype(np.int64)
    xc = np.minimum(x, 15)
    yc = np.minimum(y, 15)
    signs = (x != 0).astype(np.int64) + (y != 0).astype(np.int64)
    nesc = (x > 14).astype(np.int64) + (y > 14).astype(np.int64)
    ch13 = Q._HLEN[13][xc, yc] + signs
    ch15 = Q._HLEN[15][xc, yc] + signs
    ch16 = Q._HLEN[16][xc, yc] + signs
    ch24 = Q._HLEN[24][xc, yc] + signs

    ppos = pos[0::2]
    starts = np.stack([np.zeros_like(a1), a1, a2], axis=-1)      # (M,3)
    ends = np.stack([a1, a2, bvr], axis=-1)
    pm = ((ppos[None, None, :] >= starts[..., None])
          & (ppos[None, None, :] < ends[..., None]))             # (M,3,288)

    def rsum(chan):
        return np.where(pm, chan[:, None, :], 0).sum(axis=-1)

    rc13, rc15, rc16, rc24, rnesc = (rsum(c_) for c_ in
                                     (ch13, ch15, ch16, ch24, nesc))
    sm = ((pos[None, None, :] >= starts[..., None])
          & (pos[None, None, :] < ends[..., None]))
    mreg = np.max(np.where(sm, ix[:, None, :], 0), axis=-1)      # (M,3)

    linmax = T.HUFF_LINMAX.astype(np.int64)
    linbits = T.HUFF_LINBITS.astype(np.int64)
    nl_cost = np.where(rc15 <= rc13, rc15, rc13)
    ixm = mreg - 15
    t16 = 15 + (linmax[None, None, 15:24] < ixm[..., None]).sum(axis=-1)
    t24 = 24 + (linmax[None, None, 24:32] < ixm[..., None]).sum(axis=-1)
    cost16 = np.where(t16 == 15, rc15,
                      rc16 + linbits[np.clip(t16, 0, 31)] * rnesc)
    cost24 = rc24 + linbits[np.clip(t24, 24, 31)] * rnesc
    esc_cost = np.where(cost24 < cost16, cost24, cost16)
    esc_choice = np.where(cost24 < cost16, t24, t16)
    choice = np.where(mreg == 0, 0, np.where(mreg < 15,
                                             np.where(rc15 <= rc13, 15, 13),
                                             esc_choice))
    rcost = np.where(mreg == 0, 0, np.where(mreg < 15, nl_cost, esc_cost))
    active = np.stack([a1 > 0, a2 > a1, bvr > a2], axis=-1)
    choice = np.where(active, choice, 0)

    if hide is not None:
        bits_u8, cursors = hide
        lh = len(bits_u8)
        nzc = choice > 0                                         # (M,3)
        inc0 = nzc[:, 0].astype(np.int64)
        inc1 = inc0 + nzc[:, 1]
        cur = np.asarray(cursors, np.int64)
        idx = np.stack([cur, cur + inc0, cur + inc1], axis=-1)   # (M,3)
        inb = idx < lh
        bit = np.asarray(bits_u8)[np.clip(idx, 0, max(lh - 1, 0))] \
            .astype(np.int64)
        t_new = T.TRANSFORM_HUF[np.clip(choice, 0, 31),
                                np.clip(bit, 0, 1)]
        choice = np.where(nzc & inb, t_new, choice)
        # re-cost each region under its EMITTED table (the device's
        # cost_hide branch): h_len of the emitted table per pair + sign
        # bits, plus its linbits for escape pairs
        t_pp = np.where(pm, choice[:, :, None], 0).sum(axis=1)   # (M,288)
        h_pp = Q._HLEN[t_pp, xc, yc].astype(np.int64)
        rc_t = rsum(h_pp + signs)
        rcost = rc_t + linbits[np.clip(choice, 0, 31)] * rnesc

    rcost = np.where(active & (choice != 0), rcost, 0)
    bits = rcost.sum(axis=-1) + np.minimum(sum0, sum1)
    return bits.astype(np.int64), bv.astype(np.int64)


def verify_cells(xr_rows: np.ndarray, steps: np.ndarray, sr_idx: int):
    """Exact bits for M (row, step) cells; also returns per-cell big_values
    (cells with bv == 0 are address-dependent and cannot be verified without
    the trajectory's address state — callers treat them as mismatches).
    Cells that bail or overflow ixmax report bits=100000, bv=-1.

    Vectorized over cells (one NumPy pass instead of M Python evaluations);
    tests/test_search_plane.py pins equality with :func:`verify_cells_loop`."""
    m = len(steps)
    if m == 0:
        return np.zeros(0, np.int64), np.full(0, -1, np.int64)
    ix, ix_max, bail = _quantize_batch(np.asarray(xr_rows, np.int32), steps)
    bits, bvs = _cost_batch(ix, sr_idx)
    dead = bail | (ix_max > Q.MAX_QUANTIZE_STEP)
    bits = np.where(dead, 100000, bits)
    bvs = np.where(dead, -1, bvs)
    return bits, bvs


def verify_cells_hide(xr_rows: np.ndarray, steps: np.ndarray, sr_idx: int,
                      bits_u8: np.ndarray, cursors: np.ndarray):
    """:func:`verify_cells` with the stego transform applied per cell at the
    cell's lane cursor (parallel-hide mode). Vectorized over cells — the
    per-cell loop (kept below as the oracle) cost ~0.66 ms/cell of Python
    overhead and dominated the capacity-saturated hide's verify pass at
    ~900 cells; tests pin equality with :func:`verify_cells_hide_loop`."""
    m = len(steps)
    if m == 0:
        return np.zeros(0, np.int64), np.full(0, -1, np.int64)
    ix, ix_max, bail = _quantize_batch(np.asarray(xr_rows, np.int32), steps)
    bits, bvs = _cost_batch(ix, sr_idx,
                            hide=(np.asarray(bits_u8),
                                  np.asarray(cursors, np.int64)))
    dead = bail | (ix_max > Q.MAX_QUANTIZE_STEP)
    bits = np.where(dead, 100000, bits)
    bvs = np.where(dead, -1, bvs)
    return bits, bvs


def verify_cells_hide_loop(xr_rows: np.ndarray, steps: np.ndarray,
                           sr_idx: int, bits_u8: np.ndarray,
                           cursors: np.ndarray):
    """Per-cell reference twin of :func:`verify_cells_hide` (the oracle its
    batched rewrite is pinned against)."""
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
        b, gi = _cost_exact(ix, (0, 0, 0), sr_idx,
                            hide=(bits_u8, int(cursors[i])))
        bits[i] = b
        bvs[i] = gi.big_values
    return bits, bvs


def oracle_search(xr_row: np.ndarray, max_bits: int, addr_in, sr_idx: int,
                  hide=None):
    """The reference's full outer loop for one granule, exact on host
    (_bin_search_step_size + _inner_loop, MP3_Encoder.py:933-996,1064-1095).

    :param addr_in: (address1, address2, address3) carried in from the
        previous granule of the same (gr, ch) slot.
    :param hide: optional (bits_u8, cursor) stego transform state with the
        granule's pinned embedded-bit cursor.
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
        bits, gi = _cost_exact(ix, state["addr"], sr_idx, hide)
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
