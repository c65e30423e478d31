"""On-device Huffman sample decode: the variable-length bit-scan as a batched
jitted program (SURVEY.md §7.3 "plan B").

The reference's hottest loop (decoder/Frame.py:443-559) walks each granule's
main-data bits sequentially. The symbol stream is irregular, but the scan
carries only (bit cursor, sample cursor) and every granule is independent — so
the whole file decodes as ONE `lax.fori_loop` over symbol slots, vmapped
implicitly across granules: step k decodes the k-th big-values pair (or later
the k-th count1 quad) of EVERY granule at once, with lanes masked off as their
granule finishes.

Two structural optimizations over the naive lockstep scan (which cost ~1 ms
per step, gather-bound):

* **register-resident bit cache** — each lane carries a 64-bit cache of
  upcoming bits (+ valid count + next-word index), refilled 32 bits at a
  time. All peeks (codeword, linbits, signs) become register shifts; only
  the refills (<= 3/pair) and the codeword LUT lookup (1/pair) remain as
  per-lane gathers — the round-2 version issued ~11 gathers per pair.
* **symbol unrolling** — ``_UNROLL`` symbols decode per loop step (the
  chained cursor math is identical, traced inline), shrinking the
  sequential loop from 288+144 to 36+18 steps
  (MP3STEGO_TPU_HUF_UNROLL overrides; must divide 288 and 144).

The host still assembles the bit-reservoir main_data windows (byte juggling,
decoder_host.assemble_main_data) and unpacks scalefactors (tiny); this kernel
replaces the per-sample symbol scan, so the device input is the packed
main_data itself (~audio bitrate) instead of the unpacked sample plane.

Used when MP3STEGO_TPU_DEVICE_HUFFMAN=1 (decode_pcm float32 path); the C++
host parser remains the default and the parity oracle. Outputs are identical
(tests/test_huffman_device.py); the measured throughput vs the host parser
is recorded by bench.py every round.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from mp3stego_tpu import tables as T

_LUT_BITS = T.LUT_BITS  # 19
_UNROLL = int(os.environ.get("MP3STEGO_TPU_HUF_UNROLL", "8"))
if 288 % _UNROLL or 144 % _UNROLL:
    raise ValueError(
        f"MP3STEGO_TPU_HUF_UNROLL={_UNROLL} must divide 288 and 144 "
        "(otherwise the tail symbols of every granule would be dropped)")


@functools.lru_cache(maxsize=1)
def _device_tables():
    books = sorted({int(b) for b in T.DEC_CODEBOOK_OF if b != 0})
    row_of = {b: i for i, b in enumerate(books)}
    luts = np.zeros((len(books), 1 << _LUT_BITS), dtype=np.int32)
    for b in books:
        luts[row_of[b]] = T.dec_lut(b)
    # -1 sentinel: unused codebooks (table ids 0/4/14) decode as skip
    book_row = np.array([row_of.get(int(b), -1) if i not in (0, 4, 14) else -1
                         for i, b in enumerate(T.DEC_CODEBOOK_OF)],
                        dtype=np.int32)
    return (luts, book_row, T.DEC_LINBITS.astype(np.int32),
            T.DEC_MAXVAL.astype(np.int32), T.QUAD_LUT.astype(np.int32))


# ----------------------------------------------------------- bit-cache reader
#
# Per-lane state: cache (uint64, upcoming bits left-aligned at bit 63, the
# bits below the valid region are ZERO), nbits (valid bits), wpos (next
# 32-bit word to load), bit (absolute cursor — kept as pure arithmetic for
# the max_bit budget checks). Reads past the stream end see zeros, matching
# _MainDataBits semantics (the packed buffers carry >= 4 zero pad words and
# the word index clips to the last, zero, word).


def _cache_init(words, start_bit):
    """Initialize the cache at per-lane absolute bit offsets."""
    wmax = words.shape[-1] - 1
    w = jnp.clip(start_bit >> 5, 0, wmax).astype(jnp.int32)
    off = (start_bit & 31).astype(jnp.uint64)
    hi = jnp.take_along_axis(words, w[..., None], axis=-1)[..., 0]
    lo = jnp.take_along_axis(words, jnp.minimum(w + 1, wmax)[..., None],
                             axis=-1)[..., 0]
    wide = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    cache = wide << off
    nbits = (jnp.int32(64) - (start_bit & 31)).astype(jnp.int32)
    return cache, nbits, (w + 2).astype(jnp.int32)


def _refill(words, cache, nbits, wpos):
    """One conditional 32-bit refill (a single per-lane gather).

    Invariant maintained: nbits > 32 on return, so a following codeword
    peek (19) + one value's linbits (<= 13) + sign (1) never underflows
    before the next refill point."""
    wmax = words.shape[-1] - 1
    need = nbits <= 32
    w = jnp.take_along_axis(words, jnp.clip(wpos, 0, wmax)[..., None],
                            axis=-1)[..., 0].astype(jnp.uint64)
    sh = jnp.clip(32 - nbits, 0, 63).astype(jnp.uint64)
    cache = jnp.where(need, cache | (w << sh), cache)
    nbits = jnp.where(need, nbits + 32, nbits)
    wpos = jnp.where(need, wpos + 1, wpos)
    return cache, nbits, wpos


def _peek(cache, n: int):
    """Top n (static) bits of the cache."""
    return (cache >> jnp.uint64(64 - n)).astype(jnp.int32)


def _consume(cache, nbits, bit, k):
    """Drop k (traced, per-lane, >= 0) bits."""
    cache = cache << jnp.clip(k, 0, 63).astype(jnp.uint64)
    return cache, nbits - k, bit + k


@functools.partial(jax.jit, static_argnames=())
def decode_samples_device(words, start_bit, max_bit, region0, region1, big2,
                          ts, c1sel):
    """Batched Huffman sample decode.

    words   (G, W) uint32  — big-endian packed main_data bits per granule,
                             zero-padded (>= 4 pad words)
    start_bit (G,) int32   — first sample bit (after scalefactors)
    max_bit (G,) int32     — start + part2_3_length
    region0/region1 (G,)   — region boundaries in samples
    big2    (G,) int32     — big_values * 2 (clamped to 576)
    ts      (G, 3) int32   — table_select per region
    c1sel   (G,) int32     — count1 table select
    -> (G, 576) int32 sample values
    """
    luts_np, book_row_np, linbits_np, maxval_np, quad_np = _device_tables()
    luts_flat = jnp.asarray(luts_np.reshape(-1))
    book_row = jnp.asarray(book_row_np)
    linbits_t = jnp.asarray(linbits_np)
    maxval_t = jnp.asarray(maxval_np)
    quad_lut = jnp.asarray(quad_np)

    g = words.shape[0]
    rows = jnp.arange(g)
    out0 = jnp.zeros((g, 576), jnp.int32)
    cache0, nbits0, wpos0 = _cache_init(words, start_bit)

    # ---------------- phase 1: big-values pairs (288 slots max)
    def one_pair(k, st):
        cache, nbits, wpos, bit, out = st
        cache, nbits, wpos = _refill(words, cache, nbits, wpos)
        sample = jnp.int32(2 * k)
        active = sample < big2
        table = jnp.where(sample < region0, ts[:, 0],
                          jnp.where(sample < region1, ts[:, 1], ts[:, 2]))
        book = book_row[jnp.clip(table, 0, 31)]
        decodable = active & (table != 0) & (book >= 0)

        idx = _peek(cache, _LUT_BITS)
        # flat single-element gather (2D fancy indexing would materialize a
        # (G, 2^19) row gather and OOM at scale)
        packed = luts_flat[jnp.maximum(book, 0) * (1 << _LUT_BITS) + idx]
        size = packed & 31
        hit = decodable & (size > 0)   # size==0: corrupt stream, skip pair
        cache, nbits, bit = _consume(cache, nbits, bit,
                                     jnp.where(hit, size, 0))

        vx = packed >> 9
        vy = (packed >> 5) & 15
        lb = linbits_t[jnp.clip(table, 0, 31)]
        mv = maxval_t[jnp.clip(table, 0, 31)]

        def read_value(v, cache, nbits, wpos, bit):
            cache, nbits, wpos = _refill(words, cache, nbits, wpos)
            esc = hit & (lb != 0) & (v == mv - 1)
            linbit = jnp.where(esc, _peek(cache, 16) >> (16 - lb), 0)
            cache, nbits, bit = _consume(cache, nbits, bit,
                                         jnp.where(esc, lb, 0))
            signed = hit & (v > 0)
            neg = jnp.where(signed, _peek(cache, 1), 0)
            cache, nbits, bit = _consume(cache, nbits, bit,
                                         jnp.where(signed, 1, 0))
            val = jnp.where(neg > 0, -(v + linbit), v + linbit)
            return jnp.where(hit, val, 0), cache, nbits, wpos, bit

        v0, cache, nbits, wpos, bit = read_value(vx, cache, nbits, wpos, bit)
        v1, cache, nbits, wpos, bit = read_value(vy, cache, nbits, wpos, bit)
        out = out.at[rows, jnp.minimum(sample, 574)].set(
            jnp.where(hit, v0, out[rows, jnp.minimum(sample, 574)]))
        out = out.at[rows, jnp.minimum(sample + 1, 575)].set(
            jnp.where(hit, v1, out[rows, jnp.minimum(sample + 1, 575)]))
        return cache, nbits, wpos, bit, out

    def pair_step(j, st):
        for u in range(_UNROLL):
            st = one_pair(j * _UNROLL + u, st)
        return st

    st = jax.lax.fori_loop(0, 288 // _UNROLL, pair_step,
                           (cache0, nbits0, wpos0, start_bit, out0))
    cache, nbits, wpos, bit, out = st

    # ---------------- phase 2: count1 quads; each lane has its own sample
    # cursor (= big2 + 4*q) and stops at max_bit or sample+4 >= 576
    def one_quad(q, st):
        cache, nbits, wpos, bit, out = st
        cache, nbits, wpos = _refill(words, cache, nbits, wpos)
        sample = big2 + 4 * q
        active = (bit < max_bit) & (sample + 4 < 576)

        use_b = c1sel == 1
        bsv = _peek(cache, 4)
        vals_b = jnp.stack([1 - ((bsv >> 3) & 1), 1 - ((bsv >> 2) & 1),
                            1 - ((bsv >> 1) & 1), 1 - (bsv & 1)], axis=-1)
        qidx = _peek(cache, 6)
        qpacked = quad_lut[qidx]
        qsize = qpacked & 31
        p = qpacked >> 5
        vals_a = jnp.stack([(p >> 3) & 1, (p >> 2) & 1, (p >> 1) & 1, p & 1],
                           axis=-1)
        vals = jnp.where(use_b[..., None], vals_b, vals_a)
        cache, nbits, bit = _consume(
            cache, nbits, bit,
            jnp.where(active, jnp.where(use_b, 4, qsize), 0))

        # up to 4 sign bits off the (just-refilled, > 32-bit) cache
        def sign_one(i, st2):
            cache, nbits, bit, vals = st2
            v = vals[:, i]
            signed = active & (v > 0)
            neg = jnp.where(signed, _peek(cache, 1), 0)
            cache, nbits, bit = _consume(cache, nbits, bit,
                                         jnp.where(signed, 1, 0))
            vals = vals.at[:, i].set(jnp.where(neg > 0, -v, v))
            return cache, nbits, bit, vals

        cache, nbits, bit, vals = jax.lax.fori_loop(
            0, 4, sign_one, (cache, nbits, bit, vals))
        for i in range(4):
            pos = jnp.minimum(sample + i, 575)
            out = out.at[rows, pos].set(
                jnp.where(active, vals[:, i], out[rows, pos]))
        return cache, nbits, wpos, bit, out

    def quad_step(j, st):
        for u in range(_UNROLL):
            st = one_quad(j * _UNROLL + u, st)
        return st

    st = jax.lax.fori_loop(0, 144 // _UNROLL, quad_step,
                           (cache, nbits, wpos, bit, out))
    return st[4]


# ----------------------------------------------------------------- host glue


def pack_descriptors(descriptors: list) -> dict:
    """Pack parse_mp3_light descriptors into device arrays. main_data bytes
    become big-endian uint32 words with >= 4 zero pad words (bit reads can
    overshoot max_bit by a codeword + linbits + signs)."""
    g = len(descriptors)
    wmax = max(1, max((len(d["md"]) + 3) // 4 for d in descriptors)) + 4
    words = np.zeros((g, wmax), dtype=np.uint32)
    for i, d in enumerate(descriptors):
        md = d["md"]
        pad = (-len(md)) % 4
        arr = np.frombuffer(md + b"\x00" * pad, dtype=">u4")
        words[i, :len(arr)] = arr
    return dict(
        words=words,
        start_bit=np.array([d["start_bit"] for d in descriptors], np.int32),
        max_bit=np.array([d["max_bit"] for d in descriptors], np.int32),
        region0=np.array([d["region0"] for d in descriptors], np.int32),
        region1=np.array([d["region1"] for d in descriptors], np.int32),
        big2=np.array([d["big2"] for d in descriptors], np.int32),
        ts=np.stack([d["ts"] for d in descriptors]).astype(np.int32),
        c1sel=np.array([d["c1sel"] for d in descriptors], np.int32),
    )


def decode_raw_device(descriptors: list):
    """parse_mp3_light descriptors -> device-resident (2ch, T, 576) int32 raw
    sample plane (the drop-in for prep['raw_dense'])."""
    pk = pack_descriptors(descriptors)
    raw = decode_samples_device(
        jnp.asarray(pk["words"]), jnp.asarray(pk["start_bit"]),
        jnp.asarray(pk["max_bit"]), jnp.asarray(pk["region0"]),
        jnp.asarray(pk["region1"]), jnp.asarray(pk["big2"]),
        jnp.asarray(pk["ts"]), jnp.asarray(pk["c1sel"]))
    t = raw.shape[0] // 2
    return raw.reshape(t, 2, 576).transpose(1, 0, 2)


def decode_pcm_i16_device(file_data: bytes, offset: int = 0):
    """Full decode with the Huffman bit-scan ON DEVICE, fused with the WAV
    int16 conversion (models/decoder.py's float32 path when the native host
    parser is unavailable). Returns (int16 interleaved PCM, ParsedMP3)."""
    import jax

    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp
    from mp3stego_tpu.utils.transfer import fetch_pieces

    parsed, descriptors = dh.parse_mp3_light(file_data, offset)
    if parsed.num_frames == 0:
        return np.zeros((0, 2), np.int16), parsed
    raw_dev = decode_raw_device(descriptors)       # (2, T, 576) resident

    prep = dp.host_prepare(parsed)                 # raw fields unused
    t = raw_dev.shape[1]
    t_pad = -(-t // dp._DEC_BUCKET) * dp._DEC_BUCKET
    if t_pad != t:
        prep = dp._pad_prep_granules(prep, t_pad)
        raw_dev = jnp.pad(raw_dev, ((0, 0), (0, t_pad - t), (0, 0)))
    args = {k: jnp.asarray(prep[k]) for k in dp.ALL_KEYS
            if k not in ("raw_i8",) + dp.EXC_KEYS}
    args["raw_dense"] = raw_dev
    out = dp._decode_granules_i16(args, wrap=T.ref_pcm_wrap())
    pcm = fetch_pieces([out.reshape(2 * t_pad, 576)])[0] \
        .reshape(2, t_pad, 576)[:, :t]
    ch = parsed.header.channels
    inter = pcm[:ch].transpose(1, 2, 0).reshape(t * 576, ch)
    _ = jax
    return dp._finish_inter(parsed, inter), parsed


def decode_pcm_device(file_data: bytes, offset: int = 0):
    """Full decode with the Huffman bit-scan ON DEVICE: host does only the
    sync walk, side info, reservoir splice and scalefactors. Returns
    (interleaved PCM float32 ndarray, ParsedMP3)."""
    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp

    parsed, descriptors = dh.parse_mp3_light(file_data, offset)
    if parsed.num_frames == 0:
        return np.zeros((0, 2), np.float32), parsed
    raw_dev = decode_raw_device(descriptors)       # stays on device

    prep = dp.host_prepare(parsed)                 # raw fields unused
    args = {k: jnp.asarray(prep[k]) for k in dp.ALL_KEYS
            if k not in ("raw_i8",) + dp.EXC_KEYS}
    args["raw_dense"] = raw_dev
    pcm = np.asarray(dp.decode_granules(args, dtype_name="float32"))
    ch = parsed.header.channels
    t = pcm.shape[1]
    inter = pcm[:ch].transpose(1, 2, 0).reshape(t * 576, ch)
    return dp._finish_inter(parsed, inter), parsed
