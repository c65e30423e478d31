"""Bounded-memory streaming decode for long files (VERDICT r2 item 5).

The whole-file decode path materializes the full parsed stream —
``raw_samples (F, 2, 2, 576) int32`` plus side-info planes — before the
numeric plane runs (~2.5 GB for an hour of audio). The MP3 format's carries
are all short-range, so a windowed decode is exact:

* **bit reservoir**: a granule's main data reaches back at most 9 frames —
  by the reference's own fixed window (``NUM_PREV_FRAMES = 9``,
  decoder/Frame.py:9,306-356), which is therefore also the exactness bound;
* **numeric plane**: granule G's PCM needs the IMDCT overlap tail of G-1
  (a function of G-1's raw samples alone) and the synthesis FIR's 15
  V sub-steps, which reach into G-1's IMDCT output = G-2's raw samples
  (parallel/frame_shard.py exploits the same bound for mesh sharding);
* **scfsi**: scalefactor reuse is gr0 -> gr1 within one frame.

So each chunk of frames is parsed and decoded with ``_WARMUP`` extra leading
frames whose output is discarded, and the results are byte-identical to the
whole-file path (pinned by tests/test_streaming.py). MPEG-2/2.5 (LSF)
streams work too: windows are counted in REAL frames (576 samples each) and
every window re-derives its own virtual-frame packing. Peak memory is
O(chunk): ~(chunk+10) * 9.2 kB of parse planes (raw_samples int32 dominates
at 4.6 kB/frame) + chunk * 4.6 kB of int16 PCM, roughly twice over across
the parse/marshal/free cycle because the import-time mallopt tuning keeps
freed pages on the heap — measured +93 MB peak RSS over import baseline at
the default chunk of 1024 frames (~27 s of 44.1 kHz audio) on a 30-minute
stream, independent of file length (the input rides an mmap and consumed
pages are madvise-dropped, mirroring the encode twin). The window re-decode
overhead is ~1% (10 warm-up frames per 1024); chunk 4096 is ~9% faster on
short-frame streams but peaks ~+215 MB.
"""

import mmap

import numpy as np

from mp3stego_tpu.bitstream import decoder_host as dh
from mp3stego_tpu.bitstream.id3 import parse_id3
from mp3stego_tpu.utils.wav import wav_header

# 9 reservoir frames + 1 frame (2 granules) for the plane's overlap/V carries
_WARMUP = dh.NUM_PREV_FRAMES + 1


def decode_file_streaming(file_path: str, wav_path: str,
                          chunk_frames: int = 1024,
                          progress_cb=None) -> dict:
    """Decode an MP3 file to WAV in O(chunk) memory; output bytes identical
    to the whole-file ``Decoder`` float64 path.

    :param chunk_frames: frames decoded per window (default 1024 ~ 27 s of
        44.1 kHz audio ~ +93 MB peak RSS; ~1% warm-up re-decode overhead).
    :param progress_cb: optional ``cb(frames_done, frames_total)``.
    :return: dict with ``bitrate`` (kbps), ``num_frames``, ``stego_bits``
        (the hidden-bit string, so reveal works without a second pass).
    """
    from mp3stego_tpu.ops import decode_plane as dp

    with open(file_path, "rb") as f:
        try:
            data = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        except (ValueError, OSError):   # empty file or odd fs: read fully
            data = f.read()

    # the skip offset comes from the fixed-position syncsafe size fields, so
    # a bounded prefix is enough (the tag-frame walk is only for METADATA)
    id3 = parse_id3(bytes(data[:min(len(data), 1 << 20)]))
    offset = id3.offset if id3.is_valid else 0

    frames, end_byte, first_h, dup = dh.walk_frames(data, offset)
    total = len(frames)
    if total == 0:
        raise ValueError(f"{file_path}: no MP3 frames found")
    offsets = np.fromiter((fr[0] for fr in frames), np.int64, total)
    first_size = frames[0][2]
    del frames          # ~150 B/frame of tuples; hours-long files add up
    sr = first_h.sampling_rate
    channels = first_h.channels
    lsf = first_h.mpeg_version != 1
    spf = first_h.frame_samples            # 1152 (MPEG-1) / 576 (LSF)

    # Xing/Info/VBRI tag frame: window 0's parse drops its silence inside
    # _finish_inter; the WAV header must account for it up front
    from mp3stego_tpu.bitstream import vbr
    tag = vbr.parse_vbr_tag(bytes(data[offset:offset + first_size]), 0)
    skip = 1 if (tag is not None and not vbr.keep_tag_frame()) else 0

    n_samples = (total - skip + (1 if dup else 0)) * spf
    bits_out = []
    frames_done = 0
    with open(wav_path, "wb") as out:
        out.write(wav_header(sr, channels, n_samples * channels * 2))
        f0 = 0
        while f0 < total:
            f1 = min(total, f0 + chunk_frames)
            w0 = max(0, f0 - _WARMUP)
            start = int(offsets[w0])
            if f1 == total:
                stop = end_byte if not dup else len(data)
            else:
                stop = int(offsets[f1])
            window = bytes(data[start:stop])
            if isinstance(data, mmap.mmap) and start > 0:
                # drop consumed input pages (the encode twin does the same
                # on its WAV memmap): without this the whole MP3's pages
                # accumulate in RSS by end of stream
                aligned = (start // mmap.PAGESIZE) * mmap.PAGESIZE
                try:
                    data.madvise(mmap.MADV_DONTNEED, 0, aligned)
                except (OSError, ValueError, AttributeError):
                    pass
            p = dh.parse_mp3(window, 0)
            warm = f0 - w0
            got = p.lsf_granules if lsf else p.num_frames
            assert got == f1 - w0, (got, f1 - w0)
            pcm = dp.decode_pcm_i16_host(p)
            if pcm is None:   # no native toolchain: NumPy parity oracle
                pcm = dp.pcm_to_i16(dp.decode_pcm(p, "float64"))
            # drop warm-up PCM; the duplication tail only applies on the
            # final window (decode_pcm_i16_host already appended it there).
            # Any window that starts at frame 0 of a tagged stream re-parses
            # the tag frame, and _finish_inter already dropped its samples —
            # one warm-up frame fewer to trim here.
            trim = max(0, warm - (1 if p.skip_first_pcm else 0))
            out.write(pcm[trim * spf:].tobytes())
            bits_out.append(_window_stego_bits(p, warm, lsf))
            frames_done = f1
            if progress_cb:
                progress_cb(frames_done, total)
            f0 = f1
    if isinstance(data, mmap.mmap):
        data.close()
    kbps = first_h.bit_rate // 1000
    if skip:
        kbps = vbr.avg_bitrate_kbps(tag, first_h) or kbps
    return dict(bitrate=kbps, num_frames=total,
                stego_bits="".join(bits_out))


def encode_file_streaming(wav_path: str, mp3_path: str, bitrate: int = 320,
                          chunk_frames: int = 512, hide_str: str = "",
                          progress_cb=None) -> dict:
    """WAV -> MP3 in O(chunk) memory, byte-identical to the whole-file
    ``MP3Encoder`` (pinned at every chunk alignment by
    tests/test_streaming_encode.py).

    Works because every cross-frame coupling in the encode pipeline is
    small, explicit state:

    * **analysis** is a pure function of a bounded sample window — 480
      samples of filterbank history plus one granule of left context for
      the MDCT's previous-subband half (the device plane already chunks on
      exactly this contract, ops/encode_plane.run_analysis);
    * **rate search** carries the per-(gr, ch)-slot quantizer-step seed,
      stale region addresses, and stale ix buffers — saved and re-seeded
      through ``rate_search_file``'s chain io;
    * **reservoir/stuffing, padding slot-lag, scfsi, stego cursor and the
      32-bit serializer cache** are already sequential instance state on
      the encoder and simply persist across chunk calls.

    The WAV rides an ``np.memmap``; each chunk materializes only its own
    sample window, spectra and search results. Requires the native host
    engine (the C++ analysis + search twins); CBR only (VBR's rate choice
    is a whole-file bisection). Returns ``{frames, bytes, too_long}``.
    """
    from mp3stego_tpu import native
    from mp3stego_tpu.models import encoder as enc_mod
    from mp3stego_tpu.ops import encode_plane
    from mp3stego_tpu.utils.wav import read_wav

    w = read_wav(wav_path, bitrate, use_mmap=True)
    enc = enc_mod.MP3Encoder(w, hide_str=hide_str)
    lib = enc_mod._native_rate_lib()
    slib = native.get_lib()
    if (lib is None or slib is None
            or not hasattr(lib, "rate_search_file")
            or not hasattr(slib, "encode_analysis")):
        raise RuntimeError(
            "streaming encode requires the native host engine (g++ build)")
    # persistent serializer bit cache: chunks continue one bitstream.
    # Compliant-LSF streams serialize through the python BitWriter (its
    # 32-bit cache already persists on the instance) — pre-seeding the
    # native serializer would bypass that routing and emit the reference
    # LSF layout instead.
    if not (enc.version != 3 and enc.lsf_compliant):
        enc._nat_ser = slib
        enc._nat_cache = np.zeros(1, np.uint32)
        enc._nat_cache_bits = np.full(1, 32, np.int32)
        enc._nat_out = np.zeros(1 << 16, np.uint8)  # per-frame serializer path

    gpf = enc.granules_per_frame
    nch = w.num_of_channels
    spg = 576
    past = encode_plane._PAST                     # 480-sample filter history
    nf_total = enc._num_frames()
    sr_off = enc.samplerate_index * 23
    chain_state = np.zeros(2 * 2 * 12, np.int64)
    chain_ix = np.zeros(2 * 2 * 576, np.int32)
    import mp3stego_tpu.ops.quant as Q

    def stream_slice(t_lo: int, t_hi: int) -> np.ndarray:
        """(nch, t_hi-t_lo) int16 granule-time samples; out-of-range = 0
        (same semantics as the whole-file zero-padded stream build)."""
        out = np.zeros((nch, t_hi - t_lo), np.int16)
        lo = max(0, t_lo)
        for c in range(nch):
            src = w.buffer if nch == 1 else w.buffer[c::2]
            seg = src[lo:t_hi]
            out[c, lo - t_lo:lo - t_lo + len(seg)] = seg
        return out

    total_bytes = 0
    with open(mp3_path, "wb") as out_f:
        f0 = 0
        while f0 < nf_total:
            f1 = min(nf_total, f0 + chunk_frames)
            nf = f1 - f0
            tg = nf * gpf
            g0 = f0 * gpf
            margin = 1 if f0 > 0 else 0           # MDCT left-context granule
            full = stream_slice((g0 - margin) * spg - past, f1 * gpf * spg)
            tg_run = margin + tg
            spec = np.empty((nch, tg_run, 576), np.int32)
            slib.encode_analysis(np.ascontiguousarray(full), nch, tg_run,
                                 *encode_plane._analysis_tables(), spec)
            xr = np.ascontiguousarray(spec[:, margin:].reshape(-1, 576))

            # seed for skipped granules at the chunk head = the chain's
            # step BEFORE this chunk's searches overwrite it
            seed = None
            if f0 > 0:
                qss = chain_state.reshape(2, 2, 12)[:, :, 0]
                seed = np.array([[qss[gr][ch] for gr in range(gpf)]
                                 for ch in range(nch)], np.int64)

            paddings, mean_bits_f = enc._plane_framing(nf)
            maxb_f = np.minimum(np.asarray(mean_bits_f, np.int64) // nch,
                                Q.MAX_BITS_ALLOWANCE)
            maxb = np.tile(np.repeat(maxb_f, gpf), nch).astype(np.int32)

            lanes = nch * tg
            raw = np.zeros((lanes, 12), np.int64)
            ix = np.zeros((lanes, 576), np.int32)
            en_tot = np.zeros(lanes, np.int32)
            en21 = np.zeros((lanes, 21), np.int32)
            lib.rate_search_file(
                xr, maxb, nch, tg, gpf, sr_off,
                enc._hide_u8, len(hide_str), enc.hide_str_offset,
                raw, ix, en_tot, en21,
                chain_state, chain_ix, 1 if f0 else 0)
            res = {k: np.ascontiguousarray(raw[:, c]) for c, k in enumerate(
                ("step", "bits", "bv", "c1", "cts", "r0c", "r1c",
                 "ch0", "ch1", "ch2", "xrmax0"))}
            res["ix"] = ix
            enc._plane_finish(res, en_tot if enc.version == 3 else None,
                              en21 if enc.version == 3 else None,
                              nf, paddings, mean_bits_f, tg, step_seed=seed)
            out_f.write(bytes(enc.out_buffer))
            total_bytes += len(enc.out_buffer)
            enc.out_buffer = bytearray()
            _release_consumed(w.buffer, f1, gpf, nch, past)
            if progress_cb:
                progress_cb(f1, nf_total)
            f0 = f1
    too_long = enc.hide_str_offset < len(hide_str) - 1
    return dict(frames=nf_total, bytes=total_bytes, too_long=too_long)


def _release_consumed(buf, frames_done: int, gpf: int, nch: int, past: int):
    """Drop the memmapped WAV pages the encode cursor has passed
    (madvise(MADV_DONTNEED)) so a multi-GB input cannot accumulate in RSS —
    the next chunk only ever looks back one granule + the 480-sample filter
    history."""
    base = getattr(buf, "_mmap", None)
    if base is None:
        return
    keep_from = max(0, (frames_done * gpf - 1) * 576 - past) * nch * 2
    aligned = (keep_from // mmap.PAGESIZE) * mmap.PAGESIZE
    if aligned > 0:
        try:
            base.madvise(mmap.MADV_DONTNEED, 0, aligned)
        except (OSError, ValueError, AttributeError):
            pass   # platform without madvise: pages stay (reclaimable)


def _window_stego_bits(p, warm: int, lsf: bool) -> str:
    """Stego bits of one window's frames past the warm-up, in the same
    order decoder_host.stego_bits uses for the whole file."""
    if lsf:
        # one granule per real frame: temporal (frame, ch, region) order;
        # side_infos carries the per-REAL-frame fields
        ts = np.stack([si.table_select[0] for si in p.side_infos[warm:]])
    else:
        ts = p.table_select[warm:]
    sub = dh.ParsedMP3()
    sub.num_frames = ts.shape[0]
    sub.lsf_granules = ts.shape[0] if lsf else 0
    sub.table_select = ts if not lsf else ts[:, None]
    return dh.stego_bits(sub)
