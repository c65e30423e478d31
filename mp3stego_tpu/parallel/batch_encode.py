"""Batched multi-file encode: the encode-side throughput mode.

Encoding is file-parallel (no cross-file state): each file's analysis/MDCT and
rate-control cost grid run as chunked device programs (already shape-stable,
so every file reuses the same compiled executables), and a host thread pool
overlaps the per-file host replay/serialization with the device work of other
files (the native parser/serializer and jax dispatch release the GIL).
"""

import os
from concurrent.futures import ThreadPoolExecutor


def encode_files_batched(jobs: list, bitrate: int = 320,
                         max_workers: int = None,
                         errors: str = "raise") -> list:
    """Encode many WAV files: ``jobs`` is a list of (wav_path, mp3_path).

    Returns the list of output paths (or, with ``errors="isolate"``, the
    exception object in the slot of any file that failed).
    """
    from mp3stego_tpu.models.encoder import MP3Encoder
    from mp3stego_tpu.utils.wav import read_wav

    def one(job):
        wav_path, mp3_path = job
        if not os.path.exists(wav_path):
            raise FileNotFoundError(wav_path)
        enc = MP3Encoder(read_wav(wav_path, bitrate))
        enc.encode()
        enc.write_mp3_file(mp3_path)
        return mp3_path

    workers = max_workers or min(8, (os.cpu_count() or 1))
    results = []
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futures = [ex.submit(one, j) for j in jobs]
        for f in futures:
            try:
                results.append(f.result())
            except Exception as e:  # noqa: BLE001 - isolation mode
                if errors != "isolate":
                    raise
                results.append(e)
    return results
