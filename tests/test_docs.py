"""Docs subsystem: tools/gen_docs.py is THE docs build (the reference's
counterpart is its Sphinx/RTD autodoc tree, docs/source/api/*.rst — here the
stdlib generator is the owned, CI-verified system instead of an unbuilt rst
tree). The build must succeed, cover the public surface, and the committed
pages must be in sync with the source docstrings."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gen_docs_builds_and_covers_public_api(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "gen_docs.py")],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    api = os.path.join(REPO, "docs", "api")
    stega = open(os.path.join(api, "steganography.md")).read()
    for sym in ("encode_wav_to_mp3", "decode_mp3_to_wav", "hide_message",
                "reveal_massage", "clear_file", "precision"):
        assert sym in stega, sym
    enc = open(os.path.join(api, "encoder.md")).read()
    assert "too long" in enc  # Encoder.encode's too_long contract
    par = open(os.path.join(api, "parallel.md")).read()
    for sym in ("make_mesh", "decode_files_batched", "encode_files_batched"):
        assert sym in par, sym


def test_committed_docs_pages_in_sync():
    # The previous test regenerated docs/api in place; if the working tree now
    # differs from HEAD, a docstring changed without re-running the docs build.
    r = subprocess.run(["git", "diff", "--stat", "--exit-code", "docs/api"],
                       capture_output=True, text=True, cwd=REPO, timeout=60)
    assert r.returncode == 0, (
        "docs/api is stale — run `python tools/gen_docs.py` and commit:\n"
        + r.stdout)
