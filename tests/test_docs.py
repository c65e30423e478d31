"""Docs subsystem: the stdlib generator builds API pages from docstrings and
the committed pages stay in sync with the public surface (the reference's
counterpart is its Sphinx/RTD autodoc tree, docs/source/api/*.rst)."""

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


def test_sphinx_tree_mirrors_reference_layout():
    docs = os.path.join(REPO, "docs")
    assert os.path.exists(os.path.join(docs, "conf.py"))
    assert os.path.exists(os.path.join(docs, "index.rst"))
    for page in ("steganography", "decoder", "encoder", "parallel", "cli"):
        assert os.path.exists(
            os.path.join(docs, "source", "api", f"{page}.rst")), page
