#!/usr/bin/env python
"""The docs build system: renders docs/api/*.md API pages from docstrings.

The reference ships Sphinx autodoc + ReadTheDocs (its docs/ tree); this repo
owns this stdlib generator as the documented, CI-verified docs system instead
(run: ``python tools/gen_docs.py``) — it builds in any environment, needs no
extra dependency, and its output is committed so the docs are browsable
in-tree. Verified in CI by tests/test_docs.py (build succeeds + committed
pages cover the public surface).
"""

import importlib
import inspect
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "api")

# (page, title, [(kind, target, members)]) — the API-page table of contents
# (same coverage as the reference's docs/source/api/*.rst autodoc pages)
PAGES = [
    ("steganography", "Steganography", [
        ("class", "mp3stego_tpu.Steganography", None),
        ("func", "mp3stego_tpu.steganography.str_to_binary_str", None),
    ]),
    ("decoder", "Decoder", [
        ("class", "mp3stego_tpu.models.decoder.Decoder", None),
        ("func", "mp3stego_tpu.models.streaming.decode_file_streaming", None),
        ("module", "mp3stego_tpu.bitstream.vbr", None),
    ]),
    ("encoder", "Encoder", [
        ("class", "mp3stego_tpu.models.encoder.Encoder", None),
        ("class", "mp3stego_tpu.models.encoder.MP3Encoder",
         ("encode", "write_mp3_file")),
        ("func", "mp3stego_tpu.models.streaming.encode_file_streaming", None),
    ]),
    ("parallel", "Parallel layer (mesh / batch / SP)", [
        ("func", "mp3stego_tpu.parallel.mesh.make_mesh", None),
        ("func", "mp3stego_tpu.parallel.batch_decode.decode_files_batched",
         None),
        ("func", "mp3stego_tpu.parallel.batch_encode.encode_files_batched",
         None),
        ("module", "mp3stego_tpu.parallel.frame_shard", None),
    ]),
    ("ops", "Device numeric planes", [
        ("module", "mp3stego_tpu.ops.decode_plane", None),
        ("module", "mp3stego_tpu.ops.encode_plane", None),
        ("module", "mp3stego_tpu.ops.search_plane", None),
        ("module", "mp3stego_tpu.ops.quant_batch", None),
    ]),
    ("cli", "CLI", [
        ("module", "mp3stego_tpu.__main__", None),
    ]),
]


def _resolve(path):
    parts = path.split(".")
    for split in range(len(parts), 0, -1):
        try:
            mod = importlib.import_module(".".join(parts[:split]))
        except ImportError:
            continue
        obj = mod
        for name in parts[split:]:
            obj = getattr(obj, name)
        return obj
    raise ImportError(path)


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _doc(obj):
    return inspect.getdoc(obj) or "*(undocumented)*"


def _render_callable(name, obj, depth):
    head = "#" * depth
    return f"{head} `{name}{_sig(obj)}`\n\n{_doc(obj)}\n"


def _render_class(path, members):
    cls = _resolve(path)
    out = [f"## `{path}`\n", _doc(cls), ""]
    out.append(_render_callable(f"{cls.__name__}.__init__",
                                cls.__init__, 3))
    names = members or [n for n, v in vars(cls).items()
                        if not n.startswith("_") and callable(v)]
    for n in names:
        out.append(_render_callable(f"{cls.__name__}.{n}",
                                    getattr(cls, n), 3))
    return "\n".join(out)


def _render_module(path):
    mod = _resolve(path)
    out = [f"## module `{path}`\n", _doc(mod), ""]
    for n, v in vars(mod).items():
        if n.startswith("_") or not callable(v):
            continue
        if getattr(v, "__module__", None) != path:
            continue
        out.append(_render_callable(n, v, 3))
    return "\n".join(out)


def main():
    os.makedirs(OUT, exist_ok=True)
    index = ["# mp3stego_tpu API\n",
             "Generated from docstrings by `tools/gen_docs.py` "
             "(the docs build system; run it after changing any "
             "public docstring).\n"]
    for page, title, entries in PAGES:
        parts = [f"# {title}\n"]
        for kind, target, members in entries:
            if kind == "class":
                parts.append(_render_class(target, members))
            elif kind == "func":
                parts.append(_render_callable(target, _resolve(target), 2))
            else:
                parts.append(_render_module(target))
        with open(os.path.join(OUT, f"{page}.md"), "w") as f:
            f.write("\n".join(parts))
        index.append(f"- [{title}]({page}.md)")
    with open(os.path.join(OUT, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(PAGES) + 1} pages to {OUT}")


if __name__ == "__main__":
    main()
