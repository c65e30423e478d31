# Sphinx configuration for the mp3stego_tpu documentation.
#
# Mirrors the reference library's docs subsystem (docs/conf.py in
# tomershay100/mp3-steganography-lib): napoleon + autodoc + viewcode over the
# public classes. Environments without Sphinx can generate the same API pages
# with `python tools/gen_docs.py` (stdlib-only docstring renderer).

import os
import sys

sys.path.insert(0, os.path.abspath('..'))

project = 'mp3stego_tpu'
copyright = '2026, mp3stego_tpu authors'
author = 'mp3stego_tpu authors'

extensions = [
    'sphinx.ext.napoleon',
    'sphinx.ext.autodoc',
    'sphinx.ext.viewcode',
]

templates_path = ['_templates']
exclude_patterns = ['_build', 'Thumbs.db', '.DS_Store']

html_theme = 'alabaster'
autodoc_member_order = 'bysource'
