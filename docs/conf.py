# Sphinx configuration for the bpbreid_tpu API reference.
#
# Mirrors the form of the reference project's docs/ tree
# (reference: docs/conf.py, docs/index.rst): generated API docs per
# package plus the hand-written guides. Build (requires sphinx +
# myst-parser, not bundled with the runtime image):
#
#   pip install sphinx myst-parser sphinx-rtd-theme
#   sphinx-build -b html docs docs/_build/html
import os
import sys

sys.path.insert(0, os.path.abspath('..'))

project = 'bpbreid_tpu'
author = 'bpbreid_tpu contributors'
copyright = '2026, bpbreid_tpu contributors'

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.autosummary',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
]
# the hand-written guides are markdown; render them through myst when
# available (the docs still build without it, minus the md pages)
try:
    import myst_parser  # noqa: F401
    extensions.append('myst_parser')
    source_suffix = {'.rst': 'restructuredtext', '.md': 'markdown'}
except ImportError:
    source_suffix = {'.rst': 'restructuredtext'}

# heavy/optional imports are mocked so autodoc can run on a docs-only
# machine (jax and friends are real dependencies; the rest are extras)
autodoc_mock_imports = ['clearml', 'cv2', 'openpifpaf', 'detectron2']
autodoc_member_order = 'bysource'
autosummary_generate = True

master_doc = 'index'
exclude_patterns = ['_build']
html_theme = os.environ.get('BPBREID_TPU_DOCS_THEME', 'alabaster')
