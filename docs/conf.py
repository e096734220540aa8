"""Sphinx configuration for the gaunegf_tpu documentation site.

Built in CI (.github/workflows/docs.yml) with myst-parser for the
markdown pages and nbsphinx for the executed tutorial notebook --
the rendered-site equivalent of the reference's docs deploy
(gauNEGF .github/workflows/docs.yml).  Not buildable in the dev image
(no sphinx there); the markdown sources remain readable standalone.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "gaunegf_tpu"
author = "gaunegf_tpu developers"
release = "0.2"

extensions = [
    "myst_parser",
    "nbsphinx",
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build"]

nbsphinx_execute = "never"          # the notebook ships pre-executed
myst_enable_extensions = ["dollarmath", "linkify"]

html_theme = "furo"
html_title = "gaunegf_tpu"

autodoc_mock_imports = ["jax", "jaxlib", "scipy"]
