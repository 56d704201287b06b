# Sphinx configuration for the pisa-tpu documentation.
#
# Mirrors the reference's docs subsystem (cf. /root/reference/docs/source/conf.py:
# Sphinx + furo/myst-nb publishing to gh-pages) with a dependency-light setup:
# myst_parser renders the existing markdown docs, autodoc pulls API docstrings.
# Build with `make -C docs html` (requires sphinx + myst-parser; both optional,
# not runtime dependencies of pisa_tpu).

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "pisa-tpu"
author = "pisa-tpu developers"
copyright = "2026, pisa-tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]
try:  # markdown support if available
    import myst_parser  # noqa: F401

    extensions.append("myst_parser")
except ImportError:
    pass

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = []

autodoc_mock_imports = [
    "jax",
    "jaxlib",
    "h5py",
    "pandas",
    "matplotlib",
    "scipy",
]
autosummary_generate = True
napoleon_google_docstring = False
napoleon_numpy_docstring = True

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

html_theme = "furo" if "furo" in sys.modules else "alabaster"
try:
    import furo  # noqa: F401

    html_theme = "furo"
except ImportError:
    pass
html_title = "pisa-tpu"
