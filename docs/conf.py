# Sphinx configuration for fsgd_tpu (role of reference docs/conf.py).
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "fsgd_tpu"
copyright = "2026, fsgd_tpu contributors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
]
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build"]
html_theme = "sphinx_rtd_theme"
autodoc_mock_imports = ["jax", "jaxlib", "flax", "optax", "torch"]
