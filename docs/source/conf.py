"""Sphinx configuration for the holocron-tpu docs site.

Builds the API reference via autodoc and the model-zoo checkpoint tables via
docs/gen_zoo.py (regenerated on every build so the tables always match the enums).
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

# regenerate the checkpoint tables from the live enums + the changelog/parity pages
subprocess.run([sys.executable, str(ROOT / "docs" / "gen_zoo.py")], check=True)
subprocess.run([sys.executable, str(ROOT / "docs" / "gen_md_pages.py")], check=True)

project = "holocron-tpu"
author = "holocron-tpu contributors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

autodoc_member_order = "bysource"
autodoc_typehints = "description"
napoleon_google_docstring = True
intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

templates_path = []
exclude_patterns = []

try:
    import furo  # noqa: F401

    html_theme = "furo"
except ImportError:
    html_theme = "alabaster"
html_static_path = ["_static"]
