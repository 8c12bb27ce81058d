"""Executes every notebook's code cells in order — the notebooks are living docs and
must stay green (the reference only links external notebooks; ours ship in-repo)."""

import json
from pathlib import Path

import pytest

NOTEBOOKS = sorted((Path(__file__).resolve().parent.parent / "notebooks").glob("*.ipynb"))


@pytest.mark.parametrize("path", NOTEBOOKS, ids=[p.stem for p in NOTEBOOKS])
def test_notebook_executes(path):
    nb = json.loads(path.read_text())
    assert nb["nbformat"] == 4
    ns = {"__name__": "__main__"}
    for idx, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        code = compile(src, f"{path.name}:cell{idx}", "exec")
        exec(code, ns)  # noqa: S102 - executing our own notebooks is the point
