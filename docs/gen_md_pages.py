#!/usr/bin/env python
"""Renders the repo's markdown records (CHANGELOG.md, docs/PARITY.md) into rst pages
under docs/source/generated/ so the sphinx site carries them (the reference site has a
changelog page, /root/reference/docs/source/changelog.rst; the parity tables are this
project's strongest evidence and belong on the site).

Minimal md->rst conversion (headings, pipe tables, bullets, fences, inline code/bold/
links) — enough for these two documents; stdlib only.
"""

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "docs" / "source" / "generated"

_HEADING_CHARS = {1: "=", 2: "-", 3: "~", 4: '"'}


def _inline(text: str) -> str:
    # [label](url) -> `label <url>`__
    text = re.sub(r"\[([^\]]+)\]\(([^)]+)\)", r"`\1 <\2>`__", text)
    # `code` -> ``code`` (leave already-doubled backticks alone)
    text = re.sub(r"(?<!`)`([^`]+)`(?!`)", r"``\1``", text)
    return text


def _table(lines):
    rows = [[c.strip() for c in ln.strip().strip("|").split("|")] for ln in lines]
    rows = [r for r in rows if not all(set(c) <= set(":- ") for c in r)]  # drop separator
    if not rows:
        return []
    out = [".. list-table::", "   :header-rows: 1", ""]
    for row in rows:
        out.append(f"   * - {_inline(row[0])}")
        out.extend(f"     - {_inline(c)}" for c in row[1:])
    out.append("")
    return out


def md_to_rst(md: str) -> str:
    out = []
    lines = md.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            lang = line[3:].strip() or "text"
            block = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append("   " + lines[i])
                i += 1
            out += [f".. code-block:: {lang}", ""] + block + [""]
        elif line.lstrip().startswith("|") and "|" in line.lstrip()[1:]:
            tbl = []
            while i < len(lines) and lines[i].lstrip().startswith("|"):
                tbl.append(lines[i])
                i += 1
            out += _table(tbl)
            continue
        elif m := re.match(r"^(#{1,4})\s+(.*)", line):
            level = len(m.group(1))
            title = _inline(m.group(2))
            out += ["", title, _HEADING_CHARS[level] * max(len(title), 4), ""]
        else:
            out.append(_inline(line))
        i += 1
    return "\n".join(out) + "\n"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for src, dest in [(ROOT / "CHANGELOG.md", "changelog.rst"), (ROOT / "docs" / "PARITY.md", "parity.rst")]:
        (OUT / dest).write_text(md_to_rst(src.read_text()))
        print(f"wrote {OUT / dest}")


if __name__ == "__main__":
    sys.exit(main())
