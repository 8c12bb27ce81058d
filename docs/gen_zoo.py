#!/usr/bin/env python
"""Generates the model-zoo checkpoint tables (docs/source/generated/zoo.rst) from the
``*_Checkpoint`` enums — the docs render the same ``default_cfg`` metadata the runtime
uses (reference renders its enums the same way, /root/reference/docs/source/models/*).

Stdlib + package only, so it runs in any environment: ``python docs/gen_zoo.py``.
"""

import sys
from enum import Enum
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEADER = """Model zoo checkpoints
=====================

Every released checkpoint, rendered from the ``*_Checkpoint`` enums
(``model.default_cfg`` carries the same metadata at runtime).

"""


def fmt_size(num_bytes):
    return f"{num_bytes / 1e6:.1f} MB"


def rst_table(rows, headers):
    widths = [max(len(str(r[i])) for r in rows + [headers]) for i in range(len(headers))]
    sep = "  ".join("=" * w for w in widths)
    lines = [sep, "  ".join(str(h).ljust(w) for h, w in zip(headers, widths)).rstrip(), sep]
    for r in rows:
        lines.append("  ".join(str(c).ljust(w) for c, w in zip(r, widths)).rstrip())
    lines.append(sep)
    return "\n".join(lines)


def main() -> None:
    import holocron_tpu.models.classification as classification

    sections = []
    for family_mod in sorted({
        obj.__module__ for name, obj in vars(classification).items() if callable(obj)
        if obj.__module__.startswith("holocron_tpu.models.classification.")
    }):
        mod = sys.modules[family_mod]
        enums = [
            (name, obj) for name, obj in vars(mod).items()
            if isinstance(obj, type) and issubclass(obj, Enum) and name.endswith("_Checkpoint")
        ]
        rows = []
        for name, enum_cls in sorted(enums):
            for entry in enum_cls:
                ckpt = entry.value
                res = ckpt.evaluation.results
                accs = " / ".join(f"{v:.2f}" for v in res.values())
                rows.append((
                    ckpt.meta.arch,
                    entry.name.lower(),
                    ckpt.evaluation.dataset.value,
                    accs,
                    f"{ckpt.meta.num_params / 1e6:.1f}M",
                    fmt_size(ckpt.meta.size),
                    "x".join(str(s) for s in ckpt.pre_processing.input_shape[:2]),
                ))
        if rows:
            family = family_mod.rsplit(".", 1)[-1]
            sections.append(
                f"{family}\n" + "-" * len(family) + "\n\n"
                + rst_table(rows, ("arch", "checkpoint", "dataset", "top1 / top5", "params", "size", "input"))
                + "\n"
            )

    out = Path(__file__).parent / "source" / "generated" / "zoo.rst"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(HEADER + "\n".join(sections))
    print(f"wrote {out} ({sum(s.count(chr(10)) for s in sections)} lines)")


if __name__ == "__main__":
    main()
