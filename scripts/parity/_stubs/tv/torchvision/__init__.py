"""Minimal torchvision stand-in for running the reference package
(/root/reference/holocron) in environments without torchvision.

Only the surface the reference imports is provided (grep: torchvision usages in
holocron/*). Math-bearing pieces (box ops, FrozenBatchNorm2d, StochasticDepth,
resnet34/vgg11 encoders) are implemented faithfully so parity comparisons flow
through identical arithmetic; UI/IO conveniences are minimal.

This package is ONLY importable via scripts/parity/run.py, which inserts it on
sys.path when the real torchvision is absent.
"""

from . import models, ops, transforms  # noqa: F401

__version__ = "0.0.0+holocron-parity-stub"
