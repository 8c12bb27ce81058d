#!/usr/bin/env python
"""Strips trainer state from a checkpoint for release.

Analog of references/clean_checkpoint.py: keeps only the model variables.
"""

import argparse
from pathlib import Path

import numpy as np
from flax import serialization


def main(args):
    state = serialization.msgpack_restore(Path(args.checkpoint).read_bytes())
    model_state = state["model"] if "model" in state else state
    Path(args.output).write_bytes(serialization.msgpack_serialize(model_state))
    num_params = sum(np.asarray(leaf).size for leaf in _leaves(model_state.get("params", model_state)))
    print(f"Saved cleaned checkpoint ({num_params} params) to {args.output}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def parse_args():
    parser = argparse.ArgumentParser(description="Checkpoint cleanup")
    parser.add_argument("checkpoint", type=str, help="path to the trainer checkpoint")
    parser.add_argument("output", type=str, help="destination path")
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
