#!/usr/bin/env python
"""Model export for serving.

TPU-native analog of the reference's scripts/export_to_onnx.py:18-61: instead of ONNX,
models export to **StableHLO** (``jax.export`` — the portable XLA interchange format)
and optionally a TensorFlow **SavedModel** via jax2tf. Reparametrizeable archs
(RepVGG/MobileOne) are fused first, like the reference.

Usage:
    python scripts/export_model.py repvgg_a0 --format stablehlo --output model.stablehlo
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_forward(args):
    """Builds the exportable forward for any task family.

    Detection exports include the full post-processing (objectness filter + score
    threshold + top-k + masked NMS — all pure XLA, holocron_tpu/models/detection/
    _utils.py:74), returning fixed-size {boxes, scores, labels, keep} arrays — the
    static-shape analog of the reference's ONNX detection export
    (tests/test_models_detection.py:79-93).
    """
    from holocron_tpu import models
    from holocron_tpu.models import detection as det_pkg

    model = models.__dict__[args.arch](num_classes=args.num_classes)
    model.init((args.batch, args.size, args.size, 3))
    if hasattr(model.module, "reparametrize"):
        model.reparametrize()

    module, variables = model.module, model.variables

    if getattr(args, "quantize", False):
        # selective-int8 artifact (holocron_tpu/quant.py): the int8 kernels + scales
        # are baked into the exported graph as constants, dynamic activation scales
        from holocron_tpu.quant import quantize_model

        qm = quantize_model(model, arch=args.arch)
        qfwd_quant = qm.apply_fn()
        variables_q, qparams = qm.variables, qm.qparams

        def base_fwd(x):
            return qfwd_quant(variables_q, qparams, x)

    else:

        def base_fwd(x):
            return module.apply(variables, x, train=False)

    if args.arch in det_pkg.__dict__ and hasattr(model, "max_boxes"):
        from holocron_tpu.models.detection._utils import post_process

        nms_thresh = getattr(module, "rpn_nms_thresh", 0.7)
        score_thresh = getattr(module, "box_score_thresh", 0.05)

        def fwd(x):
            boxes, b_o, b_scores = base_fwd(x)
            return post_process(boxes, b_o, b_scores, nms_thresh, score_thresh)

    else:
        fwd = base_fwd

    example = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    return fwd, example, model


def main(args):
    fwd, example, model = build_forward(args)
    out_path = Path(args.output or f"{args.arch}.{args.format}")

    if args.format == "stablehlo":
        exported = jax.export.export(jax.jit(fwd))(example)
        out_path.write_bytes(exported.serialize())
        # round-trip check (tree-aware: detection returns a dict of padded arrays)
        restored = jax.export.deserialize(out_path.read_bytes())
        for got, ref in zip(jax.tree.leaves(restored.call(example)), jax.tree.leaves(fwd(example))):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    elif args.format == "savedmodel":
        import tensorflow as tf
        from jax.experimental import jax2tf

        tf_fn = tf.function(
            jax2tf.convert(fwd, with_gradient=False),
            input_signature=[tf.TensorSpec(example.shape, tf.float32)],
            autograph=False,
        )
        module = tf.Module()
        module.serve = tf_fn
        tf.saved_model.save(module, str(out_path))
    else:
        raise ValueError(f"unsupported format: {args.format}")
    print(f"Exported {args.arch} ({model.num_params} params) to {out_path}")


def parse_args():
    parser = argparse.ArgumentParser(
        description="Model export", formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("arch", type=str, help="architecture to export")
    parser.add_argument("--format", type=str, default="stablehlo", choices=["stablehlo", "savedmodel"])
    parser.add_argument("--output", type=str, default=None, help="output path")
    parser.add_argument("--size", type=int, default=224, help="input size")
    parser.add_argument("--batch", type=int, default=1, help="batch size")
    parser.add_argument("--num-classes", type=int, default=10, help="number of classes")
    parser.add_argument(
        "--quantize",
        action="store_true",
        help="export the selective-int8 form (int8 weights baked into the artifact)",
    )
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
