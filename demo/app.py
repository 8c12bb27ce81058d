#!/usr/bin/env python
"""Gradio demo (analog of demo/app.py:17-70): top-3 classification over the deploy-form
model. Requires gradio (`pip install gradio`)."""

import argparse

import numpy as np


def main(args):
    try:
        import gradio as gr
    except ImportError as e:
        raise SystemExit("gradio is required for the demo: pip install gradio") from e

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from PIL import Image

    from api.app.vision import CLASSES, get_batcher

    batcher = get_batcher()  # builds the model; normalization + softmax run inside its one jitted call

    def predict(pil_img):
        x = np.asarray(pil_img.convert("RGB").resize((224, 224), Image.BILINEAR), dtype=np.uint8)[None]
        probs = np.asarray(batcher.submit(x)["probs"])
        top3 = probs.argsort()[::-1][:3]
        return {CLASSES[i] if i < len(CLASSES) else str(i): float(probs[i]) for i in top3}

    gr.Interface(
        fn=predict,
        inputs=gr.Image(type="pil"),
        outputs=gr.Label(num_top_classes=3),
        title="holocron-tpu classification demo",
    ).launch(server_port=args.port, share=args.share)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="holocron-tpu demo")
    parser.add_argument("--port", type=int, default=8001)
    parser.add_argument("--share", action="store_true")
    main(parser.parse_args())
