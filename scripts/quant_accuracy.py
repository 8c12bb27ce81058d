#!/usr/bin/env python
"""int8-vs-bf16 accuracy evidence on TRAINED weights (VERDICT r2: the int8 headline
needs accuracy measured beyond random init).

Offline protocol (no network -> no ImageNet checkpoints): train each arch on a
learnable synthetic 10-class task (naturalistic correlated noise + class-specific
spatial templates) until it separates the classes, then measure

- top-1 accuracy of the bf16 deploy form and the selective-int8 form,
- their top-1 agreement and max softmax drift (holocron_tpu.quant.measure_agreement)

on held-out samples. With real converted checkpoints available, pass
``--checkpoint arch=path.mpk`` to skip training and measure on those weights
(the scripts/parity conversion path produces them).

Writes one JSONL row per arch (docs/bench/quant_accuracy.jsonl by default) and
prints a markdown table for docs/PERF.md.

Usage: python scripts/quant_accuracy.py --archs repvgg_a0 resnet50 --steps 300
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_task(key, num_classes: int, size: int):
    """Class-conditional image generator: correlated noise + a per-class spatial
    template. Learnable in a few hundred steps, image-statistics-shaped."""
    import jax
    import jax.numpy as jnp

    templates = jax.random.normal(key, (num_classes, size // 8, size // 8, 3))
    templates = jax.image.resize(templates, (num_classes, size, size, 3), method="bilinear")

    def batch(key, n):
        k1, k2, k3 = jax.random.split(key, 3)
        y = jax.random.randint(k1, (n,), 0, num_classes)
        coarse = jax.random.normal(k2, (n, size // 8, size // 8, 3))
        noise = jax.image.resize(coarse, (n, size, size, 3), method="bilinear")
        x = noise + 0.9 * templates[y] + 0.3 * jax.random.normal(k3, (n, size, size, 3))
        x = (x - x.mean(axis=(1, 2, 3), keepdims=True)) / (x.std(axis=(1, 2, 3), keepdims=True) + 1e-6)
        return x, y

    return batch


def make_seg_task(key, num_classes: int, size: int):
    """Dense analog of :func:`make_task` (VERDICT r3 #6): each image carries 1-3
    axis-aligned ellipse blobs whose FILL is a class-specific color+texture signature;
    the mask labels blob pixels with their class (0 = background). Learnable to
    near-perfect pixel accuracy in a few hundred steps."""
    import jax
    import jax.numpy as jnp

    sig = jax.random.normal(key, (num_classes, 3)) * 1.2
    yy, xx = jnp.mgrid[0:size, 0:size].astype(jnp.float32) / size

    def one_image(key):
        ks = jax.random.split(key, 8)
        x = 0.25 * jax.random.normal(ks[0], (size, size, 3))
        mask = jnp.zeros((size, size), jnp.int32)
        for i in range(3):  # up to 3 blobs; later blobs overwrite
            kc, kp, kr, ka = jax.random.split(ks[i + 1], 4)
            cls = jax.random.randint(kc, (), 1, num_classes)
            cy, cx = jax.random.uniform(kp, (2,), minval=0.2, maxval=0.8)
            ry, rx = jax.random.uniform(kr, (2,), minval=0.08, maxval=0.25)
            inside = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
            active = jax.random.uniform(ka, ()) < (1.0 if i == 0 else 0.6)
            inside = inside & active
            mask = jnp.where(inside, cls, mask)
            x = jnp.where(inside[..., None], sig[cls] + 0.25 * jax.random.normal(ks[i + 4], (size, size, 3)), x)
        return x, mask

    def batch(key, n):
        x, y = jax.vmap(one_image)(jax.random.split(key, n))
        return x, y

    return batch


def make_det_task(key, num_classes: int, size: int, max_boxes: int = 8):
    """Detection analog: 1-3 class-colored axis-aligned rectangles per image; targets
    are padded {boxes (relative xyxy), labels, mask} dicts, the DetectionModel train
    contract. The detector won't reach mAP glory in 400 steps — the point is trained
    (non-random) weights under the int8-vs-bf16 agreement gate."""
    import jax
    import jax.numpy as jnp

    sig = jax.random.normal(key, (num_classes, 3)) * 1.2
    yy, xx = jnp.mgrid[0:size, 0:size].astype(jnp.float32) / size
    K = 3

    def one_image(key):
        ks = jax.random.split(key, 2 * K + 1)
        x = 0.25 * jax.random.normal(ks[0], (size, size, 3))
        boxes = jnp.zeros((max_boxes, 4), jnp.float32)
        labels = jnp.zeros((max_boxes,), jnp.int32)
        mask = jnp.zeros((max_boxes,), bool)
        for i in range(K):
            kc, kp, kr, ka = jax.random.split(ks[2 * i + 1], 4)
            cls = jax.random.randint(kc, (), 0, num_classes)
            cy, cx = jax.random.uniform(kp, (2,), minval=0.25, maxval=0.75)
            h, w = jax.random.uniform(kr, (2,), minval=0.12, maxval=0.3)
            x0, y0, x1, y1 = cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
            inside = (yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)
            active = jax.random.uniform(ka, ()) < (1.0 if i == 0 else 0.5)
            inside = inside & active
            x = jnp.where(inside[..., None], sig[cls] + 0.25 * jax.random.normal(ks[2 * i + 2], (size, size, 3)), x)
            boxes = boxes.at[i].set(jnp.where(active, jnp.stack([x0, y0, x1, y1]), 0.0))
            labels = labels.at[i].set(cls)
            mask = mask.at[i].set(active)
        return x, {"boxes": boxes, "labels": labels, "mask": mask}

    def batch(key, n):
        return jax.vmap(one_image)(jax.random.split(key, n))

    return batch


def train(model, batch_fn, steps: int, batch: int, lr: float = 1e-3, task: str = "classification"):
    import jax
    import jax.numpy as jnp
    import optax

    from holocron_tpu.nn.functional import cross_entropy

    module = model.module
    variables = model.variables
    params, state = variables["params"], {k: v for k, v in variables.items() if k != "params"}
    if task == "detection":
        # detector losses explode from random init at classification LRs: clip + cooler LR
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr / 4))
    else:
        tx = optax.adam(lr)
    # skip non-finite updates so one blown-up batch can't NaN the params for the
    # rest of the run (same guard the Trainer applies, trainer/core.py)
    tx = optax.apply_if_finite(tx, max_consecutive_errors=50)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, x, y, rng):
        def loss_fn(p):
            if task == "detection":
                # detection modules return a loss dict when a target is passed
                # (DetectionTrainer contract, trainer/detection.py)
                loss_dict, updates = module.apply(
                    {"params": p, **state}, x, y, train=True, mutable=list(state), rngs={"dropout": rng}
                )
                return sum(jnp.asarray(v, jnp.float32) for v in loss_dict.values()), updates
            out, updates = module.apply(
                {"params": p, **state}, x, train=True, mutable=list(state), rngs={"dropout": rng}
            )
            return cross_entropy(out, y), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), {**state, **updates}, opt_state, loss

    key = jax.random.key(42)
    loss, last_finite = None, float("nan")
    for i in range(steps):
        key, sub, drop = jax.random.split(key, 3)
        x, y = batch_fn(sub, batch)
        params, state, opt_state, loss = step(params, state, opt_state, x, y, drop)
        if i >= steps - 20:  # report a recent finite loss, not one blown-up final batch
            val = float(jax.device_get(loss))
            if val == val:
                last_finite = val
    model.load_variables({"params": params, **state})
    final = float(jax.device_get(loss))
    return final if final == final else last_finite


def evaluate(fwd, batch_fn, key, batches: int, batch: int):
    import jax
    import jax.numpy as jnp

    correct = total = 0
    for i in range(batches):
        key, sub = jax.random.split(key)
        x, y = batch_fn(sub, batch)
        pred = jnp.argmax(fwd(x), -1)
        correct += int(jax.device_get(jnp.sum(pred == y)))
        total += batch
    return correct / total


def evaluate_dense(fwd, batch_fn, key, batches: int, batch: int):
    """Pixel accuracy of (B,H,W,C) logits against (B,H,W) ground-truth masks."""
    import jax
    import jax.numpy as jnp

    correct = total = 0
    for i in range(batches):
        key, sub = jax.random.split(key)
        x, y = batch_fn(sub, batch)
        pred = jnp.argmax(fwd(x), -1)
        correct += int(jax.device_get(jnp.sum(pred == y)))
        total += int(y.size)
    return correct / total


def infer_task(arch: str) -> str:
    from holocron_tpu.models import detection, segmentation

    if arch in detection.__dict__:
        return "detection"
    if arch in segmentation.__dict__:
        return "segmentation"
    return "classification"


def _measure_detection(model, bf16_fwd, int8_fwd, batch_fn, key, batches: int, batch: int):
    """Detection row: per-form F1 against the synthetic ground truth (accuracy proxy)
    plus bf16-vs-int8 agreement via the box-matched gate (quant.py)."""
    import jax
    import numpy as np

    from holocron_tpu.models.detection.yolo import detections_to_list, post_process
    from holocron_tpu.quant import measure_agreement_detection

    nms_thresh = getattr(model.module, "rpn_nms_thresh", 0.7)
    score_thresh = getattr(model.module, "box_score_thresh", 0.05)

    eval_x, gts = [], []
    for i in range(batches):
        key, sub = jax.random.split(key)
        x, tgt = batch_fn(sub, batch)
        eval_x.append(x)
        tgt = jax.device_get(tgt)
        gts.append([
            {
                "boxes": np.asarray(tgt["boxes"][j])[np.asarray(tgt["mask"][j])],
                "scores": np.ones(int(np.asarray(tgt["mask"][j]).sum())),
                "labels": np.asarray(tgt["labels"][j])[np.asarray(tgt["mask"][j])],
            }
            for j in range(batch)
        ])

    # Run each form's raw forward ONCE per eval batch, then walk a threshold ladder
    # over the cached outputs: a few-hundred-step synthetic detector rarely pushes
    # objectness past the reference's production 0.5 gate, and a gate measured on
    # ZERO detections is vacuous (round-4 guard). Both forms always use the SAME
    # thresholds; the thresholds used are recorded in the row.
    raw_bf16 = [tuple(jax.device_get(t) for t in bf16_fwd(x)) for x in eval_x]
    raw_int8 = [tuple(jax.device_get(t) for t in int8_fwd(x)) for x in eval_x]

    # Final rung is rank-based: a norm-free backbone trained a few hundred steps from
    # scratch can sit at arbitrarily low absolute objectness (the no-object term
    # crushes every b_o early; see yolov1), so derive score_t from the model's own
    # score distribution such that ~2 boxes/image pass, and drop the objectness gate.
    all_scores = np.concatenate(
        [(np.asarray(s, np.float32).max(-1) * np.asarray(o, np.float32)).ravel() for _, o, s in raw_bf16]
    )
    n_boxes_per_image = raw_bf16[0][1].shape[1]
    rank_t = float(np.quantile(all_scores, max(0.0, 1.0 - 2.0 / n_boxes_per_image)))
    ladder = [(0.5, score_thresh), (0.25, 0.01), (0.1, 1e-3), (0.0, rank_t)]
    for obj_t, score_t in ladder:
        pp = jax.jit(
            lambda b, o, s: post_process(b, o, s, nms_thresh, score_t, obj_thresh=obj_t)
        )
        dets_bf16 = [detections_to_list(pp(*r)) for r in raw_bf16]
        mean_dets = float(np.mean([len(d["boxes"]) for bt in dets_bf16 for d in bt]))
        if mean_dets >= 0.5:
            break
    dets_int8 = [detections_to_list(pp(*r)) for r in raw_int8]

    def from_list(batches_list):
        it = iter(batches_list)
        return lambda x: next(it)

    # score_thresh=0.0: thresholding already happened in post_process (the ladder);
    # the gate's default 0.25 re-filter would silently re-vacuate low-score rungs.
    def vs_gt(dets):
        return measure_agreement_detection(from_list(list(gts)), from_list(list(dets)), eval_x, score_thresh=0.0)

    gate = measure_agreement_detection(
        from_list(list(dets_bf16)), from_list(list(dets_int8)), eval_x, score_thresh=0.0
    )
    return {
        "obj_thresh": obj_t,
        "score_thresh": score_t,
        "acc_bf16": round(vs_gt(dets_bf16)["det_f1"], 4),
        "acc_int8": round(vs_gt(dets_int8)["det_f1"], 4),
        "det_f1": round(gate["det_f1"], 4),
        "det_precision": round(gate["det_precision"], 4),
        "det_recall": round(gate["det_recall"], 4),
        "mean_matched_iou": round(gate["mean_matched_iou"], 4),
        # vacuous-agreement guard: a 1.0 F1 with 0 detections/image proves nothing
        "dets_per_image_bf16": round(gate["dets_per_image_ref"], 2),
        "dets_per_image_int8": round(gate["dets_per_image_quant"], 2),
    }


def main(args):
    import jax
    import jax.numpy as jnp

    import holocron_tpu.models as M
    from holocron_tpu.quant import measure_agreement, quantize_model

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    checkpoints = dict(kv.split("=", 1) for kv in args.checkpoint)
    rows = []
    for arch in args.archs:
        task = infer_task(arch)
        size = args.size if task == "classification" else max(args.size, {"segmentation": 64, "detection": 128}[task])
        batch = args.batch if task == "classification" else min(args.batch, 16)
        model = M.__dict__[arch]()
        model.init((batch, size, size, 3))
        if task == "segmentation":
            batch_fn = make_seg_task(jax.random.key(7), 10, size)
        elif task == "detection":
            batch_fn = make_det_task(jax.random.key(7), 10, size)
        else:
            batch_fn = make_task(jax.random.key(7), 10, size)
        if arch in checkpoints:
            from flax import serialization

            state = serialization.msgpack_restore(Path(checkpoints[arch]).read_bytes())
            model.load_variables(jax.tree.map(jnp.asarray, state.get("model", state)))
            final_loss = float("nan")
        else:
            final_loss = train(model, batch_fn, args.steps, batch, task=task)
        try:
            model.reparametrize()
        except NotImplementedError:
            pass  # arch has no deploy fusion (ResNets etc.)

        # bf16 deploy form (the serving configuration the gate protects). Weights
        # pass as runtime args, not jit constants: numerically identical to the
        # const deploy protocol but immune to the remote-compile HLO size limit
        # (repvgg_b3's const-closed forward hits HTTP 413 through the tunnel)
        bf16_vars = jax.tree.map(lambda t: t.astype(jnp.bfloat16), model.variables)
        module = model.module
        _bf16_j = jax.jit(lambda v, a: module.apply(v, a, train=False))
        bf16_fwd = lambda a: _bf16_j(bf16_vars, a)  # noqa: E731

        calib = [batch_fn(jax.random.key(1000 + i), batch)[0] for i in range(2)]
        qm = quantize_model(model, calibration_batches=calib, arch=arch)
        qm.variables = bf16_vars
        qfwd, qparams = jax.jit(qm.apply_fn()), qm.qparams
        int8_fwd = lambda a: qfwd(qm.variables, qparams, a)  # noqa: E731

        eval_key = jax.random.key(2000)
        if task == "detection":
            # _measure_detection builds its own eval set from eval_key
            row = _measure_detection(model, bf16_fwd, int8_fwd, batch_fn, eval_key, args.eval_batches, batch)
        elif task == "segmentation":
            from holocron_tpu.quant import measure_agreement_segmentation

            eval_x = [batch_fn(jax.random.key(3000 + i), batch)[0] for i in range(args.eval_batches)]
            acc_bf16 = evaluate_dense(bf16_fwd, batch_fn, eval_key, args.eval_batches, batch)
            acc_int8 = evaluate_dense(int8_fwd, batch_fn, eval_key, args.eval_batches, batch)
            gate = measure_agreement_segmentation(bf16_fwd, int8_fwd, eval_x)
            row = {
                "acc_bf16": round(acc_bf16, 4),
                "acc_int8": round(acc_int8, 4),
                "pixel_agreement": round(gate["pixel_agreement"], 4),
                "mean_mask_iou": round(gate["mean_mask_iou"], 4),
            }
        else:
            eval_x = [batch_fn(jax.random.key(3000 + i), batch)[0] for i in range(args.eval_batches)]
            acc_bf16 = evaluate(bf16_fwd, batch_fn, eval_key, args.eval_batches, batch)
            acc_int8 = evaluate(int8_fwd, batch_fn, eval_key, args.eval_batches, batch)
            gate = measure_agreement(bf16_fwd, int8_fwd, eval_x)
            row = {
                "acc_bf16": round(acc_bf16, 4),
                "acc_int8": round(acc_int8, 4),
                "top1_agreement": round(gate["top1_agreement"], 4),
                "max_prob_drift": round(gate["max_prob_drift"], 5),
            }
        row = {
            "arch": arch,
            "task": task,
            "weights": "checkpoint" if arch in checkpoints else f"trained {args.steps} steps (loss {final_loss:.3f})",
            **row,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:  # append per row: a later arch crashing must not lose results
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")

    print("\n| arch | task | weights | bf16 acc | int8 acc | agreement |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        agreement = r.get("top1_agreement", r.get("pixel_agreement", r.get("det_f1", float("nan"))))
        acc_b, acc_q = r.get("acc_bf16", float("nan")), r.get("acc_int8", float("nan"))
        print(f"| {r['arch']} | {r['task']} | {r['weights']} | {acc_b:.3f} | {acc_q:.3f} | {agreement:.3f} |")
    return 0


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--archs", nargs="+", default=["repvgg_a0", "resnet50"])
    parser.add_argument("--steps", default=300, type=int)
    parser.add_argument("--batch", default=64, type=int)
    parser.add_argument("--size", default=64, type=int)
    parser.add_argument("--eval-batches", default=4, type=int)
    parser.add_argument("--checkpoint", nargs="*", default=[], help="arch=path.mpk pairs")
    parser.add_argument("--out", default="", help="append JSONL rows here")
    parser.add_argument("--cpu", action="store_true")
    sys.exit(main(parser.parse_args()))
