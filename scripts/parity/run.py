#!/usr/bin/env python
"""In-tree numerical-parity harness vs the reference (frgfm/Holocron).

Reproduces the docs/PARITY.md tables from a clean checkout:

    python scripts/parity/run.py model repvgg_a0            # one row
    python scripts/parity/run.py model --all                # the full-model table
    python scripts/parity/run.py grad repvgg_a0 resnet18    # gradient parity
    python scripts/parity/run.py optim lamb adan            # optimizer trajectories
    python scripts/parity/run.py api                        # public-symbol diff

Requirements (auto-skips with exit 0 when absent): torch, and the reference
checkout at $HOLOCRON_REF (default /root/reference). torchvision/fastprogress are
stubbed from ``_stubs/`` when not installed (math-bearing pieces implemented
faithfully there — see _stubs/tv/torchvision/__init__.py).

Method (mirrors the reference's own equivalence tests,
/root/reference/tests/test_models_classification.py:28-63): instantiate the torch
reference model, randomize BN statistics, convert its state dict through
holocron_tpu/models/_torch_convert.py, compare outputs/gradients on identical
inputs at f32 highest-precision matmuls. Gradient parity converts the *torch
gradients* through the same (purely layout-transposing) converter, so entire
gradient trees are compared — not just one conv.
"""

import argparse
import importlib
import os
import sys
import types
import warnings

REF = os.environ.get("HOLOCRON_REF", "/root/reference")
STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_stubs")

# PARITY.md full-model table (classification + the dynamic-unet graft)
MODEL_ARCHS = [
    "repvgg_a0", "repvgg_a1", "repvgg_a2", "repvgg_b0", "repvgg_b1", "repvgg_b2",
    "resnet18", "resnet34", "resnet50", "resnet50d", "resnext50_32x4d",
    "res2net50_26w_4s", "sknet50", "tridentnet50", "pyconv_resnet50",
    "rexnet1_0x", "rexnet1_3x",
    "darknet24", "darknet19", "darknet53", "cspdarknet53", "cspdarknet53_mish",
    "mobileone_s0", "mobileone_s1", "mobileone_s2", "mobileone_s3",
    "convnext_atto", "convnext_tiny",
    "unet_rexnet13",
]
GRAD_ARCHS = ["repvgg_a0", "rexnet1_0x", "resnet18", "darknet19"]
OPTIMIZERS = ["lars", "lamb", "ralars", "tadam", "adabelief", "adamp", "adan", "ademamix", "lookahead", "scout"]

# per-arch tolerance on max-rel output error (defaults to 5e-6); segmentation grafts
# accumulate over much deeper upsampling chains
MODEL_TOL = {"convnext_atto": 5e-5, "convnext_tiny": 5e-5, "unet_rexnet13": 1e-5}
DEFAULT_MODEL_TOL = 5e-6
REPARAM_TOL = 1e-3  # the reference's own contract (tests/test_models_classification.py:45)


def _skip(msg: str):
    print(f"SKIP: {msg}")
    sys.exit(0)


def setup():
    try:
        import torch  # noqa: F401
    except ImportError:
        _skip("torch not installed (parity needs the [test] extra)")
    if not os.path.isdir(os.path.join(REF, "holocron")):
        _skip(f"reference checkout not found at {REF} (set HOLOCRON_REF)")
    for pkg, sub in (("torchvision", "tv"), ("fastprogress", "fp")):
        try:
            importlib.import_module(pkg)
        except ImportError:
            sys.path.insert(0, os.path.join(STUBS, sub))
    sys.path.insert(0, REF)
    # `python scripts/parity/run.py` puts scripts/parity first on sys.path, not the
    # repo root — make holocron_tpu importable from a clean checkout
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if repo_root not in sys.path:
        sys.path.insert(1, repo_root)
    # the reference generates holocron/version.py at build time
    v = types.ModuleType("holocron.version")
    v.__version__ = "0.0.0+parity-ref"
    sys.modules["holocron.version"] = v
    warnings.filterwarnings("ignore")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")


def _randomize_bn(tm):
    import torch

    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                if mod.weight is not None:
                    mod.weight.normal_(1, 0.2)
                    mod.bias.normal_(0, 0.2)


def _resolve(ns, arch: str):
    for sub in ("", "segmentation", "detection"):
        mod = getattr(ns, sub) if sub else ns
        if hasattr(mod, arch):
            return getattr(mod, arch)
    raise AttributeError(f"{arch} not found in {ns.__name__}")


def _build_pair(arch: str, seed: int = 0):
    import torch

    import holocron  # the reference
    import holocron_tpu
    from holocron_tpu.models._torch_convert import convert_state_dict

    torch.manual_seed(seed)
    ref_factory = _resolve(holocron.models, arch)
    # dynamic-unet grafts default to pretrained_backbone=True (a download) — the
    # parity comparison converts whatever weights got instantiated, so skip it
    kwargs = {"pretrained_backbone": False} if arch.startswith("unet_") else {}
    tm = ref_factory(pretrained=False, **kwargs).eval()
    jkwargs = dict(kwargs) if arch.startswith("unet_") else {}
    _randomize_bn(tm)
    jm = _resolve(holocron_tpu.models, arch)(**jkwargs)
    jm.load_variables(convert_state_dict(jm, tm.state_dict()))
    return tm, jm


def _rel_err(a, b) -> float:
    import numpy as np

    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12))


def run_model(archs, size: int = 64):
    import jax.numpy as jnp
    import numpy as np
    import torch

    failures = []
    for arch in archs:
        tol = MODEL_TOL.get(arch, DEFAULT_MODEL_TOL)
        try:
            tm, jm = _build_pair(arch)
        except Exception as e:
            print(f"{arch:24s} ERROR building/converting: {e}")
            failures.append(arch)
            continue
        x = np.random.default_rng(0).normal(size=(2, 3, size, size)).astype(np.float32)
        with torch.no_grad():
            expected = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(jm(jnp.asarray(x.transpose(0, 2, 3, 1))))
        if expected.ndim == 4:  # segmentation maps come back NCHW from torch
            got = got.transpose(0, 3, 1, 2)
        rel = _rel_err(got, expected)
        ok = rel <= tol
        line = f"{arch:24s} rel={rel:.2e}  ({'PASS' if ok else 'FAIL'} tol={tol:.0e})"
        if hasattr(jm, "reparametrize") and hasattr(tm, "reparametrize"):
            jm.reparametrize()
            drift = _rel_err(np.asarray(jm(jnp.asarray(x.transpose(0, 2, 3, 1)))), expected)
            ok = ok and drift <= REPARAM_TOL
            line += f"  reparam_drift={drift:.2e} ({'PASS' if drift <= REPARAM_TOL else 'FAIL'} tol={REPARAM_TOL:.0e})"
        print(line)
        if not ok:
            failures.append(arch)
    return failures


def run_grad(archs, size: int = 64):
    """Whole-tree gradient parity: torch grads are converted through the same
    layout-only converter, so every parameter's dL/dW is compared (plus dL/dx)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from holocron_tpu.models._torch_convert import convert_state_dict

    failures = []
    for arch in archs:
        tm, jm = _build_pair(arch)
        x = np.random.default_rng(1).normal(size=(2, 3, size, size)).astype(np.float32)
        y = np.array([1, 3])

        # torch side
        xt = torch.from_numpy(x).requires_grad_(True)
        loss = torch.nn.functional.cross_entropy(tm(xt), torch.from_numpy(y))
        loss.backward()
        grad_x = xt.grad.numpy()
        # grads in state-dict form -> converted through the (linear) layout maps
        grad_sd = {}
        params = dict(tm.named_parameters())
        for k, v in tm.state_dict().items():
            g = params[k].grad if k in params and params[k].grad is not None else None
            grad_sd[k] = g if g is not None else torch.zeros_like(v)
        grad_tree_ref = convert_state_dict(jm, grad_sd)
        grad_tree_ref.pop("__partial__", None)

        # jax side
        def loss_fn(p, xin):
            variables = {**jm.variables, "params": p}
            logits = jm.module.apply(variables, xin, train=False)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(y.shape[0]), jnp.asarray(y)])

        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        (gp, gx) = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(jm.variables["params"], xj)
        rel_x = _rel_err(np.asarray(gx).transpose(0, 3, 1, 2), grad_x)

        flat_ref = jax.tree_util.tree_flatten_with_path(grad_tree_ref.get("params", grad_tree_ref))[0]
        flat_got = dict(jax.tree_util.tree_flatten_with_path(gp)[0])
        worst = 0.0
        compared = 0
        for path, ref_leaf in flat_ref:
            got_leaf = flat_got.get(path)
            if got_leaf is None:
                continue
            compared += 1
            ref_np = np.asarray(ref_leaf, np.float64)
            scale = max(float(np.max(np.abs(ref_np))), 1e-8)
            worst = max(worst, float(np.max(np.abs(np.asarray(got_leaf, np.float64) - ref_np))) / scale)
        # coverage gate: a converter layout drift must FAIL the suite, not skip it —
        # every JAX param leaf needs a matching converted reference gradient
        coverage = compared / max(len(flat_got), 1)
        tol = 1e-4
        ok = rel_x <= tol and worst <= tol and coverage == 1.0
        print(
            f"{arch:24s} dL/dx rel={rel_x:.2e}  worst dL/dW rel={worst:.2e}  "
            f"coverage={compared}/{len(flat_got)}  ({'PASS' if ok else 'FAIL'} tol={tol:.0e})"
        )
        if not ok:
            failures.append(arch)
    return failures


def run_optim(names, steps: int = 10):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    import holocron.optim as ref_optim
    import holocron_tpu.optim as our_optim

    shapes = [(8,), (4, 5), (3, 3, 2, 2)]
    rng = np.random.default_rng(0)
    init = [rng.normal(size=s).astype(np.float32) for s in shapes]
    grads = [[rng.normal(size=s).astype(np.float32) for s in shapes] for _ in range(steps + 2)]

    cfgs = {
        "lars": (lambda p: ref_optim.LARS(p, lr=0.01, momentum=0.9, weight_decay=1e-4),
                 lambda: our_optim.lars(0.01, momentum=0.9, weight_decay=1e-4)),
        "lamb": (lambda p: ref_optim.LAMB(p, lr=0.01, weight_decay=0.01),
                 lambda: our_optim.lamb(0.01, weight_decay=0.01)),
        "ralars": (lambda p: ref_optim.RaLars(p, lr=0.01),
                   lambda: our_optim.ralars(0.01)),
        "tadam": (lambda p: ref_optim.TAdam(p, lr=0.01),
                  lambda: our_optim.tadam(0.01)),
        "adabelief": (lambda p: ref_optim.AdaBelief(p, lr=0.01),
                      lambda: our_optim.adabelief(0.01)),
        "adamp": (lambda p: ref_optim.AdamP(p, lr=0.01),
                  lambda: our_optim.adamp(0.01)),
        "adan": (lambda p: ref_optim.Adan(p, lr=0.01),
                 lambda: our_optim.adan(0.01)),
        "ademamix": (lambda p: ref_optim.AdEMAMix(p, lr=0.01),
                     lambda: our_optim.ademamix(0.01)),
        "lookahead": (lambda p: ref_optim.wrapper.Lookahead(torch.optim.SGD(p, lr=0.05), sync_rate=0.5, sync_period=3),
                      lambda: our_optim.lookahead(optax.sgd(0.05), sync_rate=0.5, sync_period=3)),
        "scout": (lambda p: ref_optim.wrapper.Scout(torch.optim.SGD(p, lr=0.05), sync_rate=0.5, sync_period=4),
                  lambda: our_optim.scout(optax.sgd(0.05), sync_rate=0.5, sync_period=4)),
    }
    failures = []
    for name in names:
        ref_fac, our_fac = cfgs[name]
        n_steps = 12 if name in ("lookahead", "scout") else steps

        tparams = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in init]
        topt = ref_fac(tparams)
        for i in range(n_steps):
            for p, g in zip(tparams, grads[i]):
                p.grad = torch.from_numpy(g.copy())
            topt.step()

        jparams = [jnp.asarray(p) for p in init]
        tx = our_fac()
        state = tx.init(jparams)

        @jax.jit
        def step(params, state, g):
            updates, state = tx.update(g, state, params)
            return optax.apply_updates(params, updates), state

        for i in range(n_steps):
            jparams, state = step(jparams, state, [jnp.asarray(g) for g in grads[i]])

        rel = max(
            _rel_err(j, p.detach().numpy()) for j, p in zip(jparams, tparams)
        )
        # adan: the reference never updates prev_grad (documented bug) — we follow the
        # paper, so divergence is EXPECTED there
        tol = 1.0 if name == "adan" else 1e-5
        ok = rel <= tol
        extra = "  (expected divergence: reference prev_grad bug)" if name == "adan" else ""
        print(f"{name:12s} rel={rel:.2e}  ({'PASS' if ok else 'FAIL'} tol={tol:.0e}){extra}")
        if not ok:
            failures.append(name)
    return failures


def _convert_nn_state(sd, rules):
    """Maps a torch nn-module state dict onto our flat variable paths via per-module
    rules ``{torch_prefix: (our_path, kind)}`` — all maps are layout-only."""
    import numpy as np

    out = {}
    for tkey, arr in sd.items():
        if tkey.endswith("num_batches_tracked"):
            continue
        a = arr.detach().numpy()
        for prefix, (dest, kind) in rules.items():
            if tkey == prefix or tkey.startswith(prefix + "."):
                suffix = tkey[len(prefix):].lstrip(".")
                if kind == "conv":
                    if suffix == "weight":
                        out[f"params/{dest}/kernel"] = a.transpose(2, 3, 1, 0)
                    else:
                        out[f"params/{dest}/bias"] = a
                elif kind == "bn":
                    dest_key = {
                        "weight": f"params/{dest}/scale",
                        "bias": f"params/{dest}/bias",
                        "running_mean": f"batch_stats/{dest}/mean",
                        "running_var": f"batch_stats/{dest}/var",
                    }[suffix]
                    out[dest_key] = a
                elif kind == "direct":
                    out[dest] = a
                elif kind == "lambda_R":  # (k, u, 1, r, r) -> (r, r, u, k)
                    out[dest] = a.squeeze(2).transpose(2, 3, 1, 0)
                break
        else:
            raise KeyError(f"unmapped torch key {tkey}")
    return out


def _nn_specs():
    """(name, ref_factory, our_factory, rules, in_channels, spatial) — rules=None
    means parameter-free (no conversion needed)."""
    import holocron.nn as ref_nn

    import holocron_tpu.nn as our_nn

    tri_rules = {}
    for b in ("c_branch", "h_branch", "w_branch"):
        tri_rules[f"{b}.compress.1"] = (f"{b}/conv", "conv")
        tri_rules[f"{b}.compress.2"] = (f"{b}/bn", "bn")
    return [
        ("SAM", lambda: ref_nn.SAM(8), lambda: our_nn.SAM(), {"conv": ("conv", "conv")}, 8, 12),
        ("TripletAttention", lambda: ref_nn.TripletAttention(), lambda: our_nn.TripletAttention(), tri_rules, 8, 12),
        ("FReLU", lambda: ref_nn.FReLU(8), lambda: our_nn.FReLU(),
         {"conv": ("conv", "conv"), "bn": ("bn", "bn")}, 8, 12),
        ("SlimConv2d", lambda: ref_nn.SlimConv2d(8, 3, padding=1, r=2, L=2),
         lambda: our_nn.SlimConv2d(3, padding=1, r=2, L=2),
         {k: (k, "conv") for k in ("fc1", "fc2", "conv_top", "conv_bot1", "conv_bot2")} | {"bn": ("bn", "bn")},
         8, 12),
        ("PyConv2d", lambda: ref_nn.PyConv2d(8, 8, 3, num_levels=3, padding=1),
         lambda: our_nn.PyConv2d(8, 3, num_levels=3, padding=1),
         {str(i): (f"level{i}", "conv") for i in range(3)}, 8, 12),
        ("Involution2d", lambda: ref_nn.Involution2d(8, 3, padding=1, groups=2, reduction_ratio=2),
         lambda: our_nn.Involution2d(3, padding=1, groups=2, reduction_ratio=2),
         {"reduce": ("reduce", "conv"), "span": ("span", "conv")}, 8, 12),
        ("LambdaLayer(pos_emb)", lambda: ref_nn.LambdaLayer(8, 8, dim_k=4, n=144, num_heads=2),
         lambda: our_nn.LambdaLayer(8, dim_k=4, n=144, num_heads=2),
         {"to_q": ("to_q", "conv"), "to_k": ("to_k", "conv"), "to_v": ("to_v", "conv"),
          "norm_q": ("norm_q", "bn"), "norm_v": ("norm_v", "bn"),
          "pos_emb": ("params/pos_emb", "direct")}, 8, 12),
        ("LambdaLayer(local r=3)", lambda: ref_nn.LambdaLayer(8, 8, dim_k=4, r=3, num_heads=2),
         lambda: our_nn.LambdaLayer(8, dim_k=4, r=3, num_heads=2),
         {"to_q": ("to_q", "conv"), "to_k": ("to_k", "conv"), "to_v": ("to_v", "conv"),
          "norm_q": ("norm_q", "bn"), "norm_v": ("norm_v", "bn"),
          "R": ("params/R", "lambda_R")}, 8, 12),
        ("NormConv2d", lambda: ref_nn.NormConv2d(8, 6, 3, padding=1),
         lambda: our_nn.NormConv2d(6, 3, padding=1),
         {"weight": ("", "conv_root_w"), "bias": ("", "conv_root_b")}, 8, 12),
        ("Add2d", lambda: ref_nn.Add2d(8, 6, 3, padding=1),
         lambda: our_nn.Add2d(6, 3, padding=1),
         {"weight": ("", "conv_root_w"), "bias": ("", "conv_root_b")}, 8, 12),
        # parameter-free
        ("HardMish", lambda: ref_nn.HardMish(), lambda: our_nn.HardMish(), None, 8, 12),
        ("NLReLU", lambda: ref_nn.NLReLU(), lambda: our_nn.NLReLU(), None, 8, 12),
        ("ZPool", lambda: ref_nn.ZPool(dim=1), lambda: our_nn.ZPool(), None, 8, 12),
        ("ConcatDownsample2d", lambda: ref_nn.ConcatDownsample2d(2), lambda: our_nn.ConcatDownsample2d(2), None, 8, 12),
        ("GlobalAvgPool2d", lambda: ref_nn.GlobalAvgPool2d(flatten=True), lambda: our_nn.GlobalAvgPool2d(flatten=True), None, 8, 12),
        ("SPP [5,9,13]", lambda: ref_nn.SPP([5, 9, 13]), lambda: our_nn.SPP([5, 9, 13]), None, 8, 16),
        ("BlurPool2d k3", lambda: ref_nn.BlurPool2d(8, 3, stride=2), lambda: our_nn.BlurPool2d(3, stride=2), None, 8, 13),
        ("BlurPool2d k5", lambda: ref_nn.BlurPool2d(8, 5, stride=2), lambda: our_nn.BlurPool2d(5, stride=2), None, 8, 13),
    ]


def run_nn(tol: float = 5e-6):
    """nn-module parity with converted weights (the docs/PARITY.md nn table)."""
    import flax
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    failures = []
    for name, ref_fac, our_fac, rules, in_c, size in _nn_specs():
        torch.manual_seed(0)
        tm = ref_fac().eval()
        _randomize_bn(tm)
        ours = our_fac()
        x = np.random.default_rng(0).normal(size=(2, in_c, size, size)).astype(np.float32)
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        try:
            variables = ours.init(jax.random.key(0), xj)
        except TypeError:
            variables = ours.init(jax.random.key(0), xj, False)
        if rules is not None:
            if any(kind.startswith("conv_root") for _, kind in rules.values()):
                sd = tm.state_dict()
                flat = {
                    "params/kernel": sd["weight"].numpy().transpose(2, 3, 1, 0),
                    "params/bias": sd["bias"].numpy(),
                }
            else:
                flat = _convert_nn_state(tm.state_dict(), rules)
            variables = flax.traverse_util.unflatten_dict(
                {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()}
            )
        try:
            got = ours.apply(variables, xj)
        except TypeError:
            got = ours.apply(variables, xj, False)
        with torch.no_grad():
            expected = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(got)
        if expected.ndim == 4:
            got = got.transpose(0, 3, 1, 2)
        rel = _rel_err(got, expected)
        ok = rel <= tol
        print(f"{name:24s} rel={rel:.2e}  ({'PASS' if ok else 'FAIL'} tol={tol:.0e})")
        if not ok:
            failures.append(name)
    return failures


def run_yolo():
    """YOLOv4 YoloLayer loss A/B: identical raw head outputs + targets through the
    reference's per-image-loop implementation and our dense masked one
    (docs/PARITY.md "YOLOv4 YoloLayer A/B").

    Two documented reference bugs are mimicked to make the comparison exact:
    - its ignore-thresh write lands on an advanced-indexing copy (no-op), so our
      layer runs with ignore_thresh=2.0 (never triggers) for the A/B;
    - its CIoU αv term never lands (masked addcdiv_ on a copy), so its "CIoU" is
      numerically DIoU — our bbox loss is compared with ciou_loss swapped for
      diou_loss, and separately reported with the real CIoU to show the αv delta.
    """
    import jax.numpy as jnp
    import numpy as np
    import torch

    # the factory functions shadow the module names in the package namespaces
    ref_y = importlib.import_module("holocron.models.detection.yolov4")
    our_y = importlib.import_module("holocron_tpu.models.detection.yolov4")
    our_ops = importlib.import_module("holocron_tpu.ops")

    h = w = 13
    num_anchors, num_classes = 3, 5
    anchors = np.array([[0.08, 0.1], [0.2, 0.25], [0.4, 0.5]], np.float32)
    tl = ref_y.YoloLayer(torch.from_numpy(anchors), num_classes=num_classes, scale_xy=1.1).train()
    ol = our_y.YoloLayer([tuple(a) for a in anchors], num_classes=num_classes, scale_xy=1.1, ignore_thresh=2.0)

    rng = np.random.default_rng(0)
    raw = rng.normal(scale=1.0, size=(2, num_anchors * (5 + num_classes), h, w)).astype(np.float32)

    scenarios = {
        "1 GT / image": [
            {"boxes": np.array([[0.1, 0.1, 0.4, 0.5]], np.float32), "labels": np.array([2])},
            {"boxes": np.array([[0.55, 0.3, 0.9, 0.85]], np.float32), "labels": np.array([4])},
        ],
        "multi GT (3, 5)": [
            {"boxes": rng.uniform(0, 0.45, (3, 4)).astype(np.float32) + np.array([0, 0, 0.5, 0.5], np.float32),
             "labels": rng.integers(0, num_classes, 3)},
            {"boxes": rng.uniform(0, 0.45, (5, 4)).astype(np.float32) + np.array([0, 0, 0.5, 0.5], np.float32),
             "labels": rng.integers(0, num_classes, 5)},
        ],
        "empty GT in batch": [
            {"boxes": np.zeros((0, 4), np.float32), "labels": np.zeros((0,), np.int64)},
            {"boxes": np.array([[0.2, 0.2, 0.7, 0.7]], np.float32), "labels": np.array([1])},
        ],
    }

    failures = []
    orig_ciou = our_y.ciou_loss
    for name, target in scenarios.items():
        t_target = [{k: torch.from_numpy(np.asarray(v)) for k, v in d.items()} for d in target]
        with torch.no_grad():
            ref_losses = tl(torch.from_numpy(raw), t_target)

        max_boxes = max(len(d["labels"]) for d in target) or 1
        boxes = np.zeros((2, max_boxes, 4), np.float32)
        labels = np.zeros((2, max_boxes), np.int32)
        mask = np.zeros((2, max_boxes), bool)
        for i, d in enumerate(target):
            m = len(d["labels"])
            boxes[i, :m] = d["boxes"]
            labels[i, :m] = d["labels"]
            mask[i, :m] = True
        padded = {"boxes": jnp.asarray(boxes), "labels": jnp.asarray(labels), "mask": jnp.asarray(mask)}
        raw_j = jnp.asarray(raw.transpose(0, 2, 3, 1))

        try:
            our_y.ciou_loss = our_ops.diou_loss  # mimic the reference's dead αv term
            our_losses_diou = {k: float(v) for k, v in ol(raw_j, padded).items()}
        finally:
            our_y.ciou_loss = orig_ciou
        our_losses_ciou = {k: float(v) for k, v in ol(raw_j, padded).items()}

        line = [f"{name:20s}"]
        ok = True
        for key in ("obj_loss", "noobj_loss", "clf_loss", "bbox_loss"):
            ref_v = float(ref_losses[key])
            our_v = our_losses_diou[key]
            rel = abs(our_v - ref_v) / max(abs(ref_v), 1e-9)
            ok = ok and rel <= 1e-5
            line.append(f"{key.split('_')[0]}={rel:.1e}")
        alpha_v = our_losses_ciou["bbox_loss"] - our_losses_diou["bbox_loss"]
        line.append(f"(real-CIoU αv delta {alpha_v:+.4f})")
        print("  ".join(line) + ("  PASS" if ok else "  FAIL"))
        if not ok:
            failures.append(name)
    return failures


def run_api():
    """Public-symbol diff: every reference public name must exist here."""
    import holocron
    import holocron_tpu

    pairs = [
        ("models", holocron.models, holocron_tpu.models),
        ("models.classification", holocron.models.classification, holocron_tpu.models.classification),
        ("models.segmentation", holocron.models.segmentation, holocron_tpu.models.segmentation),
        ("models.detection", holocron.models.detection, holocron_tpu.models.detection),
        ("nn", holocron.nn, holocron_tpu.nn),
        ("nn.functional", holocron.nn.functional, holocron_tpu.nn.functional),
        ("ops", holocron.ops, holocron_tpu.ops),
        ("optim", holocron.optim, holocron_tpu.optim),
        ("trainer", holocron.trainer, holocron_tpu.trainer),
        ("transforms", holocron.transforms, holocron_tpu.transforms),
        ("utils", holocron.utils, holocron_tpu.utils),
        ("utils.data", holocron.utils.data, holocron_tpu.utils.data),
    ]
    failures = []
    for name, ref, ours in pairs:
        ref_syms = set(getattr(ref, "__all__", None) or [s for s in dir(ref) if not s.startswith("_")])
        missing = sorted(s for s in ref_syms if not hasattr(ours, s))
        status = "PASS" if not missing else f"FAIL missing={missing}"
        print(f"{name:24s} {len(ref_syms):4d} reference symbols  {status}")
        if missing:
            failures.append(name)
    return failures


def main():
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = parser.add_subparsers(dest="suite", required=True)
    p_model = sub.add_parser("model", help="full-model output parity (+reparam drift)")
    p_model.add_argument("archs", nargs="*", help="factory names (default: the PARITY.md set with --all)")
    p_model.add_argument("--all", action="store_true")
    p_model.add_argument("--size", type=int, default=64)
    p_grad = sub.add_parser("grad", help="gradient parity (dL/dx + whole param tree)")
    p_grad.add_argument("archs", nargs="*")
    p_grad.add_argument("--all", action="store_true")
    p_optim = sub.add_parser("optim", help="optimizer trajectory parity")
    p_optim.add_argument("names", nargs="*")
    p_optim.add_argument("--all", action="store_true")
    sub.add_parser("nn", help="nn-module parity with converted weights")
    sub.add_parser("yolo", help="YOLOv4 YoloLayer loss A/B vs the reference loop")
    sub.add_parser("api", help="public symbol diff")
    args = parser.parse_args()

    setup()
    if args.suite == "model":
        archs = MODEL_ARCHS if (args.all or not args.archs) else args.archs
        failures = run_model(archs, size=args.size)
    elif args.suite == "grad":
        archs = GRAD_ARCHS if (args.all or not args.archs) else args.archs
        failures = run_grad(archs)
    elif args.suite == "optim":
        names = OPTIMIZERS if (args.all or not args.names) else args.names
        failures = run_optim(names)
    elif args.suite == "nn":
        failures = run_nn()
    elif args.suite == "yolo":
        failures = run_yolo()
    else:
        failures = run_api()
    if failures:
        print(f"\nFAILURES: {failures}")
        sys.exit(1)
    print("\nall parity checks passed")


if __name__ == "__main__":
    main()
