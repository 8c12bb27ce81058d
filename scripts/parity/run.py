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
        denom = max(float(np.max(np.abs(np.asarray(jax.tree.leaves(gp)[0])))), 1e-12)
        for path, ref_leaf in flat_ref:
            got_leaf = flat_got.get(path)
            if got_leaf is None:
                continue
            ref_np = np.asarray(ref_leaf, np.float64)
            scale = max(float(np.max(np.abs(ref_np))), 1e-8)
            worst = max(worst, float(np.max(np.abs(np.asarray(got_leaf, np.float64) - ref_np))) / scale)
        tol = 1e-4
        ok = rel_x <= tol and worst <= tol
        print(f"{arch:24s} dL/dx rel={rel_x:.2e}  worst dL/dW rel={worst:.2e}  ({'PASS' if ok else 'FAIL'} tol={tol:.0e})")
        if not ok:
            failures.append(arch)
        _ = denom
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
    else:
        failures = run_api()
    if failures:
        print(f"\nFAILURES: {failures}")
        sys.exit(1)
    print("\nall parity checks passed")


if __name__ == "__main__":
    main()
