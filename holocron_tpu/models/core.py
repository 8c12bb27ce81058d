"""The callable model bundle: a Flax module + its variables behind a torch-like facade.

The reference's factories return stateful ``nn.Module`` objects
(``model = repvgg_a0(); model(x)``). The JAX-native equivalent bundles an immutable
linen module with its variable pytree and exposes:

- ``model(x)`` — jit-cached eval forward (pure; no state mutation),
- ``model.module / model.variables`` — the functional pieces for custom jit/pjit,
- ``model.reparametrize()`` — train->deploy branch fusion where the arch supports it,
- lazy parameter init from the first input's shape (so factories stay O(1)).
"""

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .checkpoints import Checkpoint

__all__ = ["Model"]


class Model:
    """Bundles a linen module with its variables; callable like a torch module.

    Args:
        module: a linen module whose ``__call__`` signature is ``(x, train=False)``
        variables: optional pre-initialized variables (e.g. from a checkpoint)
        default_cfg: checkpoint metadata (the reference's ``model.default_cfg``)
        seed: PRNG seed used for lazy initialization
    """

    def __init__(
        self,
        module,
        variables: Optional[Dict[str, Any]] = None,
        default_cfg: Optional[Checkpoint] = None,
        seed: int = 0,
    ) -> None:
        self.module = module
        self.variables = variables
        self.default_cfg = default_cfg
        self._seed = seed
        self._eval_fn: Optional[Callable] = None
        self._train_fns: Dict[Any, Callable] = {}
        self._input_shape = None
        self._forward_order = None
        # True once released weights were actually loaded — lets CLIs/tests fail loudly
        # when pretrained=True silently degraded to default init (e.g. offline)
        self.pretrained_loaded = False

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def init(self, input_shape, key: Optional[jax.Array] = None, dtype=jnp.float32) -> "Model":
        """Initializes variables for the given ``(N, H, W, C)`` input shape."""
        key = key if key is not None else jax.random.key(self._seed)
        self._input_shape = tuple(input_shape)
        dummy = jnp.zeros(input_shape, dtype)
        # jitting init fuses the whole initialization into one compiled program —
        # much faster than eager op-by-op dispatch, especially on CPU
        self.variables = jax.jit(lambda k, x: self.module.init(k, x, train=False))(key, dummy)
        return self

    def _ensure_init(self, x: jax.Array) -> None:
        if self._input_shape is None:
            self._input_shape = tuple(jnp.shape(x))
        if self.variables is None:
            self.init(x.shape, dtype=x.dtype)

    def forward_order(self, input_shape=None):
        """Submodule paths in forward-call order (cached; traced via eval_shape).

        Feeds :func:`~holocron_tpu.trainer.utils.freeze_model` so ``freeze_until``
        follows true forward order, not the name-sorted flax tree order.
        """
        if self._forward_order is None:
            shape = input_shape or self._input_shape
            if shape is None:
                raise RuntimeError("unknown input shape — run a forward pass or pass input_shape")
            if self.variables is None:
                self.init(shape)
            from ..trainer.utils import module_forward_order

            self._forward_order = module_forward_order(self.module, self.variables, shape)
        return self._forward_order

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------
    def __call__(self, x: jax.Array, train: bool = False, rngs: Optional[Dict[str, jax.Array]] = None):
        self._ensure_init(x)
        if train:
            # convenience training forward: updates running stats in place
            mutable = tuple(k for k in self.variables if k != "params")
            fn_key = (mutable, rngs is None)
            if fn_key not in self._train_fns:
                module = self.module
                if rngs is None:
                    self._train_fns[fn_key] = jax.jit(
                        lambda variables, inp: module.apply(variables, inp, train=True, mutable=list(mutable))
                    )
                else:
                    self._train_fns[fn_key] = jax.jit(
                        lambda variables, inp, r: module.apply(
                            variables, inp, train=True, rngs=r, mutable=list(mutable)
                        )
                    )
            fn = self._train_fns[fn_key]
            out, updates = fn(self.variables, x) if rngs is None else fn(self.variables, x, rngs)
            self.variables = {**self.variables, **updates}
            return out
        if self._eval_fn is None:
            module = self.module
            self._eval_fn = jax.jit(lambda variables, inp: module.apply(variables, inp, train=False))
        return self._eval_fn(self.variables, x)

    def deploy_forward(self) -> Callable:
        """Returns an eval forward with the CURRENT variables baked into the jit as
        compile-time constants.

        XLA folds constant weights into the executable (pre-tiled layouts, folded
        scale chains): measured +7% on bf16 RepVGG-A0 batch-256 inference and +27%
        on the selective-int8 form vs passing weights as runtime arguments
        (docs/PERF.md). The trade-offs vs ``model(x)``: weights are snapshotted (a
        later ``load_variables``/``reparametrize``/train forward does NOT update the
        returned fn — call again for a fresh snapshot) and the executable owns a
        second copy of the weights in HBM. Use for serving/benching, not training.
        Gains are arch-dependent (parity to +112%, docs/PERF.md); remote-compile
        setups cap the constant-laden HLO size (~400 MB ≈ 100M f32 params).
        """
        if self.variables is None:
            raise RuntimeError("initialize the model first (run a forward or .init())")
        module, variables = self.module, self.variables
        return jax.jit(lambda inp: module.apply(variables, inp, train=False))

    # ------------------------------------------------------------------
    # parameter access
    # ------------------------------------------------------------------
    @property
    def params(self):
        return None if self.variables is None else self.variables.get("params")

    @property
    def state(self):
        return None if self.variables is None else {k: v for k, v in self.variables.items() if k != "params"}

    @property
    def num_params(self) -> int:
        if self.variables is None:
            return 0
        return sum(leaf.size for leaf in jax.tree.leaves(self.variables.get("params", {})))

    def load_variables(self, variables: Dict[str, Any]) -> None:
        self.variables = variables
        self._eval_fn = None
        self._train_fns = {}

    def stage_variables(self, prefix: str) -> Dict[str, Any]:
        """Stacked variables of the ``{prefix}0, {prefix}1, …`` sibling-block run —
        the :func:`~holocron_tpu.parallel.pipeline_blocks` input form. The Model
        hook for pipeline parallelism: e.g. ``darknet53`` exposes its 8-block
        512-channel stage as ``model.stage_variables("layer_3_block_")``. See
        :func:`holocron_tpu.parallel.pipeline_module` and docs scaling guide."""
        if self.variables is None:
            raise RuntimeError("model parameters are not initialized — run init() first")
        from ..parallel.pipeline import stack_stage_variables

        return stack_stage_variables(self.variables, prefix)

    # ------------------------------------------------------------------
    # reparametrization (RepVGG / MobileOne style)
    # ------------------------------------------------------------------
    def reparametrize(self, **kwargs: Any) -> "Model":
        """Fuses training-time branches into deploy form, in place.

        Dispatches to the module's ``reparametrize(variables, **kwargs)`` which must
        return ``(deploy_module, deploy_variables)``. Mirrors the reference's in-place
        ``model.reparametrize()`` (holocron/models/classification/repvgg.py:166-171).
        Module-specific options pass through — e.g. RepVGG's ``s2d_stem=True`` folds
        the stem into its space-to-depth form.
        """
        if not hasattr(self.module, "reparametrize"):
            raise NotImplementedError(f"{type(self.module).__name__} does not support reparametrization")
        if self.variables is None:
            raise RuntimeError("model parameters are not initialized yet — run a forward or call .init() first")
        self.module, self.variables = self.module.reparametrize(self.variables, **kwargs)
        self._eval_fn = None
        self._train_fns = {}
        self._forward_order = None
        return self

    def __repr__(self) -> str:
        status = "initialized" if self.variables is not None else "uninitialized"
        return f"Model({type(self.module).__name__}, {status}, num_params={self.num_params})"
