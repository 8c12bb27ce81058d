"""The training engine: a jitted, mesh-sharded train step behind the reference's
Trainer API.

Reference: holocron/trainer/core.py. The single-GPU stateful loop becomes:

- ONE compiled ``train_step`` (forward + loss + grads + clip + accumulation + optimizer
  update + BN-stat updates) — XLA fuses the whole thing; the Python loop only feeds
  batches and reads the scalar loss,
- AMP -> bf16 compute: parameters and inputs are cast to bfloat16 inside the loss
  function (no GradScaler needed — bf16 has fp32's exponent range),
- gradient accumulation -> ``optax.MultiSteps``; NaN skipping -> ``optax.apply_if_finite``
  with the reference's consecutive-failure tolerance,
- data parallelism over all visible devices via a named mesh: batches are sharded on the
  ``data`` axis, parameters replicated, and XLA inserts the gradient psum over ICI —
  this replaces the reference's ``gpu`` index (SURVEY.md §2i).
"""

import math
from collections import deque
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..models.core import Model
from ..parallel.inference import tensor_parallel_specs
from ..parallel.mesh import batch_sharding, create_mesh
from ..parallel.multihost import host_local_put
from ..parallel.spatial import spatial_sharding
from .utils import freeze_model, split_normalization_params

__all__ = ["Trainer"]


class Trainer:
    """Baseline trainer.

    Args:
        model: a :class:`~holocron_tpu.models.Model` bundle to train
        train_loader: iterable of ``(x, target)`` NHWC numpy/JAX batches
        val_loader: validation iterable
        criterion: ``(output, target) -> scalar loss`` pure function
        optimizer: optax transform, or a factory ``(lr_or_schedule) -> transform``
            (factories enable LR scheduling; our zoo's functions qualify)
        devices: devices for the data-parallel mesh (default: all visible)
        model_parallel: trailing ``model``-axis size of the mesh. Above 1 the
            parameters, batch stats and optimizer moments are channel-sharded over
            that axis (``parallel.tensor_parallel_specs`` — Megatron-style column
            parallelism) and the batch is sharded over the remaining ``data`` axis:
            a DP x TP train step with XLA/GSPMD placing the collectives
        tp_min_channels: narrowest per-channel dimension worth sharding under
            ``model_parallel`` (narrower leaves replicate)
        spatial_parallel: trailing ``spatial``-axis size of the mesh. Above 1 the
            image height of every batch (and of dense targets like segmentation
            masks) is sharded over that axis — spatial partitioning, the path to
            training at resolutions whose activations exceed one chip's HBM.
            XLA/GSPMD places the halo exchanges at the conv seams
            (``parallel/spatial.py``). Mutually exclusive with ``model_parallel``
        shard_opt_state: ZeRO-1-style optimizer-state sharding — moments split
            their trailing channel dim over the ``data`` axis (params replicated,
            GSPMD all-gathers only the final parameter deltas): optimizer memory
            ~1/N with an unchanged trajectory. No-op under ``model_parallel``
            (moments are already channel-sharded there)
        output_file: checkpoint destination
        amp: bf16 mixed-precision compute
        skip_nan_loss: skip optimizer updates on non-finite gradients
        nan_tolerance: consecutive non-finite batches before aborting
        gradient_acc: number of batches to accumulate before each update
        gradient_clip: global-norm gradient clip value
        on_epoch_end: callback fed the epoch's eval metrics
    """

    def __init__(
        self,
        model: Model,
        train_loader: Optional[Iterable] = None,
        val_loader: Optional[Iterable] = None,
        criterion: Optional[Callable] = None,
        optimizer: Union[optax.GradientTransformation, Callable, None] = None,
        devices: Optional[Sequence] = None,
        output_file: str = "./checkpoint.ckpt",
        amp: bool = False,
        skip_nan_loss: bool = False,
        nan_tolerance: int = 5,
        gradient_acc: int = 1,
        gradient_clip: Optional[float] = None,
        on_epoch_end: Optional[Callable[[Dict[str, float]], Any]] = None,
        remat: Union[bool, str] = False,
        partial_batch: str = "pad",
        input_norm: Optional[Tuple[Sequence[float], Sequence[float]]] = None,
        model_parallel: int = 1,
        tp_min_channels: int = 64,
        spatial_parallel: int = 1,
        shard_opt_state: bool = False,
    ) -> None:
        if partial_batch not in ("pad", "drop"):
            raise ValueError(f"partial_batch must be 'pad' or 'drop', got {partial_batch!r}")
        if remat not in (False, True, "full", "dots"):
            raise ValueError(f"remat must be False, True/'full', or 'dots', got {remat!r}")
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.criterion = criterion
        self.optimizer = optimizer
        self.amp = amp
        self.on_epoch_end = on_epoch_end
        self.skip_nan_loss = skip_nan_loss
        self.nan_tolerance = nan_tolerance
        self.gradient_acc = gradient_acc
        self.grad_clip = gradient_clip
        self.remat = remat
        self.partial_batch = partial_batch
        # (mean, std): lets the input pipeline ship uint8 batches over the host->device
        # link (4x fewer bytes than f32 — the link is a tunnel here) and fuses
        # /255-mean-std normalization into the jitted step on device
        self.input_norm = input_norm
        self.output_file = output_file
        self.model_parallel = model_parallel
        self.tp_min_channels = tp_min_channels
        self.spatial_parallel = spatial_parallel
        self.shard_opt_state = shard_opt_state

        self.step = 0
        self.start_epoch = 0
        self.epoch = 0
        self.min_loss = math.inf
        self.lr_recorder: List[float] = []
        self.loss_recorder: List[float] = []

        self.set_device(devices)

        self._tx: Optional[optax.GradientTransformation] = None
        self._opt_state = None
        self._train_step = None
        self._rng = jax.random.key(12)

    # ------------------------------------------------------------------
    # device / mesh handling (replaces the reference's single-GPU binding)
    # ------------------------------------------------------------------
    def set_device(self, devices: Optional[Sequence] = None) -> None:
        """Binds the trainer to a (data[, model]) mesh over the given devices."""
        self.devices = list(devices) if devices is not None else jax.devices()
        mp = getattr(self, "model_parallel", 1)
        sp = getattr(self, "spatial_parallel", 1)
        if mp > 1 and sp > 1:
            raise ValueError(
                "model_parallel and spatial_parallel cannot be combined — pick one "
                "(data parallelism composes with either over the leading axis)"
            )
        if sp > 1:
            self.mesh = create_mesh(self.devices, ("data", "spatial"), model_parallel=sp)
        elif mp > 1:
            self.mesh = create_mesh(self.devices, ("data", "model"), model_parallel=mp)
        elif len(self.devices) > 1:
            self.mesh = create_mesh(self.devices, ("data",))
        else:
            self.mesh = None
        # the grouped-conv execution choice keys on the PER-DEVICE batch; stored here
        # and scoped (nn.modules.conv.data_shards) around this trainer's own jit
        # tracing so the declaration never leaks into unrelated models in-process
        self._data_shards = self.mesh.shape["data"] if self.mesh is not None else 1
        if self.mesh is not None and self.mesh.shape["data"] % jax.process_count() != 0:
            # e.g. 2 hosts x 8 devices with model_parallel=16 leaves a data axis of 1:
            # every host must own an equal slice of the batch axis, so fail loudly here
            # instead of a ZeroDivisionError on the first batch
            raise ValueError(
                f"the mesh data axis ({self.mesh.shape['data']}) must be divisible by the "
                f"process count ({jax.process_count()}) — lower model_parallel/spatial_parallel "
                "so every host keeps a slice of the batch axis"
            )

    def _data_axis_size(self) -> int:
        """Number of batch shards — the ``data`` axis of the mesh (1 un-meshed)."""
        return self.mesh.shape["data"] if self.mesh is not None else 1

    def _pad_partial(self, batch, pad: int):
        """Wrap-pads every leading-batch-dim leaf by ``pad`` repeated samples."""

        def pad_leaf(leaf):
            arr = np.asarray(leaf)
            if arr.ndim == 0:
                return arr
            reps = arr[np.arange(pad) % arr.shape[0]]
            return np.concatenate([arr, reps], axis=0)

        return jax.tree.map(pad_leaf, batch)

    def to_device(self, x, target):
        """Places a host batch on the mesh (data-sharded) or default device.

        A batch whose size does not divide the device count is handled by the
        explicit ``partial_batch`` policy — never by a silent unsharded fallback
        (which would both recompile the train step and train single-chip):
        ``"pad"`` wrap-pads the batch to the next multiple (the duplicated samples
        are counted twice in that step's mean loss — the documented trade-off);
        ``"drop"`` skips the batch (handled by the training loop via
        :meth:`_is_dropped_batch`).

        Multi-host: the batch each host passes here is its OWN loader shard
        (``DataLoader(num_shards="auto")``); :func:`~holocron_tpu.parallel.host_local_put`
        assembles the global array from the per-process shards, so the divisibility
        contract is against the host's local slice of the ``data`` axis.
        """
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # already assembled into a global array by a previous call (the train loop's
            # prefetch places batches ahead of _run_step_async, which calls here again);
            # re-running host_local_put on a global array would crash on the np.asarray
            # of non-addressable shards — and re-assembling would duplicate the batch
            return x, target
        if self.mesh is None:
            return jnp.asarray(x), target if not isinstance(target, (np.ndarray, jnp.ndarray)) else jnp.asarray(target)
        # local batch must divide this host's slice of the data axis
        n = self._data_axis_size() // jax.process_count()
        rem = int(np.shape(x)[0]) % n
        if rem:
            # "drop" batches never reach here (filtered in the loop); pad the rest
            pad = n - rem
            x, target = self._pad_partial((x, target), pad)
        sharding = batch_sharding(self.mesh)
        put = host_local_put
        if "spatial" in self.mesh.axis_names:
            n_sp = self.mesh.shape["spatial"]
            h, w = int(np.shape(x)[1]), int(np.shape(x)[2])
            if h % n_sp != 0:
                raise ValueError(
                    f"spatial_parallel={n_sp} needs the image height to divide; got H={h}"
                )
            sp_sharding = spatial_sharding(self.mesh, batch_axis="data")

            def put_target(t):
                # dense per-pixel targets (seg masks (N, H, W[, C])) shard with the
                # image; everything else (labels, padded box dicts) batch-shards only
                dense = np.ndim(t) >= 3 and np.shape(t)[1] == h and np.shape(t)[2] == w
                return put(t, sp_sharding if dense else sharding)

            return put(x, sp_sharding), jax.tree.map(put_target, target)
        return put(x, sharding), jax.tree.map(lambda t: put(t, sharding), target)

    def _is_dropped_batch(self, x) -> bool:
        return (
            self.partial_batch == "drop"
            and self.mesh is not None
            and int(np.shape(x)[0]) % (self._data_axis_size() // jax.process_count()) != 0
        )

    def _host_batch(self, arr, bs: int) -> np.ndarray:
        """Real (un-padded) rows of a device eval batch, as a host array.

        ``bs`` is THIS process's true batch size before mesh padding. Single-host the
        padding sits at the tail — slice it off. Multi-host the global array is laid
        out as ``process_count`` equal per-host blocks (the sharded loader's
        equal-shard contract keeps ``bs`` in lockstep across hosts), each block's real
        rows first: gather the global value and drop every block's padded tail, so
        every host sees the SAME full validation view and eval counters need no
        further cross-host reduction. A plain ``np.asarray`` here would raise on the
        non-addressable shards — never read eval outputs back any other way.

        Known caveat (torch ``DistributedSampler`` parity): when the val-set size
        does not divide the process count, the sharded loader wrap-pads each shard,
        so up to ``process_count - 1`` samples are counted twice in eval metrics.
        """
        if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
            from jax.experimental import multihost_utils

            g = np.asarray(multihost_utils.process_allgather(arr, tiled=True))
            per = g.shape[0] // jax.process_count()
            return np.concatenate([g[i * per : i * per + bs] for i in range(jax.process_count())])
        return np.asarray(arr)[:bs]

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------
    def save(self, output_file: str) -> None:
        """Saves {epoch, step, min_loss, model variables} (reference core.py:106-124).

        A path with a file suffix writes a single msgpack file; a suffix-less path is
        treated as an orbax checkpoint directory (async-friendly, sharding-aware — the
        TPU-native format for large models).

        Multi-host: on the msgpack path, tensor-parallel shards are replicated
        through a jitted identity first (:func:`~holocron_tpu.parallel.replicate_to_host`)
        — a collective, so EVERY process must call ``save`` in lockstep (the fit
        loop does: the best-on-val_loss decision is identical on all hosts) — and
        only process 0 writes the file. The orbax path hands the LIVE (possibly
        sharded) arrays over — orbax is sharding-aware, each host writes only its
        own shards, so a tensor-parallel model too large to replicate still saves.
        """
        meta = {"epoch": self.epoch, "step": self.step, "min_loss": self.min_loss}
        path = Path(output_file)
        if path.suffix:
            from ..parallel.multihost import replicate_to_host

            state = {
                **meta,
                "model": jax.tree.map(
                    lambda leaf: replicate_to_host(leaf, self.mesh), self.model.variables
                ),
            }
            if jax.process_index() == 0:
                path.parent.mkdir(parents=True, exist_ok=True)
                path.write_bytes(serialization.msgpack_serialize(state))
        else:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path.resolve(), {**meta, "model": self.model.variables}, force=True)

    def load(self, state: Union[str, Dict[str, Any]]) -> None:
        """Resumes from a trainer state dict or checkpoint path (core.py:126-133)."""
        if isinstance(state, (str, Path)):
            path = Path(state)
            if path.is_dir():
                import orbax.checkpoint as ocp

                with ocp.StandardCheckpointer() as ckptr:
                    state = ckptr.restore(path.resolve())
            else:
                state = serialization.msgpack_restore(path.read_bytes())
        self.start_epoch = int(state["epoch"])
        self.epoch = self.start_epoch
        self.step = int(state["step"])
        self.min_loss = float(state["min_loss"])
        self.model.load_variables(jax.tree.map(jnp.asarray, state["model"]))

    # ------------------------------------------------------------------
    # optimizer / schedule setup
    # ------------------------------------------------------------------
    def _make_schedule(self, lr: float, total_steps: int, sched_type: str, **kwargs: Any):
        if sched_type == "onecycle":
            return optax.cosine_onecycle_schedule(total_steps, lr, **kwargs)
        if sched_type == "cosine":
            return optax.cosine_decay_schedule(lr, total_steps, **kwargs)
        if sched_type == "constant":
            return lambda count: lr
        raise ValueError(f"The following scheduler type is not supported: {sched_type}")

    def _base_tx(self, lr_or_schedule) -> optax.GradientTransformation:
        if callable(self.optimizer) and not isinstance(self.optimizer, optax.GradientTransformation):
            return self.optimizer(lr_or_schedule)
        if isinstance(self.optimizer, optax.GradientTransformation):
            return self.optimizer
        raise ValueError("optimizer must be an optax transform or a factory lr -> transform")

    def _reset_opt(
        self,
        lr_or_schedule,
        norm_weight_decay: Optional[float] = None,
        freeze_until: Optional[str] = None,
    ) -> None:
        params = self.model.params
        if params is None:
            raise RuntimeError("model parameters are not initialized — run a forward pass first")

        if self.mesh is not None and "model" in self.mesh.axis_names:
            # channel-shard params + batch stats over the model axis; the optimizer
            # moments below are created with zeros_like and inherit these shardings,
            # so the whole update runs TP without explicit in_shardings on the jit
            specs = tensor_parallel_specs(
                self.model.variables, self.mesh, min_channels=self.tp_min_channels
            )
            self.model.variables = jax.tree.map(jax.device_put, self.model.variables, specs)
            params = self.model.params

        # true forward order (not flax's name-sorted tree order) for prefix freezing
        order = self.model.forward_order() if freeze_until is not None else None
        mask = freeze_model(params, freeze_until, order)
        if not any(jax.tree.leaves(mask)):
            raise AssertionError("All parameters are frozen")
        self._trainable_mask = mask

        base = self._base_tx(lr_or_schedule)
        if norm_weight_decay is not None:
            # Per-group weight decay on norm params (reference core.py:238-252): the
            # norm group's decay REPLACES the optimizer's default. When the optimizer
            # factory accepts a ``weight_decay`` kwarg (all CLI factories do), build a
            # second instance with the norm decay and mask the two over the split;
            # otherwise fall back to an extra additive decay on the norm group (the
            # base optimizer's own decay still applies — documented divergence).
            norm_mask, other_mask = split_normalization_params(params)
            norm_base = None
            if callable(self.optimizer) and not isinstance(self.optimizer, optax.GradientTransformation):
                try:
                    norm_base = self.optimizer(lr_or_schedule, weight_decay=norm_weight_decay)
                except TypeError:
                    norm_base = None
            if norm_base is not None:
                base = optax.chain(
                    optax.masked(base, other_mask), optax.masked(norm_base, norm_mask)
                )
            else:
                base = optax.chain(
                    optax.masked(optax.add_decayed_weights(norm_weight_decay), norm_mask), base
                )
        inner = base
        if isinstance(self.grad_clip, float):
            inner = optax.chain(optax.clip_by_global_norm(self.grad_clip), inner)
        if freeze_until is not None:
            # masked() leaves non-selected updates untouched, so frozen leaves must be
            # explicitly zeroed
            not_mask = jax.tree.map(lambda m: not m, mask)
            inner = optax.chain(optax.masked(inner, mask), optax.masked(optax.set_to_zero(), not_mask))
        if self.gradient_acc > 1:
            inner = optax.MultiSteps(inner, every_k_schedule=self.gradient_acc)
        if self.skip_nan_loss:
            inner = optax.apply_if_finite(inner, max_consecutive_errors=self.nan_tolerance)
        self._tx = inner
        self._opt_state = inner.init(params)
        if (
            getattr(self, "shard_opt_state", False)
            and self.mesh is not None
            and "model" not in self.mesh.axis_names
        ):
            # ZeRO-1-style optimizer-state sharding: moments (param-shaped leaves)
            # split their trailing channel dim over the DATA axis, params stay
            # replicated. GSPMD then computes the sharded slice of each moment
            # update on its owner and all-gathers only the final parameter deltas —
            # optimizer memory drops ~1/N with no change to the step's math
            # (trajectory equality tested). Under model_parallel the moments are
            # already channel-sharded over 'model' via zeros_like inheritance.
            specs = tensor_parallel_specs(
                self._opt_state, self.mesh, axis="data", min_channels=self.tp_min_channels
            )
            self._opt_state = jax.tree.map(jax.device_put, self._opt_state, specs)
        self._freeze_until = freeze_until
        self._build_train_step()

    def _input_prep(self) -> Callable:
        """On-device input prep: uint8 batches are normalized inside the jit
        (``input_norm``), then AMP-cast. Shipping uint8 over the host->device link
        moves 4x fewer bytes than f32 — measured end-to-end in docs/PERF.md."""
        amp = self.amp
        input_norm = self.input_norm
        if input_norm is not None:
            mean = jnp.asarray(input_norm[0], jnp.float32)
            std = jnp.asarray(input_norm[1], jnp.float32)

        def prep(x):
            if input_norm is not None and x.dtype == jnp.uint8:
                x = (x.astype(jnp.float32) / 255.0 - mean) / std
            return x.astype(jnp.bfloat16) if amp else x

        return prep

    def _make_loss_forward(self, module, mutable):
        """``(variables, x, target, rng) -> (loss, state_updates)`` — the only part of
        the train step that differs per task; overridden by DetectionTrainer."""
        criterion = self.criterion

        def loss_forward(variables, x, target, rng):
            if mutable:
                out, updates = module.apply(variables, x, train=True, mutable=mutable, rngs={"dropout": rng})
            else:
                out, updates = module.apply(variables, x, train=True, rngs={"dropout": rng}), {}
            out = jax.tree.map(lambda o: o.astype(jnp.float32), out)
            return criterion(out, target), updates

        return loss_forward

    def _build_train_step(self) -> None:
        module = self.model.module
        tx = self._tx
        amp = self.amp
        remat = self.remat
        net_state = self.model.state or {}
        mutable = list(net_state.keys())
        # frozen layers keep their BN statistics too (the reference's freeze_bn)
        stats_mask = None
        if getattr(self, "_freeze_until", None) is not None and net_state:
            order = self.model.forward_order()
            stats_mask = {k: freeze_model(v, self._freeze_until, order) for k, v in net_state.items()}
        loss_forward = self._make_loss_forward(module, mutable)
        if remat == "dots":
            # keep conv/matmul outputs, rematerialize all elementwise/normalize work
            # in the backward: the train step is HBM-bound on intermediate activation
            # traffic (docs/PERF.md), so recomputing cheap fusions instead of storing
            # and re-reading them trades idle MXU FLOPs for the actual bottleneck
            loss_forward = jax.checkpoint(loss_forward, policy=jax.checkpoint_policies.dots_saveable)
        elif remat:
            # rematerialize activations in the backward pass: trades FLOPs for
            # HBM so larger batches fit (jax.checkpoint over the whole forward)
            loss_forward = jax.checkpoint(loss_forward)

        prep = self._input_prep()

        def train_step(params, net_state, opt_state, x, target, rng):
            def loss_fn(p):
                p_c = jax.tree.map(lambda t: t.astype(jnp.bfloat16), p) if amp else p
                x_c = prep(x)
                variables = {"params": p_c, **net_state}
                return loss_forward(variables, x_c, target, rng)

            (loss, new_net_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if stats_mask is not None:
                new_net_state = jax.tree.map(
                    lambda m, new, old: new if m else old, stats_mask, dict(new_net_state), net_state
                )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_net_state, opt_state, loss

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------
    # training loops
    # ------------------------------------------------------------------
    def _run_step_async(self, x, target):
        """Dispatches one train step, returning the on-device loss (no host sync)."""
        from ..nn.modules.conv import data_shards

        x, target = self.to_device(x, target)
        self._rng, step_rng = jax.random.split(self._rng)
        with data_shards(self._data_shards):  # first call traces: per-device conv rule
            params, net_state, self._opt_state, loss = self._train_step(
                self.model.params, self.model.state or {}, self._opt_state, x, target, step_rng
            )
        self.model.variables = {"params": params, **net_state}
        return loss

    def _run_step(self, x, target) -> float:
        return float(self._run_step_async(x, target))

    def _fit_epoch(self) -> None:
        """One pass over the training set (reference core.py:135-165).

        Loss readback is lagged by a few steps: dispatch stays pipelined (reading a
        scalar every step would stall the device for a host round-trip, ~26 ms on the
        tunnel — measured 1.7x slower end-to-end). NaN *updates* are already rejected
        on-device by ``optax.apply_if_finite``; the host-side tolerance check below
        just fires a few steps late.
        """
        from ..utils.data import prefetch

        nan_cnt = 0
        readback_lag = 4

        def check(batch_loss: float) -> int:
            if self.skip_nan_loss and not math.isfinite(batch_loss):
                if nan_cnt + 1 > self.nan_tolerance:
                    raise ValueError(
                        f"loss value has been NaN or inf for more than {self.nan_tolerance} steps."
                    )
                return nan_cnt + 1
            return 0

        from ._progress import ProgressBar

        pbar = ProgressBar(
            total=len(self.train_loader) if hasattr(self.train_loader, "__len__") else None,
            desc=f"epoch {self.epoch + 1}",
        )
        pending: deque = deque()
        batches = (b for b in self.train_loader if not self._is_dropped_batch(b[0]))
        # 2-batch device-placement lookahead: device_put is async, so upcoming H2D
        # transfers ride alongside the current step's compute
        for x, target in prefetch(batches, lambda batch: self.to_device(*batch), size=2):
            pending.append(self._run_step_async(x, target))
            batch_loss = None
            if len(pending) > readback_lag:
                batch_loss = float(pending.popleft())
                nan_cnt = check(batch_loss)
            # the displayed loss lags dispatch by readback_lag steps — the price of
            # a pipelined device queue (docstring above)
            pbar.update(1, loss=batch_loss)
            self.step += 1
        while pending:
            batch_loss = float(pending.popleft())
            nan_cnt = check(batch_loss)
            pbar.loss = batch_loss
        pbar.close()
        self.epoch += 1

    def evaluate(self) -> Dict[str, float]:
        raise NotImplementedError

    @staticmethod
    def _eval_metrics_str(eval_metrics) -> str:
        raise NotImplementedError

    def fit_n_epochs(
        self,
        num_epochs: int,
        lr: float,
        freeze_until: Optional[str] = None,
        sched_type: str = "onecycle",
        norm_weight_decay: Optional[float] = None,
        **kwargs: Any,
    ) -> None:
        """Train for ``num_epochs`` (reference core.py:271-316): freeze -> reset
        opt/schedule -> epochs -> evaluate -> save best on val_loss -> callback."""
        self.model._ensure_init(jnp.asarray(next(iter(self.train_loader))[0]))
        steps_per_epoch = len(self.train_loader) if hasattr(self.train_loader, "__len__") else 1
        schedule = self._make_schedule(lr, num_epochs * steps_per_epoch, sched_type, **kwargs)
        self._reset_opt(schedule, norm_weight_decay, freeze_until)

        for _ in range(num_epochs):
            self._fit_epoch()
            eval_metrics = self.evaluate()
            print(f"Epoch {self.epoch}/{self.start_epoch + num_epochs} - {self._eval_metrics_str(eval_metrics)}")  # noqa: T201
            if eval_metrics["val_loss"] < self.min_loss:
                print(  # noqa: T201
                    f"Validation loss decreased {self.min_loss:.4} --> {eval_metrics['val_loss']:.4}: saving state..."
                )
                self.min_loss = eval_metrics["val_loss"]
                self.save(self.output_file)
            if self.on_epoch_end is not None:
                self.on_epoch_end(eval_metrics)

    def find_lr(
        self,
        freeze_until: Optional[str] = None,
        start_lr: float = 1e-7,
        end_lr: float = 1,
        norm_weight_decay: Optional[float] = None,
        num_it: int = 100,
    ) -> None:
        """Exponential LR sweep recording the loss (reference core.py:318-370)."""
        if hasattr(self.train_loader, "__len__") and num_it > len(self.train_loader):
            raise ValueError("the value of `num_it` needs to be lower than the number of available batches")
        self.model._ensure_init(jnp.asarray(next(iter(self.train_loader))[0]))
        gamma = (end_lr / start_lr) ** (1 / (num_it - 1))
        # 0-based schedule convention (optax built-ins and the zoo agree): step k
        # uses lr = start_lr * gamma**k, matching lr_recorder below
        schedule = lambda count: start_lr * gamma**count  # noqa: E731
        self._reset_opt(schedule, norm_weight_decay, freeze_until)

        self.lr_recorder = [start_lr * gamma**idx for idx in range(num_it)]
        self.loss_recorder = []
        for batch_idx, (x, target) in enumerate(self.train_loader):
            batch_loss = self._run_step(x, target)
            if math.isnan(batch_loss) or math.isinf(batch_loss):
                if batch_idx == 0:
                    raise ValueError("loss value is NaN or inf.")
                break
            self.loss_recorder.append(batch_loss)
            if batch_idx + 1 == num_it:
                break
        self.lr_recorder = self.lr_recorder[: len(self.loss_recorder)]

    def plot_recorder(self, beta: float = 0.95, **kwargs: Any) -> None:
        """Plots the LR-finder curve (reference core.py:372-405)."""
        if len(self.lr_recorder) != len(self.loss_recorder) or len(self.lr_recorder) == 0:
            raise AssertionError("Please run the `lr_find` method first")
        import matplotlib.pyplot as plt

        smoothed_losses = []
        avg_loss = 0.0
        for idx, loss in enumerate(self.loss_recorder):
            avg_loss = beta * avg_loss + (1 - beta) * loss
            smoothed_losses.append(avg_loss / (1 - beta ** (idx + 1)))
        data_slice = slice(
            min(len(self.loss_recorder) // 10, 10),
            -min(len(self.loss_recorder) // 20, 5) if len(self.loss_recorder) >= 20 else len(self.loss_recorder),
        )
        vals = np.array(smoothed_losses[data_slice])
        min_idx = vals.argmin()
        max_val = vals.max() if min_idx is None else vals[: min_idx + 1].max()
        delta = max_val - vals[min_idx]
        plt.plot(self.lr_recorder[data_slice], smoothed_losses[data_slice])
        plt.xscale("log")
        plt.xlabel("Learning Rate")
        plt.ylabel("Training loss")
        plt.ylim(vals[min_idx] - 0.1 * delta, max_val + 0.2 * delta)
        plt.grid(True, linestyle="--", axis="x")
        plt.show(**kwargs)

    def check_setup(
        self,
        freeze_until: Optional[str] = None,
        lr: float = 3e-4,
        norm_weight_decay: Optional[float] = None,
        num_it: int = 100,
        **kwargs: Any,
    ) -> List[float]:
        """Overfit-one-batch sanity check (reference core.py:407-451); returns losses."""
        x, target = next(iter(self.train_loader))
        self.model._ensure_init(jnp.asarray(x))
        self._reset_opt(lr, norm_weight_decay, freeze_until)
        losses = []
        for _ in range(num_it):
            batch_loss = self._run_step(x, target)
            if math.isnan(batch_loss) or math.isinf(batch_loss):
                raise ValueError("loss value is NaN or inf.")
            losses.append(batch_loss)
        return losses

    def profile(self, logdir: str = "/tmp/holocron_profile", num_steps: int = 5, lr: float = 1e-3):
        """Captures a device profile of the train step (the reference only has
        perf_counter loops, SURVEY.md §5; on TPU `jax.profiler` traces show MXU
        utilization and HBM traffic in TensorBoard/XProf)."""
        x, target = next(iter(self.train_loader))
        self.model._ensure_init(jnp.asarray(x))
        if self._train_step is None:
            self._reset_opt(lr)
        self._run_step(x, target)  # compile outside the trace
        with jax.profiler.trace(logdir):
            for _ in range(num_steps):
                self._run_step(x, target)
        return logdir

    # eval-side loss helper shared by the task trainers
    def _eval_fns(self):
        module = self.model.module
        criterion = self.criterion
        amp = self.amp

        prep = self._input_prep()
        from ..nn.modules.conv import data_shards

        @jax.jit
        def _forward(variables, x):
            x = prep(x)
            if amp:
                params = jax.tree.map(lambda t: t.astype(jnp.bfloat16), variables["params"])
                variables = {**variables, "params": params}
            out = module.apply(variables, x, train=False)
            return jax.tree.map(lambda o: o.astype(jnp.float32), out)

        def forward(variables, x):
            with data_shards(self._data_shards):  # first call traces: per-device conv rule
                return _forward(variables, x)

        def loss_and_logits(variables, x, target):
            out = forward(variables, x)
            return criterion(out, target), out

        return forward, loss_and_logits
