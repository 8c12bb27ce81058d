"""Multi-process (multi-"host") training worker for the scaling-stack certification.

Launched by tests/test_multiprocess.py as N separate OS processes, each owning
``8 // N`` virtual CPU devices of one shared 8-device global mesh
(``jax.distributed`` + Gloo collectives). This is the same execution topology as a
real TPU pod slice — per-process addressable device subsets, global-batch assembly
via ``host_local_put``, cross-process collectives in the train step — so the
multi-host code paths (``Trainer.to_device``, ``DataLoader(num_shards="auto")``,
``Trainer._host_batch`` eval gathers) are executed for real rather than simulated
in a single process. The reference has no distributed support at all (SURVEY.md
§2i); this certifies the beyond-parity multi-host path.

Usage: python mp_worker_train.py <process_id> <num_processes> <port> <outdir> [variant]

``variant`` selects the scaling mode under certification: ``plain`` (pure DP),
``zero1`` (optimizer-state sharding), ``tp`` (2-way tensor parallel over a
data x model mesh), ``spatial`` (2-way H-sharding over a data x spatial mesh).
All are trajectory-equal to plain DP by construction, so every variant is
compared against the same single-process reference run.

With num_processes == 1 this is the single-process reference run over the same
8-device mesh and the same deterministic data; test_multiprocess.py asserts the
2-process run reproduces its final params and eval metrics (batch composition per
step is identical as a SET — the strided shard split only permutes rows within
the global batch, and per-batch loss/grads/BN stats are order-invariant).
"""

import json
import os
import sys

import numpy as np


class DeterministicDataset:
    """Samples keyed by index only — identical on every process."""

    def __init__(self, n: int, seed: int = 0) -> None:
        self.n = n
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int):
        r = np.random.default_rng(1000 * (self.seed + 1) + i)
        x = r.normal(size=(16, 16, 3)).astype(np.float32)
        return x, np.int32(i % 5)


def main() -> None:
    pid, nproc, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    variant = sys.argv[5] if len(sys.argv) > 5 else "plain"
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={8 // nproc}"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
        )
    assert jax.device_count() == 8 and jax.local_device_count() == 8 // nproc

    from holocron_tpu import optim
    from holocron_tpu.models.classification.repvgg import RepVGG
    from holocron_tpu.models.core import Model
    from holocron_tpu.nn.functional import cross_entropy
    from holocron_tpu.trainer import ClassificationTrainer
    from holocron_tpu.utils.data import DataLoader

    # global batch 8 in every configuration: 8-per-process at nproc=1, 4 at nproc=2
    local_bs = 8 // nproc
    train_loader = DataLoader(
        DeterministicDataset(32), batch_size=local_bs, shuffle=True, seed=0,
        num_workers=1, num_shards="auto",
    )
    val_loader = DataLoader(
        DeterministicDataset(16, seed=7), batch_size=local_bs, num_workers=1, num_shards="auto"
    )
    model = Model(RepVGG([1], [8], 1.0, 1.0, num_classes=5))
    extra = {
        "plain": {},
        "zero1": {"shard_opt_state": True},
        "tp": {"model_parallel": 2},
        "spatial": {"spatial_parallel": 2},
    }[variant]
    trainer = ClassificationTrainer(
        model=model,
        train_loader=train_loader,
        val_loader=val_loader,
        criterion=cross_entropy,
        optimizer=lambda lr: optim.adabelief(lr=lr),
        **extra,
    )
    trainer.fit_n_epochs(2, lr=1e-3)
    metrics = trainer.evaluate()

    # tp leaves params sharded: the shared helper replicate-gathers collectively
    # (EVERY process runs this; only pid 0 writes the result below)
    from holocron_tpu.parallel import replicate_to_host

    leaves = jax.tree_util.tree_flatten_with_path(model.params)[0]
    params_np = {jax.tree_util.keystr(p): replicate_to_host(v, trainer.mesh) for p, v in leaves}

    # checkpoint round-trip under this topology: save() gathers tensor-parallel
    # shards collectively (all processes) and writes on process 0 only
    ckpt = os.path.join(outdir, f"trainer_ckpt_{nproc}p.msgpack")
    trainer.save(ckpt)
    if pid == 0:
        from flax import serialization

        restored = serialization.msgpack_restore(open(ckpt, "rb").read())
        for p, v in jax.tree_util.tree_flatten_with_path(restored["model"]["params"])[0]:
            np.testing.assert_array_equal(np.asarray(v), params_np[jax.tree_util.keystr(p)])
        np.savez(os.path.join(outdir, "params.npz"), **params_np)
        with open(os.path.join(outdir, "metrics.json"), "w") as f:
            json.dump(metrics, f)
    print(f"[{pid}] WORKER_DONE", flush=True)


if __name__ == "__main__":
    main()
