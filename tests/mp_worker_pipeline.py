"""Multi-process worker certifying the GPipe pipeline's cross-process hops.

``pipeline_blocks`` moves microbatches between stages with ``lax.ppermute``; on a
mesh spanning two OS processes those hops ride the inter-process transport (Gloo
here, ICI/DCN on a pod) — a path no single-process test can execute. The worker
runs an 8-stage pipeline over a 2-process mesh and checks the result against the
sequential single-device fold computed locally (pipeline_blocks' own contract).

Usage: python mp_worker_pipeline.py <pid> <nproc> <port> <outdir>
"""

import os
import sys

import numpy as np


def main() -> None:
    pid, nproc, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={8 // nproc}"
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
        )

    from holocron_tpu.parallel import create_mesh, pipeline_blocks

    def block_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    k = jax.random.key(7)
    s, b, d = 8, 16, 32  # stages, batch, width
    params = {
        "w": jax.random.normal(jax.random.key(1), (s, d, d)) * 0.3,
        "b": jax.random.normal(jax.random.key(2), (s, d)) * 0.1,
    }
    x = jax.random.normal(k, (b, d))

    mesh = create_mesh(axes=("pipe",))
    y = pipeline_blocks(block_fn, params, x, mesh, gather_output=True)
    y = np.asarray(y)

    # sequential reference fold, computed locally on this process
    ref = x
    for i in range(s):
        ref = block_fn({"w": params["w"][i], "b": params["b"][i]}, ref)
    np.testing.assert_allclose(y, np.asarray(ref), rtol=2e-5, atol=2e-6)
    if pid == 0:
        np.save(os.path.join(outdir, "pipeline_out.npy"), y)
    print(f"[{pid}] WORKER_DONE pipeline matches sequential fold", flush=True)


if __name__ == "__main__":
    main()
