"""Worker process for tests/test_multihost.py.

Runs ONE full DP train step of the tiny detector over a genuinely
multi-process mesh: 2 processes x 4 virtual CPU devices = 8 global
devices, with per-process input feeding via
`multihost_utils.host_local_array_to_global_array` — the same global-array
path `jax.distributed` multi-host DP uses over DCN (SURVEY.md §2.8 /
§5.8). Prints `MHLOSS <value>`; the parent asserts both processes agree
and match the single-process 8-device dryrun.

Usage: python tests/multihost_worker.py <proc_id> <num_procs> <port>
"""

import os
import sys


def main() -> None:
    proc, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from __graft_entry__ import cpu_mesh_env

    cpu_mesh_env(os.environ, 4)

    import jax

    # importing __graft_entry__ imported jax BEFORE the env edit above, so
    # the platform config may have frozen on the env's original value —
    # override it explicitly (legal while no backend is initialized).
    jax.config.update("jax_platforms", "cpu")

    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=proc
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from __graft_entry__ import _tiny_config
    from bdd100k_tpu.configs import TrainConfig
    from bdd100k_tpu.data.augment import AugmentConfig
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.parallel.mesh import make_mesh
    from bdd100k_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
    )
    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    # The parent test points JAX_COMPILATION_CACHE_DIR at a fresh per-run
    # dir: with the shared repo cache, one worker can hit a cached (or
    # feature-mismatched) executable while the other recompiles for
    # minutes, blowing gloo's 30 s collective-rendezvous timeout. A cold
    # cache keeps both workers' compiles in lockstep.
    enable_compilation_cache()
    n = jax.device_count()
    mesh = make_mesh(num_data=n)  # spans BOTH processes
    bundle = build_detector(_tiny_config(), dtype=jnp.float32)
    cfg = TrainConfig(batch_size=n, max_boxes=8, warmup_steps=0)
    state = create_train_state(bundle, cfg, jax.random.PRNGKey(0), mesh=mesh)
    step_fn = make_train_step(
        bundle, AugmentConfig(out_size=64, num_trials=4), mesh=mesh
    )

    # The SAME global batch __graft_entry__._dryrun_impl builds, but fed
    # the multi-host way: each process holds only its local rows and the
    # global array is assembled across processes.
    b, m = n, cfg.max_boxes
    images = np.random.RandomState(0).randint(
        0, 255, (b, 96, 128, 3), dtype=np.uint8
    )
    boxes = np.zeros((b, m, 4), np.float32)
    boxes[:, 0] = (0.2, 0.2, 0.7, 0.7)
    labels = np.zeros((b, m), np.int32)
    labels[:, 0] = 1
    mask = np.zeros((b, m), bool)
    mask[:, 0] = True

    local = slice(proc * (b // nproc), (proc + 1) * (b // nproc))
    batch = tuple(
        multihost_utils.host_local_array_to_global_array(
            np.asarray(a[local]), mesh, P("data")
        )
        for a in (images, boxes, labels, mask)
    )
    # align both workers entering the (compiling) first step — the gloo
    # context init inside it times out if one worker arrives >30 s late
    multihost_utils.sync_global_devices("prestep")
    state, metrics = step_fn(state, jax.random.PRNGKey(1), *batch)
    jax.block_until_ready(metrics)
    loss = float(np.asarray(metrics["loss"].addressable_shards[0].data))
    print(f"MHLOSS {loss:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
