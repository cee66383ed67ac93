"""Worker for the multi-host metric-correctness test (test_multihost.py).

Runs as one of two CPU JAX processes. Each process feeds a DIFFERENT
per-process val shard through Trainer.single_val; correctness means both
processes report the same GLOBAL (acc, total) — per-host metrics with no
cross-process reduction (the round-1 gap vs reference main.py:1155-1167)
would differ between ranks and report total = local count.

Usage: python tests/_multihost_worker.py <proc_id> <num_procs> <port>
Prints one line: RESULT <acc> <total>
"""

import os
import sys

proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # 2 local -> 4 global devices
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)

# share the repo compile cache (this host has one core; compiles are slow);
# host-keyed dir, see tests/_cache_tag.py
from _cache_tag import host_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", host_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from revisiting_at_tpu.config import Config  # noqa: E402
from revisiting_at_tpu.train.trainer import Trainer  # noqa: E402


def main() -> None:
    cfg = Config()
    cfg.model.arch = "convnext_micro"
    cfg.model.not_original = 1
    cfg.model.add_normalization = 0
    cfg.data.num_classes = 5
    cfg.training.batch_size = 8
    cfg.training.precision = "fp32"
    cfg.resolution.min_res = cfg.resolution.max_res = 32
    cfg.validation.batch_size = 8
    cfg.validation.resolution = 32
    cfg.logging.folder = f"/tmp/multihost_test/rank{proc_id}"

    # per-process val shard: DIFFERENT data per rank (seeded by proc_id)
    rng = np.random.RandomState(100 + proc_id)
    batches = [
        (
            rng.uniform(0, 1, size=(8, 32, 32, 3)).astype(np.float32),
            rng.randint(0, 5, size=8).astype(np.int64),
        )
        for _ in range(2)
    ]

    class Val:
        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter(batches)

    trainer = Trainer(cfg, train_data=Val(), val_data=Val())
    acc, total = trainer.single_val()

    # one training step on per-rank-DIFFERENT data: the returned loss and
    # the updated params are globally reduced, so they must be identical
    # across ranks (grads psum'd over the whole mesh)
    loss = trainer.train_loop(0)
    p0 = float(jnp.sum(jnp.abs(jax.tree.leaves(trainer.state.params)[0])))
    print(f"RESULT {acc:.6f} {total} {loss:.6f} {p0:.6f}", flush=True)


if __name__ == "__main__":
    main()
