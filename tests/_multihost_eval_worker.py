"""Worker for the multi-host eval test (test_multihost.py).

Each of two CPU JAX processes attacks its own round-robin shard of the
same deterministic eval set (evals.shard_for_process) and reports the
GLOBALLY reduced robust accuracy (evals.global_robust_accuracy) — the
reference's GPU-farm eval parallelism (runner_aa_eval.py) mapped to
hosts. Correctness: both ranks print identical global numbers and the
global count equals the full set size.

Usage: python tests/_multihost_eval_worker.py <proc_id> <num_procs> <port>
Prints: RESULT <clean_acc> <robust_acc> <n_global>
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

# host-keyed cache dir, see tests/_cache_tag.py
from _cache_tag import host_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", host_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from revisiting_at_tpu.evals import (  # noqa: E402
    AutoAttack,
    AutoAttackConfig,
    global_robust_accuracy,
    shard_for_process,
)


def main() -> None:
    d, nc = 48, 7
    rng = np.random.RandomState(0)
    w = jnp.asarray((rng.randn(d, nc) * 0.8).astype(np.float32))
    b = jnp.zeros((nc,), jnp.float32)

    def fn(xa):
        return xa.reshape(xa.shape[0], -1) @ w + b

    # full deterministic eval set, identical on every rank
    rng2 = np.random.RandomState(1)
    x = rng2.uniform(0.1, 0.9, size=(32, 4, 4, 3)).astype(np.float32)
    y = rng2.randint(0, nc, size=32).astype(np.int64)

    xs, ys = shard_for_process(x, y)
    assert len(xs) == len(x) // num_procs

    aa = AutoAttack(
        fn,
        AutoAttackConfig(
            norm="Linf", eps=0.1, attacks_to_run=("apgd-ce",),
            n_iter=10, batch_size=8, verbose=False,
        ),
    )
    clean, n0 = global_robust_accuracy(aa.clean_accuracy(xs, ys))
    _, robust = aa.run_standard_evaluation(xs, ys)
    racc, n = global_robust_accuracy(robust)
    assert n0 == n == len(x), (n0, n)
    print(f"RESULT {clean:.6f} {racc:.6f} {n}", flush=True)


if __name__ == "__main__":
    main()
