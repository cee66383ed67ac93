"""Compile + run the fused qkv attention fwd+bwd at the ViT-B@320 shape
(bf16[64, 401, 2304], 12 heads) — the exact pallas_call that blew the 16 MB
scoped-VMEM stack in queue10 (aa_at_shape vit_b@320). Passing = the
per-third bf16 store restructure keeps the kernel under the limit.

  python experiments/attn_vmem_check.py [--bs 64] [--n 401] [--d 768]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from revisiting_at_tpu.ops.attention import fused_attention_qkv
from revisiting_at_tpu.utils.cache import enable_compilation_cache


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--n", type=int, default=401)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    args = ap.parse_args()

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(
        rng.randn(args.bs, args.n, 3 * args.d), jnp.bfloat16)

    def loss(t):
        return jnp.sum(fused_attention_qkv(t, args.heads) ** 2)

    f = jax.jit(jax.value_and_grad(loss))
    t0 = time.perf_counter()
    val, g = f(qkv)
    val = float(val)  # readback forces completion over the tunnel
    print(f"compile+run {time.perf_counter() - t0:.1f}s "
          f"loss={val:.3e} grad_norm={float(jnp.linalg.norm(g.astype(jnp.float32))):.3e}")
    t0 = time.perf_counter()
    val, g = f(qkv)
    _ = float(val) + float(jnp.sum(g.astype(jnp.float32)))
    print(f"steady {1e3 * (time.perf_counter() - t0):.1f}ms  OK")


if __name__ == "__main__":
    main()
