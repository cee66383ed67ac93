"""Input-pipeline vs compute budget benchmark (SURVEY.md §7 'hard parts':
FFCV's role was keeping a multi-forward AT step compute-bound).

Measures, on this host + the real TPU:
  1. tf.data folder pipeline throughput (JPEG decode + fused RandomResizedCrop
     -> uint8 batches) at 224px — imgs/s, single process
  2. on-device augment cost: the fused AT train step WITH RandAugment+erasing
     inside the jit vs WITHOUT (the augmentation is folded into the step, so
     its cost is the step-time delta)
  3. the AT compute budget: ConvNeXt-T-CvSt@224 bs80 2-step APGD step time

Verdict line: input pipeline sustains compute-bound training iff
  (imgs/s) >= batch / step_time.

Writes experiments/RESULTS_input_pipeline.json.

Run alone on the TPU host: python experiments/input_pipeline_bench.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
DATA = Path("/tmp/ipbench_data")
RES, BATCH, N_IMGS = 224, 80, 1024


def make_jpeg_tree() -> None:
    """Synthetic 224-class-free JPEG tree at ImageNet-like decode cost
    (random textures at 500x375 — the ImageNet mean size)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    for c in range(8):
        d = DATA / "train" / f"{c}"
        if d.exists() and len(list(d.glob("*.jpg"))) >= N_IMGS // 8:
            continue
        d.mkdir(parents=True, exist_ok=True)
        for i in range(N_IMGS // 8):
            # low-frequency texture + noise: realistic JPEG entropy
            base = rng.uniform(0, 255, size=(24, 18, 3))
            img = np.asarray(
                Image.fromarray(base.astype(np.uint8)).resize((500, 375), Image.BICUBIC)
            )
            img = np.clip(img + rng.normal(0, 12, img.shape), 0, 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i:05d}.jpg", quality=90)


def bench_tfdata() -> dict:
    from revisiting_at_tpu.data.folder import FolderConfig, make_folder_dataset

    it_fn, _ = make_folder_dataset(
        FolderConfig(root=str(DATA / "train"), resolution=RES, batch_size=BATCH,
                     is_train=True, num_parallel=8)
    )
    it = it_fn()
    # warm 2 batches
    for _ in range(2):
        next(it)
    n_batches = 8
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return {
        "tfdata_imgs_per_s": round(n_batches * BATCH / dt, 1),
        "tfdata_ms_per_batch": round(1000 * dt / n_batches, 1),
    }


def bench_step(randaug: bool) -> float:
    """Median fused AT step time (s) on the TPU, with/without in-jit augment."""
    import jax
    import jax.numpy as jnp

    from revisiting_at_tpu.data.augment import RandAugmentConfig
    from revisiting_at_tpu.data.mixup import MixupConfig
    from revisiting_at_tpu.models import get_model
    from revisiting_at_tpu.train.ema import ema_init
    from revisiting_at_tpu.train.optimizer import make_optimizer
    from revisiting_at_tpu.train.schedule import LRConfig, make_lr_schedule
    from revisiting_at_tpu.train.state import TrainState
    from revisiting_at_tpu.train.train_step import AdvConfig, make_train_step

    model, meta = get_model("convnext_tiny", not_original=True,
                            dtype=jnp.bfloat16, use_pallas=True)
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, RES, RES, 3)), train=False)
    )(jax.random.PRNGKey(0))["params"]
    sched = make_lr_schedule(LRConfig(lr=1e-3, lr_peak_epoch=20, epochs=300), 5000)
    tx = make_optimizer(optimizer="adamw", weight_decay=0.05, family=meta.family,
                        learning_rate=sched, params=params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), ema_params=ema_init(params))
    step = make_train_step(
        model, tx,
        adv=AdvConfig(attack="apgd", norm="Linf", eps=4 / 255, n_iter=2),
        mixup=MixupConfig(num_classes=1000, label_smoothing=0.1),
        randaug=RandAugmentConfig() if randaug else None,
        ema_decay=0.9999, has_batch_stats=False,
    )
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randint(0, 256, size=(BATCH, RES, RES, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(rng.randint(0, 1000, size=BATCH), jnp.int32)
    for _ in range(3):
        state, m = step(state, images, labels)
    jax.block_until_ready(m["loss"])
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        state, m = step(state, images, labels)
        jax.block_until_ready(m["loss"])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    make_jpeg_tree()
    out = bench_tfdata()
    t_plain = bench_step(randaug=False)
    t_aug = bench_step(randaug=True)
    out.update(
        step_ms_no_aug=round(1000 * t_plain, 1),
        step_ms_with_injit_aug=round(1000 * t_aug, 1),
        injit_aug_overhead_ms=round(1000 * (t_aug - t_plain), 1),
        compute_bound_imgs_per_s_needed=round(BATCH / t_aug, 1),
        input_sustains_compute=bool(out["tfdata_imgs_per_s"] >= BATCH / t_aug),
        note=(
            "single-process tf.data on this 1-core host; TPU-pod hosts have "
            "dozens of cores and the pipeline scales with num_parallel/cores"
        ),
    )
    (REPO / "experiments" / "RESULTS_input_pipeline.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
