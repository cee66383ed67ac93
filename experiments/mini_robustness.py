"""Mini robustness experiment: prove the framework LEARNS robustness.

The reference's entire value is robust-accuracy tables produced by its
train->checkpoint->AutoAttack pipeline (/root/reference/main.py:702-756 ->
AA_eval.py:224-246). This experiment exercises that full pipeline
end-to-end on real images at a scale that fits this environment:

  data   : sklearn's bundled handwritten-digits images (1797 real 8x8
           grayscale scans, 10 classes) written as 64x64 JPEGs in
           ImageFolder layout and fed through the tf.data folder pipeline
  train  : TWO convnext_micro models via the actual CLI -
           (a) clean training, (b) 2-step APGD Linf AT at eps=8/255
  eval   : the in-repo AutoAttack (short mode: APGD-CE + APGD-T) on the
           val split via the actual eval CLI, reading the orbax checkpoint
           through the params.json contract

Success = AT model robust-acc >> clean model robust-acc, both clean accs
sane. Results land in experiments/RESULTS_mini.json (+ .md summary).

Run (needs the TPU to itself; ~10 min):
  python experiments/mini_robustness.py all
  python experiments/mini_robustness.py all vit_s   # ViT-family twin proof
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DATA = REPO / "runs" / "digits_data"
RUNS = REPO / "runs"
RES = 64
# the reference's ImageNet eps (AA_eval.py:33). Training at 8/255 collapses
# to the uniform-logits minimum on this small dataset at every model scale
# probed (convnext_micro & tiny, lr 2e-3/1e-3/5e-4) — a known hard-AT regime,
# not a framework property; 4/255 trains stably.
EPS = 4.0 / 255.0
ARCH = "convnext_tiny"  # the north-star architecture (BASELINE.md)
N_VAL_PER_CLASS = 30  # 300 val images, 1497 train


def prepare() -> None:
    """Write sklearn digits as 64x64 RGB JPEGs in ImageFolder layout."""
    import numpy as np
    from PIL import Image
    from sklearn.datasets import load_digits

    d = load_digits()
    images, labels = d.images, d.target  # [N,8,8] float 0..16, [N]
    rng = np.random.RandomState(0)
    order = rng.permutation(len(images))
    images, labels = images[order], labels[order]

    n_val_left = {c: N_VAL_PER_CLASS for c in range(10)}
    counts = {"train": 0, "val": 0}
    for i, (img, lab) in enumerate(zip(images, labels)):
        split = "val" if n_val_left[int(lab)] > 0 else "train"
        if split == "val":
            n_val_left[int(lab)] -= 1
        arr = np.clip(img * (255.0 / 16.0), 0, 255).astype(np.uint8)
        pil = Image.fromarray(arr, mode="L").resize((RES, RES), Image.BICUBIC)
        out = DATA / split / f"{int(lab)}"
        out.mkdir(parents=True, exist_ok=True)
        pil.convert("RGB").save(out / f"{i:05d}.jpg", quality=95)
        counts[split] += 1
    print(f"wrote {counts} to {DATA}")


def _run(cmd: list[str], log_path: Path) -> None:
    print("+", " ".join(cmd), flush=True)
    with open(log_path, "a") as f:
        rc = subprocess.call(cmd, cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
    if rc != 0:
        print(open(log_path).read()[-4000:])
        raise SystemExit(f"command failed rc={rc}: {' '.join(cmd)}")


def _train_one(name: str, attack: str, epochs: int, arch: str = ARCH,
               suffix: str = "") -> Path:
    folder = RUNS / f"mini_{name}{suffix}"
    common = [
        sys.executable, "-m", "revisiting_at_tpu.cli.train",
        "--model.arch", arch, "--model.not_original", "1",
        "--model.model_ema", "1",
        "--data.dataset", "folder",
        "--data.train_dataset", str(DATA / "train"),
        "--data.val_dataset", str(DATA / "val"),
        "--data.num_classes", "10",
        "--data.augmentations", "0",
        "--resolution.min_res", str(RES), "--resolution.max_res", str(RES),
        "--validation.resolution", str(RES), "--validation.batch_size", "128",
        "--training.batch_size", "128", "--training.epochs", str(epochs),
        "--lr.lr", "1e-3", "--lr.lr_peak_epoch", str(max(epochs // 10, 1)),
        "--logging.folder", str(folder), "--logging.save_freq", "50",
        "--adv.attack", attack,
    ]
    if attack == "apgd":
        common += ["--adv.norm", "Linf", "--adv.eps", f"{EPS}", "--adv.n_iter", "2"]
    _run(common, folder.with_suffix(".log"))
    run_dirs = sorted(folder.glob("*/params.json"))
    assert run_dirs, f"no run dir under {folder}"
    return run_dirs[-1].parent


def _eval_one(run_dir: Path, tag: str) -> dict:
    log = run_dir / f"evaluated_logs_Linf_0.txt"
    if log.exists():
        log.unlink()
    _run(
        [
            sys.executable, "-m", "revisiting_at_tpu.cli.eval",
            "--run_dir", str(run_dir),
            "--data_dir", str(DATA / "val"),
            "--n_ex", "256", "--batch_size", "128",
            "--img_size", str(RES),
            "--l_norms", "Linf", "--eps", f"{EPS}",
            "--full_aa", "0", "--n_iter", "100",
        ],
        RUNS / f"mini_eval_{tag}.log",
    )
    txt = log.read_text()
    clean = re.search(r"initial \(clean\) accuracy: ([\d.]+)%", txt)
    robust = re.search(r"robust accuracy \(re-scored on x_adv\): ([\d.]+)%", txt)
    assert clean and robust, txt[-2000:]
    return {"clean_acc": float(clean.group(1)), "robust_acc": float(robust.group(1))}


def main(stage: str = "all", arch: str = ARCH) -> None:
    t0 = time.time()
    # second family proof (e.g. `all vit_s`) writes its own artifacts and
    # run dirs; the default convnext_tiny names stay unchanged
    suffix = "" if arch == ARCH else f"_{arch}"
    results: dict = {
        "dataset": "sklearn digits (1797 real 8x8 scans -> 64x64 JPEG, 10 classes)",
        "arch": arch + " + ConvStem", "res": RES,
        "eps_linf": EPS, "attack": "APGD 2-step Linf AT",
        "eval": "in-repo AutoAttack short mode (APGD-CE + APGD-T, 100 iter, 256 val imgs)",
    }
    if stage in ("prepare", "all"):
        prepare()
    if stage in ("train", "all"):
        results["clean_run"] = str(
            _train_one("clean", "none", epochs=40, arch=arch, suffix=suffix))
        results["at_run"] = str(
            _train_one("at", "apgd", epochs=150, arch=arch, suffix=suffix))
    if stage in ("eval", "all"):
        if "clean_run" not in results:
            results["clean_run"] = str(sorted((RUNS / f"mini_clean{suffix}").glob("*/params.json"))[-1].parent)
            results["at_run"] = str(sorted((RUNS / f"mini_at{suffix}").glob("*/params.json"))[-1].parent)
        results["clean_model"] = _eval_one(Path(results["clean_run"]), f"clean{suffix}")
        results["at_model"] = _eval_one(Path(results["at_run"]), f"at{suffix}")
        results["wall_clock_s"] = round(time.time() - t0, 1)
        out = REPO / "experiments" / f"RESULTS_mini{suffix}.json"
        out.write_text(json.dumps(results, indent=2) + "\n")
        print(json.dumps(results, indent=2))
        c, a = results["clean_model"], results["at_model"]
        assert a["robust_acc"] > c["robust_acc"] + 20.0, (
            f"AT robust acc {a['robust_acc']} not >> clean-trained {c['robust_acc']}"
        )
        print("OK: AT model is robust, clean-trained twin is not.")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all",
         sys.argv[2] if len(sys.argv) > 2 else ARCH)
