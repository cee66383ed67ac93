"""End-to-end CLI round-trip on the CPU mesh.

Drives the ACTUAL entry points in-process: train CLI (synthetic data,
micro model, 2-step APGD AT) -> run dir with params.json + orbax ckpt ->
eval CLI reconstructing the model from params.json (the config-as-artifact
contract, reference AA_eval.py:134-138), including the multi-device
--shard_eval and --tp branches. The real-TPU equivalents are the
verify-skill surfaces (.claude/skills/verify/SKILL.md).

Named test_zz_* to collect LAST as belt-and-braces: the eval --tp branch
sets the thread-local context mesh while it runs (cli/eval.py restores it
in a finally; tested implicitly by the eval calls that follow it here).
"""

from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    from revisiting_at_tpu.cli.train import main

    folder = tmp_path_factory.mktemp("cli_runs")
    main([
        "--model.arch", "convnext_micro", "--model.not_original", "1",
        "--model.add_normalization", "0", "--model.model_ema", "1",
        "--adv.attack", "apgd", "--adv.n_iter", "2",
        "--data.dataset", "synthetic", "--data.num_classes", "7",
        "--training.batch_size", "16", "--training.epochs", "1",
        "--training.precision", "fp32",
        "--resolution.min_res", "32", "--resolution.max_res", "32",
        "--validation.batch_size", "16", "--validation.resolution", "32",
        # in-training adversarial validation -> ckpt_best (reference
        # best_adv_weights intent) + step-cadence telemetry, both round-
        # tripped below
        "--validation.adv_val_freq", "1", "--validation.adv_val_iter", "2",
        "--validation.adv_val_batches", "1",
        "--logging.log_every_steps", "2",
        "--logging.folder", str(folder),
    ])
    runs = sorted(Path(folder).glob("model_*"))
    assert len(runs) == 1, runs
    return runs[0]


class TestTrainArtifacts:
    def test_run_dir_contract(self, run_dir):
        assert (run_dir / "params.json").exists()
        assert (run_dir / "log").exists()
        ckpts = list((run_dir / "ckpt").glob("*"))
        assert ckpts, "no orbax checkpoint written"
        log = (run_dir / "log").read_text().splitlines()
        assert any('"epoch"' in l and '"train_loss"' in l for l in log)

    def test_step_telemetry_records(self, run_dir):
        log = (run_dir / "log").read_text().splitlines()
        steps = [l for l in log if '"step"' in l and '"imgs_per_s"' in l]
        assert steps, "log_every_steps produced no per-step records"

    def test_adv_val_and_best_ckpt(self, run_dir):
        log = (run_dir / "log").read_text().splitlines()
        assert any('"adv_val"' in l for l in log)
        assert list((run_dir / "ckpt_best").glob("*")), "no best-adv checkpoint"


class TestEvalCLI:
    def _eval(self, run_dir, extra=()):
        from revisiting_at_tpu.cli.eval import main

        main([
            "--run_dir", str(run_dir), "--n_ex", "32", "--batch_size", "16",
            "--l_norms", "Linf", "--eps", "0.1", "--n_iter", "5",
            "--img_size", "32", "--synthetic", *extra,
        ])

    def test_eval_restores_and_attacks(self, run_dir):
        self._eval(run_dir)
        logs = list(run_dir.glob("evaluated_logs_*.txt"))
        assert logs
        txt = logs[0].read_text()
        assert "initial (clean) accuracy" in txt
        assert "robust accuracy after APGD-CE" in txt
        assert "max Linf perturbation" in txt

    def test_eval_shard_eval_branch(self, run_dir):
        self._eval(run_dir, ("--shard_eval", "1", "--only_clean"))

    def test_eval_checkpoint_selection_flags(self, run_dir):
        # EMA weights, the best-adv-val checkpoint, and an explicit epoch
        # (epochs=1 -> step 0 is the only checkpoint) all restore and run
        self._eval(run_dir, ("--use_ema", "1", "--only_clean"))
        self._eval(run_dir, ("--best", "--only_clean"))
        self._eval(run_dir, ("--epoch", "0", "--only_clean"))

    def test_eval_tp_failure_restores_mesh(self, run_dir, monkeypatch):
        # a failure AFTER jax.set_mesh inside the --tp branch (here: the
        # no-param-matched-TP-rules assert, forced via monkeypatch) must
        # still restore the thread-local context mesh
        from jax._src.mesh import get_concrete_mesh

        from revisiting_at_tpu import parallel

        monkeypatch.setattr(parallel, "tp_sharded_leaf_count", lambda _: 0)
        before = get_concrete_mesh()
        with pytest.raises(AssertionError, match="TP rules"):
            self._eval(run_dir, ("--tp", "2", "--only_clean"))
        assert get_concrete_mesh() == before

    def test_eval_tp_branch_runs_last(self, run_dir):
        # sets the global context mesh — keep as the final test (see module
        # docstring)
        self._eval(run_dir, ("--tp", "2", "--only_clean"))
