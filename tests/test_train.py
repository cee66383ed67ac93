"""End-to-end training tests on the virtual 8-device CPU mesh.

Covers BASELINE.json configs in miniature: clean training, FGSM AT, and
2-step APGD AT of a (tiny) ConvNeXt with ConvStem — the full fused step
(mixup -> attack -> fwd/bwd -> optax -> EMA) under batch sharding.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.config import Config
from revisiting_at_tpu.data.synthetic import SyntheticData
from revisiting_at_tpu.train.trainer import Trainer


def tiny_cfg(tmp_path, attack="none", augment=0, arch="convnext_micro", ema=0.0):
    cfg = Config()
    cfg.model.arch = arch
    cfg.model.not_original = 1
    cfg.model.add_normalization = 0
    cfg.model.model_ema = ema
    cfg.data.num_classes = 13
    cfg.data.augmentations = augment
    cfg.training.batch_size = 16
    cfg.training.epochs = 1
    cfg.training.precision = "fp32"
    cfg.resolution.min_res = cfg.resolution.max_res = 32
    cfg.validation.batch_size = 16
    cfg.validation.resolution = 32
    cfg.adv.attack = attack
    cfg.adv.n_iter = 2
    cfg.adv.eps = 8.0 / 255.0
    cfg.logging.folder = str(tmp_path)
    return cfg


def tiny_data(cfg, n_batches=3):
    train = SyntheticData(cfg.training.batch_size, cfg.resolution.max_res,
                          cfg.data.num_classes, n_batches=n_batches)
    val = SyntheticData(cfg.validation.batch_size, cfg.validation.resolution,
                        cfg.data.num_classes, seed=1, n_batches=2)
    return train, val


class TestTrainer:
    def test_clean_training_step_runs(self, tmp_path):
        cfg = tiny_cfg(tmp_path, attack="none")
        train, val = tiny_data(cfg)
        tr = Trainer(cfg, train_data=train, val_data=val)
        loss = tr.train_loop(0)
        assert np.isfinite(loss)
        assert int(tr.state.step) == 3

    def test_apgd_training_changes_params_and_stays_finite(self, tmp_path):
        cfg = tiny_cfg(tmp_path, attack="apgd", ema=1.0)
        train, val = tiny_data(cfg)
        tr = Trainer(cfg, train_data=train, val_data=val)
        p0 = jax.tree.map(lambda x: np.asarray(x).copy(), tr.state.params)
        loss = tr.train_loop(0)
        assert np.isfinite(loss)
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, tr.state.params)
        assert max(jax.tree.leaves(diffs)) > 0
        # EMA moved toward params but stayed distinct
        ema_leaf = jax.tree.leaves(tr.state.ema_params)[0]
        p_leaf = jax.tree.leaves(tr.state.params)[0]
        assert not np.allclose(np.asarray(ema_leaf), np.asarray(p_leaf))

    @pytest.mark.parametrize("norm,eps", [("L2", 1.0), ("L1", 12.0)])
    def test_l2_l1_apgd_training_via_cli_config(self, tmp_path, norm, eps):
        """Adversarial TRAINING under L2/L1 through the Trainer config path
        (VERDICT r4 missing#3: apgd_train handles any norm,
        /root/reference/autopgd_train_clean.py:228-250). One epoch must
        stay finite and move params."""
        cfg = tiny_cfg(tmp_path, attack="apgd")
        cfg.adv.norm = norm
        cfg.adv.eps = eps
        train, val = tiny_data(cfg)
        tr = Trainer(cfg, train_data=train, val_data=val)
        p0 = jax.tree.map(lambda x: np.asarray(x).copy(), tr.state.params)
        loss = tr.train_loop(0)
        assert np.isfinite(loss)
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, tr.state.params)
        assert max(jax.tree.leaves(diffs)) > 0

    def test_fgsm_training_vit(self, tmp_path):
        cfg = tiny_cfg(tmp_path, attack="fgsm", arch="vit_micro")
        cfg.adv.alpha = 1.25
        train, val = tiny_data(cfg, n_batches=2)
        tr = Trainer(cfg, train_data=train, val_data=val)
        loss = tr.train_loop(0)
        assert np.isfinite(loss)

    def test_fgsm_adv_acc_is_real(self, tmp_path):
        """fgsm-mode adv_acc is the measured eval-mode accuracy at the FGSM
        point (was a 1.0 placeholder, VERDICT r4 weak#3) — a random-init
        13-class model must score far below 1.0."""
        cfg = tiny_cfg(tmp_path, attack="fgsm")
        train, val = tiny_data(cfg, n_batches=1)
        tr = Trainer(cfg, train_data=train, val_data=val)
        images, labels = next(iter(train))
        state, metrics = tr.train_step(tr.state, jnp.asarray(images), jnp.asarray(labels))
        adv_acc = float(metrics["adv_acc"])
        assert 0.0 <= adv_acc <= 0.6, adv_acc

    def test_model_ema_decay_config_threads(self, tmp_path):
        """model.model_ema_decay reaches the fused step: a fast decay (0.5)
        moves EMA params visibly toward the updated params after one step;
        the default 0.9999 keeps them at the init."""
        import jax.numpy as jnp

        dists = {}
        for decay in (0.5, 0.9999):
            cfg = tiny_cfg(tmp_path / f"d{decay}", ema=1.0)
            cfg.model.model_ema_decay = decay
            train, val = tiny_data(cfg, n_batches=1)
            tr = Trainer(cfg, train_data=train, val_data=val)
            ema0 = jax.tree.map(lambda a: np.asarray(a), tr.state.ema_params)
            images, labels = next(iter(train))
            state, _ = tr.train_step(tr.state, jnp.asarray(images), jnp.asarray(labels))
            dists[decay] = sum(
                float(np.abs(np.asarray(a) - b).sum())
                for a, b in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(ema0))
            )
        assert dists[0.5] > 100 * dists[0.9999], dists

    def test_full_recipe_mixup_augment(self, tmp_path):
        cfg = tiny_cfg(tmp_path, attack="apgd", augment=1)
        train, val = tiny_data(cfg, n_batches=2)
        tr = Trainer(cfg, train_data=train, val_data=val)
        loss = tr.train_loop(0)
        assert np.isfinite(loss)

    def test_single_val_and_sharding(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        train, val = tiny_data(cfg)
        tr = Trainer(cfg, train_data=train, val_data=val)
        assert len(jax.devices()) == 8
        assert tr.mesh.shape["data"] == 8
        acc, n = tr.single_val()
        assert 0.0 <= acc <= 1.0 and n == 32

    def test_checkpoint_resume_roundtrip(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        train, val = tiny_data(cfg, n_batches=2)
        tr = Trainer(cfg, train_data=train, val_data=val)
        tr.train_loop(0)
        tr.ckpt.maybe_save(0, tr.state)
        tr.ckpt.wait()
        step_before = int(tr.state.step)
        p_before = np.asarray(jax.tree.leaves(tr.state.params)[0])

        cfg.model.ckpt_path = str(tr.logger.dir)  # resume the same run dir
        tr2 = Trainer(cfg, train_data=train, val_data=val)
        assert tr2.try_resume()
        assert int(tr2.state.step) == step_before
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(tr2.state.params)[0]), p_before
        )
        # opt_state restored too (true resume — the reference never did this)
        flat_a = jax.tree.leaves(tr.state.opt_state)
        flat_b = jax.tree.leaves(tr2.state.opt_state)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestAdvValBestCkpt:
    def test_adv_val_logs_and_best_checkpoint(self, tmp_path):
        cfg = tiny_cfg(tmp_path, attack="apgd")
        cfg.training.epochs = 2
        cfg.validation.adv_val_freq = 1
        cfg.validation.adv_val_iter = 2
        cfg.validation.adv_val_batches = 1
        train, val = tiny_data(cfg)
        tr = Trainer(cfg, train_data=train, val_data=val)
        tr.train()

        import json
        records = [json.loads(l) for l in (tr.logger.dir / "log").read_text().splitlines()]
        adv_vals = [r for r in records if r.get("event") == "adv_val"]
        bests = [r for r in records if r.get("event") == "best_adv"]
        assert len(adv_vals) == 2  # every epoch
        assert all(0.0 <= r["adv_acc"] <= 1.0 for r in adv_vals)
        assert bests, "no best checkpoint recorded"
        assert (tr.logger.dir / "ckpt_best").exists()

        # the best checkpoint restores through the eval CLI's manager path
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(str((tr.logger.dir / "ckpt_best").absolute()))
        assert mgr.latest_step() == bests[-1]["epoch"]

    def test_step_telemetry_records(self, tmp_path):
        cfg = tiny_cfg(tmp_path, attack="none")
        cfg.logging.log_every_steps = 2
        train, val = tiny_data(cfg, n_batches=4)
        tr = Trainer(cfg, train_data=train, val_data=val)
        tr.train_loop(0)

        import json
        records = [json.loads(l) for l in (tr.logger.dir / "log").read_text().splitlines()]
        steps = [r for r in records if r.get("event") == "step"]
        assert [r["step"] for r in steps] == [2, 4]
        for r in steps:
            assert np.isfinite(r["loss"]) and r["imgs_per_s"] > 0 and r["lr"] >= 0


class TestValPrecisionAndTTA:
    def test_lr_tta_uint8_matches_unit_float(self, tmp_path):
        # regression: the flipped TTA forward must see [0,1] pixels too —
        # uint8 folder batches used to hit the model raw on the TTA branch
        cfg = tiny_cfg(tmp_path)
        cfg.validation.lr_tta = 1
        train, val = tiny_data(cfg)
        tr = Trainer(cfg, train_data=train, val_data=val)
        imgs_u8 = np.clip(np.round(val.images[0] * 255), 0, 255).astype(np.uint8)
        imgs_fq = imgs_u8.astype(np.float32) / 255.0  # identical quantization
        labels = jnp.asarray(val.labels[0])
        t1u, t5u = tr.eval_step(tr.state, jnp.asarray(imgs_u8), labels)
        t1f, t5f = tr.eval_step(tr.state, jnp.asarray(imgs_fq), labels)
        assert int(t1u) == int(t1f) and int(t5u) == int(t5f)

    def test_val_precision_fp32_twin(self, tmp_path):
        # validation.precision='fp32' under bf16 training: the clean val
        # forward must match a from-scratch f32 apply of the same params
        from revisiting_at_tpu.models import get_model

        cfg = tiny_cfg(tmp_path)
        cfg.training.precision = "bf16"
        cfg.validation.precision = "fp32"
        train, val = tiny_data(cfg)
        tr = Trainer(cfg, train_data=train, val_data=val)
        imgs = jnp.asarray(val.images[0])
        labels = np.asarray(val.labels[0])
        t1, _ = tr.eval_step(tr.state, imgs, jnp.asarray(labels))
        m32, _ = get_model(
            "convnext_micro", not_original=True, num_classes=13,
            dtype=jnp.float32,
        )
        logits = m32.apply({"params": jax.device_get(tr.state.params)},
                           imgs, train=False)
        expected = int((np.asarray(logits).argmax(-1) == labels).sum())
        assert int(t1) == expected


class TestConfigValidation:
    def test_enum_knobs_fail_fast(self):
        # the reference's fastargs OneOf role (main.py:137,159)
        from revisiting_at_tpu.config import config_from_args

        cfg = config_from_args(["--adv.attack", "apgd", "--adv.norm", "L2"])
        assert cfg.adv.attack == "apgd" and cfg.adv.norm == "L2"
        with pytest.raises(ValueError, match="adv.attack"):
            config_from_args(["--adv.attack", "pgd7"])
        with pytest.raises(ValueError, match="validation.precision"):
            config_from_args(["--validation.precision", "f32"])
        with pytest.raises(ValueError, match="min_res"):
            config_from_args(["--resolution.min_res", "256",
                              "--resolution.max_res", "224"])


class TestRetryTransient:
    def test_retries_transient_then_succeeds(self):
        from revisiting_at_tpu.utils.retry import retry_transient

        calls = []

        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise RuntimeError("INTERNAL: http 500 from remote compiler")
            return "ok"

        assert retry_transient(flaky, base_delay=0.0) == "ok"
        assert len(calls) == 3

    def test_non_transient_propagates_immediately(self):
        from revisiting_at_tpu.utils.retry import retry_transient

        calls = []

        def broken():
            calls.append(1)
            raise ValueError("shape mismatch (1, 2) vs (3,)")

        with pytest.raises(ValueError):
            retry_transient(broken, base_delay=0.0)
        assert len(calls) == 1

    def test_gives_up_after_retries(self):
        from revisiting_at_tpu.utils.retry import retry_transient

        def always_flaky():
            raise RuntimeError("response body closed")

        with pytest.raises(RuntimeError):
            retry_transient(always_flaky, retries=2, base_delay=0.0)

    def test_should_retry_vetoes_post_donation_retry(self):
        # "deadline exceeded" can fire at RUNTIME, after donated buffers
        # were consumed — the veto must propagate the ORIGINAL error instead
        # of re-invoking on deleted arrays
        from revisiting_at_tpu.utils.retry import retry_transient

        calls = []

        def runtime_flake():
            calls.append(1)
            raise RuntimeError("deadline exceeded while fetching result")

        with pytest.raises(RuntimeError, match="deadline exceeded"):
            retry_transient(
                runtime_flake, base_delay=0.0, should_retry=lambda: False
            )
        assert len(calls) == 1

    def test_buffers_intact_detects_donated(self):
        from revisiting_at_tpu.utils.retry import buffers_intact

        x = jnp.ones((8, 8))
        assert buffers_intact({"a": x, "b": None}, jnp.zeros(3))
        donating = jax.jit(lambda v: v + 1, donate_argnums=0)
        _ = donating(x)
        assert not buffers_intact({"a": x})


class TestGradAccum:
    def test_two_microbatches_equal_one_full_batch(self, tmp_path):
        """grad_accum=2 over two half-batches must produce the same params
        as one full-batch step (gradient accumulation is absent in the
        reference — SURVEY §2.3; TPU memory lever for L@320)."""
        import jax
        import jax.numpy as jnp

        from revisiting_at_tpu.models import get_model
        from revisiting_at_tpu.train.ema import ema_init
        from revisiting_at_tpu.train.optimizer import make_optimizer
        from revisiting_at_tpu.train.state import TrainState
        from revisiting_at_tpu.train.train_step import AdvConfig, make_train_step

        model, meta = get_model("convnext_micro", num_classes=5, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                            train=False)["params"]
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 5, 8))

        def run(accum, batches):
            tx = make_optimizer(optimizer="adamw", weight_decay=0.05,
                                family=meta.family, learning_rate=1e-3,
                                params=params, grad_accum=accum)
            state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                               opt_state=tx.init(params), ema_params=ema_init(params))
            step = make_train_step(model, tx, adv=AdvConfig(attack="none"),
                                   mixup=None, ema_decay=0.0,
                                   has_batch_stats=False, donate=False)
            for im, lb in batches:
                state, _ = step(state, im, lb)
            return state.params

        p_full = run(1, [(imgs, labels)])
        p_acc = run(2, [(imgs[:4], labels[:4]), (imgs[4:], labels[4:])])
        for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_full)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6)


class TestResolutionRamp:
    def test_factory_rebuilds_data_at_ramp_epochs(self, tmp_path):
        """min_res < max_res: the trainer must call train_data_factory with
        the ramped resolution (reference get_resolution + decoder resize,
        main.py:372-388,714-718)."""
        cfg = tiny_cfg(tmp_path, attack="none")
        cfg.resolution.min_res = 32
        cfg.resolution.max_res = 64
        cfg.resolution.start_ramp = 0
        cfg.resolution.end_ramp = 2
        cfg.training.epochs = 3
        cfg.validation.resolution = 32
        calls = []

        def factory(res):
            calls.append(res)
            return SyntheticData(cfg.training.batch_size, res,
                                 cfg.data.num_classes, n_batches=1)

        train, val = tiny_data(cfg, n_batches=1)
        tr = Trainer(cfg, train_data=factory(32), val_data=val,
                     train_data_factory=factory)
        calls.clear()
        tr.train()
        # resolutions are rounded to x32: epoch 0 -> 32 (== initial, only
        # rebuilt if different), epochs 1..2 ramp toward 64
        assert calls, "factory never invoked during the ramp"
        assert calls[-1] == 64, calls
        for r in calls:
            assert r % 32 == 0


class TestPixelScale:
    def test_uint8_and_unit_float_batches_are_equivalent(self, tmp_path):
        """The tf.data folder pipeline ships uint8 0..255; synthetic ships
        float [0,1]. Both must reach the model identically — uint8 going in
        raw (the mini-experiment regression: attacks clip to [0,1])."""
        cfg = tiny_cfg(tmp_path, attack="apgd")
        train, val = tiny_data(cfg)
        tr = Trainer(cfg, train_data=train, val_data=val)

        rng = np.random.RandomState(0)
        img_u8 = rng.randint(0, 256, size=(16, 32, 32, 3), dtype=np.uint8)
        img_f = img_u8.astype(np.float32) / 255.0
        labels = jnp.asarray(rng.randint(0, 13, size=16))

        # the step donates its input state: feed independent copies
        s1, m1 = tr.train_step(jax.tree.map(jnp.copy, tr.state), jnp.asarray(img_u8), labels)
        s2, m2 = tr.train_step(jax.tree.map(jnp.copy, tr.state), jnp.asarray(img_f), labels)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        t1, _ = tr.eval_step(s1, jnp.asarray(img_u8), labels)
        t2, _ = tr.eval_step(s1, jnp.asarray(img_f), labels)
        assert int(t1) == int(t2)


class TestSchedule:
    def test_cosine_interp_matches_reference_shape(self):
        from revisiting_at_tpu.train.schedule import LRConfig, epoch_lr, make_lr_schedule

        cfg = LRConfig(lr=1e-3, schedule_type="cosine", lr_peak_epoch=20, epochs=300)
        # epoch-level values (reference main.py:230-243)
        assert float(epoch_lr(cfg, 0)) == pytest.approx(1e-7, rel=1e-3)
        assert float(epoch_lr(cfg, 20)) == pytest.approx(1e-3, rel=1e-4)
        assert float(epoch_lr(cfg, 300)) == pytest.approx(5e-6, rel=1e-2)
        # per-iteration interpolation (main.py:956-958)
        sched = make_lr_schedule(cfg, iters_per_epoch=10)
        mid = float(sched(5))  # halfway through epoch 0
        lo, hi = float(epoch_lr(cfg, 0)), float(epoch_lr(cfg, 1))
        assert lo < mid < hi

    def test_step_and_cyclic(self):
        from revisiting_at_tpu.train.schedule import LRConfig, epoch_lr

        s = LRConfig(lr=1.0, schedule_type="step", step_ratio=0.1, step_length=30, epochs=90)
        assert float(epoch_lr(s, 0)) == 1.0
        assert float(epoch_lr(s, 30)) == pytest.approx(0.1)
        assert float(epoch_lr(s, 60)) == pytest.approx(0.01)
        c = LRConfig(lr=1.0, schedule_type="cyclic", lr_peak_epoch=10, epochs=100)
        assert float(epoch_lr(c, 10)) == pytest.approx(1.0)
        assert float(epoch_lr(c, 100)) == pytest.approx(0.0, abs=1e-6)


class TestWdMask:
    def test_convnext_rule_decays_norm_scales_not_biases(self):
        from revisiting_at_tpu.models import get_model
        from revisiting_at_tpu.train.optimizer import wd_mask

        model, meta = get_model("convnext_tiny", dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)[
            "params"
        ]
        mask = wd_mask(params, meta.family)
        import flax

        flat = flax.traverse_util.flatten_dict(mask)
        for path, decayed in flat.items():
            if path[-1].endswith("bias"):
                assert not decayed, path
            else:
                assert decayed, path  # incl. LN scale and gamma (reference quirk)

    def test_vit_rule_ndim(self):
        from revisiting_at_tpu.models import get_model
        from revisiting_at_tpu.train.optimizer import wd_mask

        model, meta = get_model("vit_s", dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)[
            "params"
        ]
        mask = wd_mask(params, meta.family)
        import flax

        flat_p = flax.traverse_util.flatten_dict(params)
        flat_m = flax.traverse_util.flatten_dict(mask)
        for path, decayed in flat_m.items():
            assert decayed == (flat_p[path].ndim > 1), path


class TestMixup:
    def test_targets_sum_to_one_and_images_in_range(self):
        from revisiting_at_tpu.data.mixup import MixupConfig, mixup_cutmix

        rng = jax.random.PRNGKey(0)
        images = jax.random.uniform(rng, (8, 16, 16, 3))
        labels = jnp.arange(8) % 5
        cfg = MixupConfig(num_classes=5, label_smoothing=0.1)
        for i in range(5):
            mixed, targets = mixup_cutmix(jax.random.fold_in(rng, i), images, labels, cfg)
            np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, rtol=1e-5)
            assert float(mixed.min()) >= 0 and float(mixed.max()) <= 1


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
