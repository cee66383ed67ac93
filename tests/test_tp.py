"""Tensor-parallel ("model" axis) sharding option (parallel/tp.py).

The reference is DP-only (SURVEY §2.3); the TPU build adds the optional
model-axis sharding that section calls out for the large models at high
res. Verifies (a) the rule table shards the block MLPs and nothing else,
(b) TP logits equal single-device logits for both families, (c) the full
adversarial train step runs auto-partitioned under dist.tp with optimizer
moments mirroring their params, (d) divisibility fallback replicates, and
(e) the Pallas+TP combination is rejected.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from revisiting_at_tpu.models import get_model
from revisiting_at_tpu.parallel import (
    MeshConfig,
    batch_shard_count,
    batch_sharding,
    make_mesh,
    tp_sharded_leaf_count,
    tp_tree_shardings,
)


def _init_params(arch):
    model, meta = get_model(arch, not_original=True, num_classes=11)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )["params"]
    return model, params


class TestRules:
    def test_mesh_axes_and_batch_shards(self):
        mesh = make_mesh(MeshConfig(model=2))
        assert dict(mesh.shape) == {"data": 4, "fsdp": 1, "model": 2}
        assert batch_shard_count(mesh) == 4
        spec = batch_sharding(mesh).spec
        assert "model" not in (spec[0] if isinstance(spec[0], tuple) else (spec[0],))

    def test_convnext_rules(self):
        _, params = _init_params("convnext_micro")
        mesh = make_mesh(MeshConfig(model=2))
        sh = tp_tree_shardings(mesh, params)
        assert tp_sharded_leaf_count(sh) > 0
        flat = {
            "/".join(str(getattr(e, "key", e)) for e in p): ns
            for p, ns in jax.tree_util.tree_flatten_with_path(
                sh, is_leaf=lambda x: hasattr(x, "spec")
            )[0]
        }
        # column-split expand, row-split project, replicated everything else
        assert flat["stage2_block0/pwconv1_kernel"].spec == P(None, "model")
        assert flat["stage2_block0/pwconv1_bias"].spec == P("model")
        assert flat["stage2_block0/pwconv2_kernel"].spec == P("model", None)
        assert flat["stage2_block0/pwconv2_bias"].spec == P()
        assert flat["stage2_block0/dwconv_kernel"].spec == P()
        assert flat["stage2_block0/norm_scale"].spec == P()
        assert flat["head/kernel"].spec == P()

    def test_vit_rules(self):
        _, params = _init_params("vit_micro")
        mesh = make_mesh(MeshConfig(model=2))
        sh = tp_tree_shardings(mesh, params)
        assert tp_sharded_leaf_count(sh) > 0
        flat = {
            "/".join(str(getattr(e, "key", e)) for e in p): ns
            for p, ns in jax.tree_util.tree_flatten_with_path(
                sh, is_leaf=lambda x: hasattr(x, "spec")
            )[0]
        }
        assert flat["block0/mlp/fc1/kernel"].spec == P(None, "model")
        assert flat["block0/mlp/fc2/kernel"].spec == P("model", None)
        # attention replicates in v1 (fused-qkv [3,H,hd] reshape is not
        # divisible on its major factor — see parallel/tp.py docstring)
        assert flat["block0/attn/qkv/kernel"].spec == P()

    def test_divisibility_fallback_replicates(self):
        mesh = make_mesh(MeshConfig(model=2))
        tree = {"blockX": {"pwconv1_kernel": jnp.ones((6, 9))}}  # 9 % 2 != 0
        sh = tp_tree_shardings(mesh, tree)
        assert sh["blockX"]["pwconv1_kernel"].spec == P()
        assert tp_sharded_leaf_count(sh) == 0


class TestLogitsParity:
    @pytest.mark.parametrize("arch", ["convnext_micro", "vit_micro"])
    def test_tp_logits_match_single_device(self, arch):
        model, params = _init_params(arch)
        mesh = make_mesh(MeshConfig(model=2))
        sh = tp_tree_shardings(mesh, params)
        assert tp_sharded_leaf_count(sh) > 0
        x = jnp.asarray(
            np.random.RandomState(0).uniform(0, 1, (8, 32, 32, 3)), jnp.float32
        )
        fn = jax.jit(lambda v, xb: model.apply({"params": v}, xb, train=False))
        ref = np.asarray(fn(params, x))
        out = np.asarray(
            fn(jax.device_put(params, sh), jax.device_put(x, batch_sharding(mesh)))
        )
        # row-split contractions change the f32 accumulation order
        np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-4)


class TestAttentionHeadTP:
    def test_tp_attn_logits_and_input_grad_match(self):
        """v2: attention heads sharded via the activation constraint in
        models/vit.py Attention (params replicated; the fused-qkv param
        split is blocked by the [3,H,hd] major factor)."""
        model0, _ = get_model("vit_micro", not_original=True, num_classes=11)
        model2, _ = get_model(
            "vit_micro", not_original=True, num_classes=11, tp_attn=2
        )
        params = model0.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )["params"]
        x = jnp.asarray(
            np.random.RandomState(0).uniform(0, 1, (8, 32, 32, 3)), jnp.float32
        )
        ref = jax.jit(lambda v, xb: model0.apply({"params": v}, xb, train=False))(
            params, x
        )
        gref = jax.jit(
            jax.grad(lambda xb: model0.apply({"params": params}, xb, train=False).sum())
        )(x)

        mesh = make_mesh(MeshConfig(model=2))
        with jax.set_mesh(mesh):
            sh = tp_tree_shardings(mesh, params)
            ptp = jax.device_put(params, sh)
            xtp = jax.device_put(x, batch_sharding(mesh))
            out = jax.jit(
                lambda v, xb: model2.apply({"params": v}, xb, train=False)
            )(ptp, xtp)
            # the attack-closure shape: gradient w.r.t. the INPUT
            g = jax.jit(
                jax.grad(
                    lambda xb: model2.apply({"params": ptp}, xb, train=False).sum()
                )
            )(xtp)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=5e-3)

    def test_tp_attn_skips_indivisible_heads(self):
        # vit_micro has 2 heads: tp_attn=3 must not constrain (no crash
        # without any mesh in context proves the gate is static)
        model3, _ = get_model(
            "vit_micro", not_original=True, num_classes=11, tp_attn=3
        )
        params = model3.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )["params"]
        out = model3.apply(
            {"params": params}, jnp.ones((2, 32, 32, 3)) * 0.5, train=False
        )
        assert np.isfinite(np.asarray(out)).all()


class TestTrainerTP:
    def _cfg(self, tmp_path, use_pallas=0):
        from revisiting_at_tpu.config import Config

        cfg = Config()
        cfg.model.arch = "convnext_micro"
        cfg.model.not_original = 1
        cfg.model.add_normalization = 0
        cfg.model.model_ema = 1
        cfg.data.num_classes = 7
        cfg.training.batch_size = 16
        cfg.training.precision = "fp32"
        cfg.training.use_pallas = use_pallas
        cfg.resolution.min_res = cfg.resolution.max_res = 32
        cfg.validation.batch_size = 16
        cfg.validation.resolution = 32
        cfg.adv.attack = "apgd"
        cfg.adv.n_iter = 2
        cfg.dist.tp = 2
        cfg.logging.folder = str(tmp_path)
        return cfg

    def test_full_at_step_under_tp(self, tmp_path):
        from revisiting_at_tpu.train.trainer import Trainer

        tr = Trainer(self._cfg(tmp_path))
        try:
            assert dict(tr.mesh.shape) == {"data": 4, "fsdp": 1, "model": 2}
            # params, EMA and optimizer moments all carry the model axis
            assert tp_sharded_leaf_count(tr.state_shardings.params) == 12
            assert tp_sharded_leaf_count(tr.state_shardings.ema_params) == 12
            assert tp_sharded_leaf_count(tr.state_shardings.opt_state) == 24
            imgs, labels = next(iter(tr.train_data))
            ib, lb = tr._put_batch(imgs, labels)
            state, metrics = tr.train_step(tr.state, ib, lb)
            l1 = float(metrics["loss"])
            state, metrics = tr.train_step(state, ib, lb)
            l2 = float(metrics["loss"])
            assert np.isfinite(l1) and np.isfinite(l2)
            assert int(state.step) == 2
            # the updated params keep their TP shardings (no silent re-layout)
            p_leaf = jax.tree_util.tree_flatten_with_path(state.params)[0]
            tp_after = sum(
                1
                for _, v in p_leaf
                if "model" in str(getattr(v, "sharding", ""))
            )
            assert tp_after > 0
        finally:
            # dist.tp sets the thread-local context mesh globally; restore it
            # or every later test in the session traces against this mesh
            tr.release_mesh()

    def test_trainer_releases_context_mesh(self, tmp_path):
        from jax._src.mesh import get_concrete_mesh

        from revisiting_at_tpu.train.trainer import Trainer

        before = get_concrete_mesh()
        tr = Trainer(self._cfg(tmp_path))
        assert get_concrete_mesh() == tr.mesh
        tr.release_mesh()
        assert get_concrete_mesh() == before
        tr.release_mesh()  # idempotent

    def test_tp_rejects_pallas(self, tmp_path):
        from revisiting_at_tpu.train.trainer import Trainer

        with pytest.raises(ValueError, match="use_pallas"):
            Trainer(self._cfg(tmp_path, use_pallas=1))

    def test_failed_init_releases_context_mesh(self, tmp_path):
        # a construction failure AFTER jax.set_mesh (here: pretrained=1
        # without a local weights file) must restore the thread-local mesh —
        # the half-built Trainer is unreachable, nobody can release_mesh()
        from jax._src.mesh import get_concrete_mesh

        from revisiting_at_tpu.train.trainer import Trainer

        cfg = self._cfg(tmp_path)
        cfg.model.pretrained = 1
        cfg.model.pretrained_path = ""
        before = get_concrete_mesh()
        with pytest.raises(ValueError, match="pretrained_path"):
            Trainer(cfg)
        assert get_concrete_mesh() == before
