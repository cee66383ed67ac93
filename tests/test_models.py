"""Model-zoo tests: param-count parity with the reference's timm models,
shape correctness of the ConvStem surgery, and forward sanity.

Param-count checks are the JAX equivalent of the reference's FLOP-table
verification culture (main.py:846-854): they confirm the architecture
surgery produced exactly the intended network.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.models import get_model, interpolate_pos_encoding


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def init_model(name, img=32, **kw):
    model, meta = get_model(name, dtype=jnp.float32, **kw)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, img, img, 3)), train=False)
    return model, meta, variables


# Golden param counts from the reference's timm models (pytorch-1.13/timm-0.8).
TIMM_PARAM_COUNTS = {
    "convnext_tiny": 28_589_128,
    "convnext_small": 50_223_688,
    "convnext_base": 88_591_464,
    "convnext_large": 197_767_336,
    "vit_s": 22_050_664,
    "vit_b": 86_567_656,
    "resnet50": 25_557_032,
    "resnet101": 44_549_160,
    "wrn_50_2": 68_883_240,
}


class TestParamCounts:
    @pytest.mark.parametrize("name", ["convnext_tiny", "vit_s"])
    def test_exact_param_parity_small(self, name):
        img = 224 if name.startswith("vit") else 32  # ViT pos-embed depends on res
        _, _, variables = init_model(name, img=img)
        assert n_params(variables["params"]) == TIMM_PARAM_COUNTS[name]

    @pytest.mark.parametrize("name", ["resnet50", "wrn_50_2"])
    def test_exact_param_parity_resnet(self, name):
        _, _, variables = init_model(name, img=64)
        assert n_params(variables["params"]) == TIMM_PARAM_COUNTS[name]


class TestConvStemSurgery:
    def test_convnext_tiny_cvst_stage0_width(self):
        # ConvStem1(48) must produce a /4, 96-channel map feeding stage 0
        model, _, variables = init_model("convnext_tiny", img=64, not_original=True)
        out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
        assert out.shape == (2, 1000)

    def test_vit_s_cvst_grid(self):
        # ConvStem(48,8) downsamples /16 to embed dim 384 -> 197 tokens @224
        model, _, variables = init_model("vit_s", img=224, not_original=True)
        pos = variables["params"]["pos_embed"]
        assert pos.shape == (1, 14 * 14 + 1, 384)

    def test_vit_b_cvst_fin_dim(self):
        # ConvBlock(48, end_siz=16, fin_dim=None) -> fin 768 (reference :301)
        model, _, variables = init_model("vit_b", img=32, not_original=True)
        proj_kernel = variables["params"]["ConvStem_0"]["proj"]["Conv_0"]["kernel"]
        assert proj_kernel.shape[-1] == 768

    def test_vit_m_cvst_fin_512(self):
        model, _, variables = init_model("vit_m", img=32, not_original=True)
        proj_kernel = variables["params"]["ConvStem2_0"]["proj"]["Conv_0"]["kernel"]
        assert proj_kernel.shape[-1] == 512

    def test_convnext_iso_updated_432(self):
        model, _, variables = init_model(
            "convnext_iso", img=32, not_original=True, updated=True
        )
        proj_kernel = variables["params"]["ConvStem_0"]["proj"]["Conv_0"]["kernel"]
        assert proj_kernel.shape[-1] == 432


class TestForward:
    def test_convnext_forward_finite(self):
        model, _, variables = init_model("convnext_tiny", img=32)
        out = model.apply(variables, jnp.ones((2, 32, 32, 3)) * 0.5, train=False)
        assert out.shape == (2, 1000)
        assert bool(jnp.isfinite(out).all())

    def test_normalized_model(self):
        model, _, variables = init_model("convnext_tiny", img=32, add_normalization=True)
        out = model.apply(variables, jnp.ones((1, 32, 32, 3)) * 0.5, train=False)
        assert out.shape == (1, 1000)

    def test_resnet_batch_stats_update_only_in_train(self):
        model, meta, variables = init_model("resnet50", img=32)
        assert meta.has_batch_stats and "batch_stats" in variables
        x = jnp.ones((2, 32, 32, 3)) * 0.3
        # eval: no mutation needed
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 1000)
        # train: batch_stats must be mutable
        out, updated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        changed = jax.tree.map(
            lambda a, b: bool(jnp.any(a != b)),
            variables["batch_stats"],
            updated["batch_stats"],
        )
        assert any(jax.tree.leaves(changed))

    def test_droppath_zero_at_eval(self):
        model, _, variables = init_model("convnext_tiny", img=32, drop_path_rate=0.5)
        x = jnp.ones((2, 32, 32, 3)) * 0.5
        a = model.apply(variables, x, train=False)
        b = model.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_bf16_compute_f32_params(self):
        model, _, _ = get_model("convnext_tiny", dtype=jnp.bfloat16), None, None
        model, meta = get_model("convnext_tiny", dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        for leaf in jax.tree.leaves(variables["params"]):
            assert leaf.dtype == jnp.float32
        out = model.apply(variables, jnp.ones((1, 32, 32, 3), jnp.bfloat16), train=False)
        assert out.dtype == jnp.float32  # head in f32


class TestPosEmbedInterpolation:
    def test_resize_shape(self):
        pos = jnp.asarray(np.random.RandomState(0).randn(1, 197, 384).astype(np.float32))
        out = interpolate_pos_encoding(pos, new_img_size=320, patch_size=16)
        assert out.shape == (1, 20 * 20 + 1, 384)
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(pos[:, 0]))

    def test_noop_same_size(self):
        pos = jnp.ones((1, 197, 384))
        out = interpolate_pos_encoding(pos, new_img_size=224, patch_size=16)
        assert out is pos


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
