"""Golden parity of on-device augmentation ops vs PIL — the library timm's
RandAugment actually calls (reference recipe 'rand-m9-mstd0.5-inc1',
parserr.py:17-41). Histogram/bit ops must match PIL EXACTLY; float-blend
enhance ops within 2/255 (PIL rounds through uint8 at each step); sharpness
compared on the interior (PIL leaves a 1px border unfiltered by design).
"""

import numpy as np
import pytest

import jax.numpy as jnp
from PIL import Image, ImageEnhance, ImageOps

from revisiting_at_tpu.data import augment as A


def rand_img(seed=0, h=24, w=20):
    rng = np.random.RandomState(seed)
    # mix of smooth gradient + noise: non-degenerate histograms
    g = np.linspace(0, 255, h * w).reshape(h, w, 1)
    img = np.clip(g + rng.normal(0, 60, (h, w, 3)), 0, 255).astype(np.uint8)
    return img


def ours(op, img_u8, lvl=9.0, sign=1.0):
    x = jnp.asarray(img_u8.astype(np.float32) / 255.0)
    out = op(x, jnp.asarray(lvl)) if sign is None else op(x, jnp.asarray(lvl), jnp.asarray(sign))
    return np.asarray(out) * 255.0


class TestExactOps:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_equalize_matches_pil_exactly(self, seed):
        img = rand_img(seed)
        want = np.asarray(ImageOps.equalize(Image.fromarray(img)))
        got = ours(lambda x, l: A.equalize(x, l), img, sign=None)
        np.testing.assert_array_equal(np.round(got).astype(np.uint8), want)

    def test_equalize_degenerate_constant_image(self):
        img = np.full((8, 8, 3), 77, np.uint8)
        want = np.asarray(ImageOps.equalize(Image.fromarray(img)))
        got = ours(lambda x, l: A.equalize(x, l), img, sign=None)
        np.testing.assert_array_equal(np.round(got).astype(np.uint8), want)

    @pytest.mark.parametrize("lvl,bits", [(0.0, 4), (3.0, 3), (6.0, 2), (9.9, 1)])
    def test_posterize_matches_pil(self, lvl, bits):
        img = rand_img(4)
        want = np.asarray(ImageOps.posterize(Image.fromarray(img), bits))
        got = ours(A.posterize, img, lvl=lvl, sign=None)
        np.testing.assert_array_equal(np.round(got).astype(np.uint8), want)

    @pytest.mark.parametrize("lvl", [0.0, 5.0, 9.0])
    def test_solarize_matches_pil(self, lvl):
        img = rand_img(5)
        thresh = 256 - int(lvl / 10.0 * 256)  # timm increasing mapping
        want = np.asarray(ImageOps.solarize(Image.fromarray(img), thresh))
        got = ours(A.solarize, img, lvl=lvl, sign=None)
        np.testing.assert_allclose(got, want.astype(np.float64), atol=1.01)

    def test_solarize_add_matches_timm_formula(self):
        img = rand_img(6)
        lvl = 9.0
        add = int(lvl / 10.0 * 110)
        x = img.astype(np.int64)
        want = np.where(x < 128, np.clip(x + add, 0, 255), x)
        got = ours(A.solarize_add, img, lvl=lvl, sign=None)
        np.testing.assert_allclose(got, want.astype(np.float64), atol=1.01)

    def test_invert_matches_pil(self):
        img = rand_img(7)
        want = np.asarray(ImageOps.invert(Image.fromarray(img)))
        got = ours(A.invert, img, sign=None)
        np.testing.assert_allclose(got, want.astype(np.float64), atol=1e-4)


class TestEnhanceOps:
    @pytest.mark.parametrize("sign", [1.0, -1.0])
    def test_brightness(self, sign):
        img = rand_img(8)
        factor = 1.0 + sign * 9.0 / 10.0 * 0.9
        want = np.asarray(ImageEnhance.Brightness(Image.fromarray(img)).enhance(factor))
        got = ours(A.brightness, img, sign=sign)
        assert np.abs(got - want).max() <= 2.0

    @pytest.mark.parametrize("sign", [1.0, -1.0])
    def test_color(self, sign):
        img = rand_img(9)
        factor = 1.0 + sign * 9.0 / 10.0 * 0.9
        want = np.asarray(ImageEnhance.Color(Image.fromarray(img)).enhance(factor))
        got = ours(A.color, img, sign=sign)
        assert np.abs(got - want).max() <= 2.5  # PIL L-conversion truncates

    @pytest.mark.parametrize("sign", [1.0, -1.0])
    def test_contrast(self, sign):
        img = rand_img(10)
        factor = 1.0 + sign * 9.0 / 10.0 * 0.9
        want = np.asarray(ImageEnhance.Contrast(Image.fromarray(img)).enhance(factor))
        got = ours(A.contrast, img, sign=sign)
        assert np.abs(got - want).max() <= 2.5

    @pytest.mark.parametrize("sign", [1.0, -1.0])
    def test_sharpness_interior(self, sign):
        img = rand_img(11)
        factor = 1.0 + sign * 9.0 / 10.0 * 0.9
        want = np.asarray(
            ImageEnhance.Sharpness(Image.fromarray(img)).enhance(factor)
        ).astype(np.float64)
        got = ours(A.sharpness, img, sign=sign)
        # PIL leaves a 1px border unfiltered; compare the interior
        assert np.abs(got[1:-1, 1:-1] - want[1:-1, 1:-1]).max() <= 2.0

    def test_autocontrast(self):
        img = rand_img(12)
        want = np.asarray(ImageOps.autocontrast(Image.fromarray(img))).astype(np.float64)
        got = ours(lambda x, l: A.autocontrast(x, l), img, sign=None)
        assert np.abs(got - want).max() <= 2.0


class TestGeometric:
    def test_integer_translate_is_exact_shift(self):
        img = rand_img(13)
        x = jnp.asarray(img.astype(np.float32) / 255.0)
        out = np.asarray(A._affine_sample(x, A._translate_x_mat(jnp.asarray(4.0))))
        # inverse map: output[y, x] = input[y, x + 4] -> shift left by 4
        np.testing.assert_allclose(
            out[:, :-4], np.asarray(x)[:, 4:], atol=1e-6
        )
        np.testing.assert_allclose(out[:, -4:], 0.5, atol=1e-6)  # fill

    def test_rotate_zero_is_identity(self):
        img = rand_img(14)
        x = jnp.asarray(img.astype(np.float32) / 255.0)
        out = np.asarray(A._affine_sample(x, A._rotate_mat(jnp.asarray(0.0), 24, 20)))
        np.testing.assert_allclose(out, np.asarray(x), atol=1e-5)

    def test_rotate_90_matches_pil_within_tolerance(self):
        # square image; PIL rotates about (w/2, h/2); ours about ((w-1)/2,
        # (h-1)/2) — a half-pixel convention difference that vanishes for
        # exact 90-degree rotations of even-sized squares
        img = rand_img(15, h=20, w=20)
        x = jnp.asarray(img.astype(np.float32) / 255.0)
        out = np.asarray(A._affine_sample(x, A._rotate_mat(jnp.asarray(90.0), 20, 20)))
        want = np.asarray(
            Image.fromarray(img).rotate(90, resample=Image.BILINEAR)
        ).astype(np.float64)
        inner = slice(1, -1)
        assert np.abs(out[inner, inner] * 255 - want[inner, inner]).max() <= 2.0


class TestBatchedWarp:
    """warp_affine_batch (two one-hot-matmul passes on the MXU) vs the
    per-image gather sampler: exact (to bf16) for axis-aligned maps; for
    rotations the separable kernel is compared on a smooth image."""

    def _x(self, seed=16, b=3, h=24, w=24, smooth=False):
        rng = np.random.RandomState(seed)
        if smooth:
            base = rng.uniform(0, 1, (4, 4, 3))
            img = np.asarray(
                Image.fromarray((base * 255).astype(np.uint8)).resize((w, h), Image.BICUBIC)
            ).astype(np.float32) / 255.0
            return jnp.asarray(np.stack([img] * b))
        return jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))

    @pytest.mark.parametrize("mat_fn", [
        lambda: A._shear_x_mat(jnp.asarray(0.25)),
        lambda: A._shear_y_mat(jnp.asarray(-0.2)),
        lambda: A._translate_x_mat(jnp.asarray(5.3)),
        lambda: A._translate_y_mat(jnp.asarray(-7.8)),
    ])
    def test_axis_aligned_exact(self, mat_fn):
        x = self._x()
        mat = mat_fn()
        import jax

        ref = np.asarray(jax.vmap(lambda im: A._affine_sample(im, mat))(x))
        got = np.asarray(A.warp_affine_batch(x, jnp.broadcast_to(mat, (3, 2, 3))))
        assert np.abs(got - ref).max() < 8e-3  # bf16 matmul weights

    def test_rotation_on_smooth_image(self):
        x = self._x(smooth=True)
        mat = A._rotate_mat(jnp.asarray(20.0), 24, 24)
        import jax

        ref = np.asarray(jax.vmap(lambda im: A._affine_sample(im, mat))(x))
        got = np.asarray(A.warp_affine_batch(x, jnp.broadcast_to(mat, (3, 2, 3))))
        # separable kernel + boundary fill-blend differences
        assert np.abs(got - ref).max() < 0.05

    def test_identity_is_noop(self):
        x = self._x(seed=17)
        got = np.asarray(A.warp_affine_batch(x, jnp.broadcast_to(A._IDENTITY_MAT, (3, 2, 3))))
        assert np.abs(got - np.asarray(x)).max() < 4e-3


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
