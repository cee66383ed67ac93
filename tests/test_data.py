"""Data pipeline tests: ImageFolder listing, tf.data decode path, on-device
augmentations."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def make_image_tree(root, n_classes=2, n_per_class=3, size=40):
    from PIL import Image

    rng = np.random.RandomState(0)
    for c in range(n_classes):
        d = os.path.join(root, f"class_{c}")
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            arr = rng.randint(0, 255, size=(size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"img_{i}.jpg"), quality=90)


class TestImageFolder:
    def test_listing_sorted_and_labeled(self, tmp_path):
        from revisiting_at_tpu.data.folder import list_image_folder

        make_image_tree(str(tmp_path))
        files, labels, classes = list_image_folder(tmp_path)
        assert classes == ["class_0", "class_1"]
        assert len(files) == 6
        assert labels == [0, 0, 0, 1, 1, 1]

    def test_basename_order_reproduces_robustbench_subset(self, tmp_path):
        # robustbench.data.load_imagenet takes the FIRST n val images in
        # flat-dir filename order (reference AA_eval.py:115-116); with an
        # ImageFolder layout that is basename order across classes — the
        # first-n subset must be class-diverse, not "all of class_0 first"
        from PIL import Image

        from revisiting_at_tpu.data.folder import FolderConfig, make_folder_dataset

        rng = np.random.RandomState(0)
        # ILSVRC-style basenames interleave classes: val_0000 -> class_1,
        # val_0001 -> class_0, val_0002 -> class_1, val_0003 -> class_0
        layout = [("class_1", "val_0000"), ("class_0", "val_0001"),
                  ("class_1", "val_0002"), ("class_0", "val_0003")]
        for cls, name in layout:
            d = tmp_path / cls
            d.mkdir(exist_ok=True)
            arr = rng.randint(0, 255, size=(40, 40, 3), dtype=np.uint8)
            Image.fromarray(arr).save(str(d / f"{name}.jpg"), quality=90)

        it_fn, _ = make_folder_dataset(
            FolderConfig(root=str(tmp_path), resolution=32, batch_size=3,
                         is_train=False, drop_remainder=False,
                         sort_by_basename=True, subset_size=3)
        )
        labels = np.concatenate([lab for _, lab in it_fn()])
        assert labels.tolist() == [1, 0, 1]  # filename order, both classes

    def test_train_pipeline_shapes(self, tmp_path):
        from revisiting_at_tpu.data.folder import FolderConfig, make_folder_dataset

        make_image_tree(str(tmp_path))
        it_fn, n_batches = make_folder_dataset(
            FolderConfig(root=str(tmp_path), resolution=32, batch_size=2,
                         is_train=True, shuffle_buffer=8)
        )
        batch = next(iter(it_fn()))
        images, labels = batch
        assert images.shape == (2, 32, 32, 3) and images.dtype == np.uint8
        assert labels.shape == (2,)
        assert n_batches == 3

    def test_eval_pipeline_center_crop(self, tmp_path):
        from revisiting_at_tpu.data.folder import FolderConfig, make_folder_dataset

        make_image_tree(str(tmp_path), size=64)
        it_fn, _ = make_folder_dataset(
            FolderConfig(root=str(tmp_path), resolution=32, batch_size=2,
                         is_train=False, drop_remainder=False)
        )
        images, labels = next(iter(it_fn()))
        assert images.shape == (2, 32, 32, 3)

    def test_eval_warp_resize_at_384(self, tmp_path):
        """>=384px evals warp the whole image (no crop) — reference
        dataset_convnext_like.py:88-92. A non-square image must map its
        full extent onto the square output, not a center crop of it."""
        from PIL import Image
        from revisiting_at_tpu.data.folder import FolderConfig, make_folder_dataset

        d = tmp_path / "class_0"
        d.mkdir()
        # left half black, right half white, very wide: a center crop at
        # crop_pct would cut the edges; a warp keeps both extremes
        arr = np.zeros((100, 800, 3), np.uint8)
        arr[:, 400:] = 255
        Image.fromarray(arr).save(d / "img.png")
        it_fn, _ = make_folder_dataset(
            FolderConfig(root=str(tmp_path), resolution=384, batch_size=1,
                         is_train=False, drop_remainder=False)
        )
        images, _ = next(iter(it_fn()))
        assert images.shape == (1, 384, 384, 3)
        assert images[0, :, :20].mean() < 30  # left edge survived
        assert images[0, :, -20:].mean() > 225  # right edge survived

    def test_process_sharding(self, tmp_path):
        from revisiting_at_tpu.data.folder import FolderConfig, make_folder_dataset

        make_image_tree(str(tmp_path))
        cfg = FolderConfig(root=str(tmp_path), resolution=32, batch_size=1,
                           is_train=False, drop_remainder=False)
        n0 = sum(lab.shape[0] for _, lab in make_folder_dataset(cfg, 0, 2)[0]())
        n1 = sum(lab.shape[0] for _, lab in make_folder_dataset(cfg, 1, 2)[0]())
        assert n0 + n1 == 6 and abs(n0 - n1) <= 1


class TestDecodedCache:
    """cache_decoded (data.in_memory): decoded images resident across
    epochs — train keeps RRC random per epoch, eval returns the exact
    uncached tensors, and the budget guard excludes oversized sets."""

    def test_train_cache_valid_and_random_per_epoch(self, tmp_path):
        from revisiting_at_tpu.data.folder import FolderConfig, make_folder_dataset

        make_image_tree(str(tmp_path), n_per_class=4, size=48)
        it_fn, _ = make_folder_dataset(
            FolderConfig(root=str(tmp_path), resolution=32, batch_size=8,
                         is_train=True, shuffle_buffer=8, cache_decoded=True)
        )
        e1 = np.concatenate([b[0] for b in it_fn()])
        e2 = np.concatenate([b[0] for b in it_fn()])
        assert e1.shape == (8, 32, 32, 3) and e1.dtype == np.uint8
        # crops/shuffle must stay random ACROSS epochs (cache sits before
        # the shuffle+RRC stages)
        assert not np.array_equal(e1, e2)

    def test_eval_cache_bit_identical_to_uncached(self, tmp_path):
        from revisiting_at_tpu.data.folder import FolderConfig, make_folder_dataset

        make_image_tree(str(tmp_path), size=64)
        kw = dict(root=str(tmp_path), resolution=32, batch_size=2,
                  is_train=False, drop_remainder=False)
        it_plain, _ = make_folder_dataset(FolderConfig(**kw))
        it_cached, _ = make_folder_dataset(FolderConfig(cache_decoded=True, **kw))
        plain = np.concatenate([b[0] for b in it_plain()])
        first = np.concatenate([b[0] for b in it_cached()])
        second = np.concatenate([b[0] for b in it_cached()])  # from cache
        np.testing.assert_array_equal(plain, first)
        np.testing.assert_array_equal(first, second)

    def test_budget_guard_skips_oversized_sets(self, tmp_path):
        from revisiting_at_tpu.data.folder import FolderConfig, make_folder_dataset

        make_image_tree(str(tmp_path))
        # budget below one image: the cache must be skipped but the
        # pipeline still works (falls back to the fused decode path)
        it_fn, _ = make_folder_dataset(
            FolderConfig(root=str(tmp_path), resolution=32, batch_size=2,
                         is_train=True, shuffle_buffer=8,
                         cache_decoded=True, cache_budget_bytes=16)
        )
        images, _ = next(iter(it_fn()))
        assert images.shape == (2, 32, 32, 3)


class TestOnDeviceAugment:
    def test_augment_batch_shapes_and_determinism(self):
        from revisiting_at_tpu.data.augment import RandAugmentConfig, augment_batch

        rng = jax.random.PRNGKey(0)
        imgs = (np.random.RandomState(1).uniform(0, 255, (4, 24, 24, 3))).astype(np.uint8)
        out1 = augment_batch(rng, jnp.asarray(imgs))
        out2 = augment_batch(rng, jnp.asarray(imgs))
        assert out1.shape == (4, 24, 24, 3) and out1.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
        # different key -> different augmentation
        out3 = augment_batch(jax.random.PRNGKey(1), jnp.asarray(imgs))
        assert float(jnp.abs(out1 - out3).max()) > 0

    def test_all_ops_produce_valid_pixels(self):
        from revisiting_at_tpu.data.augment import _apply_op

        rng = np.random.RandomState(2)
        img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
        for op in range(15):
            out = _apply_op(img, jnp.asarray(op), jnp.asarray(9.0), jnp.asarray(1.0))
            assert out.shape == img.shape
            assert bool(jnp.isfinite(out).all()), op
            assert float(out.min()) >= -1e-5 and float(out.max()) <= 1 + 1e-5, op

    def test_random_erasing_leaves_most_pixels(self):
        from revisiting_at_tpu.data.augment import random_erasing_single

        img = jnp.ones((16, 16, 3)) * 0.5
        out = random_erasing_single(jax.random.PRNGKey(3), img, prob=1.0)
        changed = float(jnp.mean((out != img).any(-1).astype(jnp.float32)))
        assert 0.0 < changed <= 0.34  # max_area = 1/3


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
