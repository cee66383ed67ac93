"""torch_export tests: the flax->torch bridge must (a) round-trip through
torch_import to the identical param tree, (b) load into a reference-shaped
torch model with strict=True, and (c) preserve logits through the torch
forward — proving a checkpoint trained here is publishable in the
reference's format (main.py:737-741, rb_architecture_util.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_torch_import import NCLS, TConvNeXt, TViT, _logits_close  # noqa: E402


def _init_params(arch, *, not_original, num_classes=NCLS, img=32):
    from revisiting_at_tpu.models import get_model

    model, _ = get_model(
        arch, not_original=not_original, num_classes=num_classes,
        dtype=jnp.float32,
    )
    params = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, img, img, 3)), train=False
    )["params"]
    return model, params


class TestRoundTrip:
    @pytest.mark.parametrize("cvst", [False, True])
    def test_convnext_roundtrip(self, cvst):
        from revisiting_at_tpu.ckpt.torch_export import export_torch_state_dict
        from revisiting_at_tpu.ckpt.torch_import import (
            convnext_from_torch, to_param_tree,
        )

        _, params = _init_params("convnext_micro", not_original=cvst)
        sd = export_torch_state_dict(params, "convnext_micro")
        back = to_param_tree(
            convnext_from_torch(sd, not_original=cvst, stem_module="ConvStem1_0"),
            params,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, back,
        )

    @pytest.mark.parametrize("cvst", [False, True])
    def test_vit_roundtrip(self, cvst):
        from revisiting_at_tpu.ckpt.torch_export import export_torch_state_dict
        from revisiting_at_tpu.ckpt.torch_import import to_param_tree, vit_from_torch

        _, params = _init_params("vit_micro", not_original=cvst)
        sd = export_torch_state_dict(params, "vit_micro")
        back = to_param_tree(
            vit_from_torch(sd, not_original=cvst, embed_module="ConvStem_0"), params
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, back,
        )


class TestRoundTripIsoAndNormalized:
    @pytest.mark.parametrize("cvst", [False, True])
    def test_convnext_iso_roundtrip(self, cvst):
        # Meta-layout iso (reference models/convnext_iso.py; README.md:32's
        # iso-CvSt row) — flat blocks.{i}, bare 16x16 stem conv
        from revisiting_at_tpu.ckpt.torch_export import export_torch_state_dict
        from revisiting_at_tpu.ckpt.torch_import import (
            convnext_iso_from_torch, to_param_tree,
        )

        _, params = _init_params("convnext_iso", not_original=cvst)
        sd = export_torch_state_dict(params, "convnext_iso")
        if not cvst:
            assert "stem.weight" in sd and "blocks.0.dwconv.weight" in sd
        back = to_param_tree(convnext_iso_from_torch(sd, not_original=cvst), params)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, back,
        )

    def test_normalized_model_tree_exports(self):
        # default model.add_normalization=1 nests params under 'model'
        # (NormalizedModel); the exporter strips it — the reference's loader
        # cascade likewise skips normalizer buffers
        from revisiting_at_tpu.ckpt.torch_export import export_torch_state_dict
        from revisiting_at_tpu.models import get_model

        model, _ = get_model(
            "convnext_micro", not_original=True, num_classes=NCLS,
            dtype=jnp.float32, add_normalization=True,
        )
        params = model.init(
            jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, 3)), train=False
        )["params"]
        assert set(params.keys()) == {"model"}
        sd = export_torch_state_dict(params, "convnext_micro")
        assert "head.fc.weight" in sd

    def test_unconsumed_leaves_raise(self):
        from revisiting_at_tpu.ckpt.torch_export import export_torch_state_dict

        _, params = _init_params("vit_micro", not_original=False)
        with pytest.raises((ValueError, KeyError)):
            # wrong family mapper for this tree must not silently drop leaves
            export_torch_state_dict(dict(params, rogue_leaf=np.zeros(3)), "vit_micro")


class _TIsoBlock(torch.nn.Module):
    """Meta ConvNeXt Block (reference models/convnext.py:15-50) at
    layer_scale_init_value=0 (the iso default, models/convnext_iso.py:36)."""

    def __init__(self, dim):
        super().__init__()
        nn = torch.nn
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)

    def forward(self, x):
        shortcut = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pwconv2(torch.nn.functional.gelu(self.pwconv1(x)))
        return shortcut + x.permute(0, 3, 1, 2)


class _TIsoConvNeXt(torch.nn.Module):
    """Meta-layout isotropic ConvNeXt (reference models/convnext_iso.py:19-65)."""

    def __init__(self, dim=384, depth=18, ncls=NCLS):
        super().__init__()
        nn = torch.nn
        self.stem = nn.Conv2d(3, dim, 16, stride=16)
        self.blocks = nn.Sequential(*[_TIsoBlock(dim) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, ncls)

    def forward(self, x):
        x = self.blocks(self.stem(x))
        x = self.norm(x.mean(dim=(2, 3)))
        return self.head(x)


class TestTorchLoadable:
    """strict=True load into the reference-shaped torch minis + logits
    parity through the TORCH forward (the inverse of the import tests)."""

    def test_iso_strict_load_and_logits(self):
        from revisiting_at_tpu.ckpt.torch_export import export_torch_state_dict

        flax_model, params = _init_params("convnext_iso", not_original=False)
        sd = export_torch_state_dict(params, "convnext_iso")
        tm = _TIsoConvNeXt()
        res = tm.load_state_dict(
            {k: torch.from_numpy(np.asarray(v, np.float32).copy())
             for k, v in sd.items()},
            strict=True,
        )
        assert not res.missing_keys and not res.unexpected_keys
        x = np.random.RandomState(7).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
        _logits_close(tm, flax_model, params, x, atol=5e-4)

    @pytest.mark.parametrize("cvst", [False, True])
    def test_convnext_strict_load_and_logits(self, cvst):
        from revisiting_at_tpu.ckpt.torch_export import export_torch_state_dict

        flax_model, params = _init_params("convnext_micro", not_original=cvst)
        sd = export_torch_state_dict(params, "convnext_micro")
        tm = TConvNeXt(cvst=cvst)
        missing = tm.load_state_dict(
            {k: torch.from_numpy(np.asarray(v, np.float32).copy())
             for k, v in sd.items()},
            strict=True,
        )
        assert not missing.missing_keys and not missing.unexpected_keys
        x = np.random.RandomState(0).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
        _logits_close(tm, flax_model, params, x)

    @pytest.mark.parametrize("cvst", [False, True])
    def test_vit_strict_load_and_logits(self, cvst):
        from revisiting_at_tpu.ckpt.torch_export import export_torch_state_dict

        flax_model, params = _init_params("vit_micro", not_original=cvst)
        sd = export_torch_state_dict(params, "vit_micro")
        tm = TViT(cvst=cvst)
        missing = tm.load_state_dict(
            {k: torch.from_numpy(np.asarray(v, np.float32).copy())
             for k, v in sd.items()},
            strict=True,
        )
        assert not missing.missing_keys and not missing.unexpected_keys
        x = np.random.RandomState(1).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
        _logits_close(tm, flax_model, params, x)


class TestExportCLI:
    def test_bn_family_rejected(self):
        from revisiting_at_tpu.ckpt.torch_export import export_torch_state_dict

        with pytest.raises(ValueError, match="import-only"):
            export_torch_state_dict({}, "resnet50")

    def test_use_ema_without_ema_errors(self, tmp_path):
        # a run trained with model_ema=0 must NOT silently export raw
        # weights when --use_ema is requested
        from revisiting_at_tpu.cli.export import main as export_main
        from revisiting_at_tpu.cli.train import main as train_main

        folder = tmp_path / "runs"
        train_main([
            "--model.arch", "convnext_micro", "--model.not_original", "1",
            "--model.add_normalization", "0", "--model.model_ema", "0",
            "--adv.attack", "none",
            "--data.dataset", "synthetic", "--data.num_classes", "7",
            "--training.batch_size", "8", "--training.epochs", "1",
            "--training.precision", "fp32",
            "--resolution.min_res", "32", "--resolution.max_res", "32",
            "--validation.batch_size", "8", "--validation.resolution", "32",
            "--logging.folder", str(folder),
        ])
        run_dir = next(folder.glob("model_*"))
        with pytest.raises(ValueError, match="EMA"):
            export_main(["--run_dir", str(run_dir),
                         "--out", str(tmp_path / "w.pt"), "--use_ema", "1"])

    def test_export_cli_roundtrip(self, tmp_path):
        # train one tiny epoch -> export CLI -> import the file back and
        # compare logits to the orbax-restored params
        from revisiting_at_tpu.cli.export import main as export_main
        from revisiting_at_tpu.cli.train import main as train_main

        folder = tmp_path / "runs"
        train_main([
            "--model.arch", "convnext_micro", "--model.not_original", "1",
            "--model.add_normalization", "0", "--model.model_ema", "1",
            "--adv.attack", "none",
            "--data.dataset", "synthetic", "--data.num_classes", "7",
            "--training.batch_size", "8", "--training.epochs", "1",
            "--training.precision", "fp32",
            "--resolution.min_res", "32", "--resolution.max_res", "32",
            "--validation.batch_size", "8", "--validation.resolution", "32",
            "--logging.folder", str(folder),
        ])
        run_dir = next(folder.glob("model_*"))
        out = tmp_path / "weights.pt"
        export_main(["--run_dir", str(run_dir), "--out", str(out)])
        assert out.exists()

        sd = torch.load(str(out), map_location="cpu")
        tm = TConvNeXt(cvst=True)
        # num_classes=7 run: reshape the head of the NCLS=9 mini
        tm.head.fc = torch.nn.Linear(16 * 8, 7)  # DIMS[-1] of the micro = 128
        res = tm.load_state_dict(sd, strict=True)
        assert not res.missing_keys and not res.unexpected_keys
