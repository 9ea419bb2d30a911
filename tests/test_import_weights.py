"""Pretrained torch->flax weight import: forward parity per backbone.

Strategy (VERDICT r3 #4): torchvision/mmcv aren't installed, so each test
hand-builds a torch module with the CANONICAL state_dict naming of the
checkpoints the reference consumes (mmdet ResNet for torchvision://r50 and
the FCOS3D R101-DCN file; reference models/backbones/dla.py for the DLA-34
file; reference models/backbones/vovnet.py for V2-99; mmdet FPN for the
neck inside full-detector checkpoints), randomly initializes it (including
BN running stats, to catch mean/var swaps), exports ``state_dict()``, runs
the importer, and asserts the flax forward matches the torch forward.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from apollo_vision_net_tpu.utils.torch_import import (
    apply_pretrained,
    import_module_params,
)


def _randomize_bn(m):
    """Non-trivial BN affine + running stats."""
    g = torch.Generator().manual_seed(hash(id(m)) % (2**31))
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.weight.uniform_(0.5, 1.5, generator=g)
                mod.bias.uniform_(-0.5, 0.5, generator=g)
                mod.running_mean.uniform_(-0.5, 0.5, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


# --------------------------------------------------------------------------
# torch mmdet-style ResNet (pytorch style: stride on conv2)
# --------------------------------------------------------------------------


def _t_dcn_forward(x, om, weight, stride):
    """mmcv ModulatedDeformConv2d semantics via grid_sample: 27-channel
    offset conv output om = (dy0, dx0, ..., dy8, dx8, m0..m8), taps
    row-major (ky, kx), padding 1, sampling centers at (i*s, j*s)."""
    B, C, H, W = x.shape
    O = weight.shape[0]
    Ho, Wo = om.shape[2], om.shape[3]
    dy = om[:, 0:18:2]  # (B, 9, Ho, Wo)
    dx = om[:, 1:18:2]
    mask = torch.sigmoid(om[:, 18:])
    ky, kx = np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="ij")
    kgrid = np.stack([kx.reshape(-1), ky.reshape(-1)], -1)  # (9, 2) (x, y)
    py, px = np.meshgrid(np.arange(Ho) * stride, np.arange(Wo) * stride,
                         indexing="ij")
    base = np.stack([px.reshape(-1), py.reshape(-1)], -1)  # (Q, 2) (x, y)
    pos = torch.from_numpy(
        (base[None, :, None, :] + kgrid[None, None]).astype(np.float32))
    off = torch.stack(
        [dx.permute(0, 2, 3, 1).reshape(B, Ho * Wo, 9),
         dy.permute(0, 2, 3, 1).reshape(B, Ho * Wo, 9)], -1)
    pos = pos + off  # (B, Q, 9, 2) pixel coords
    gx = 2.0 * (pos[..., 0] + 0.5) / W - 1.0
    gy = 2.0 * (pos[..., 1] + 0.5) / H - 1.0
    grid = torch.stack([gx, gy], -1)
    sampled = F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)  # (B, C, Q, 9)
    m = mask.permute(0, 2, 3, 1).reshape(B, 1, Ho * Wo, 9)
    sampled = sampled * m
    w = weight.reshape(O, C * 9)
    out = torch.einsum(
        "bcqk,ock->boq", sampled.permute(0, 1, 2, 3), w.reshape(O, C, 9))
    return out.reshape(B, O, Ho, Wo)


class TBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False, dcn=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.dcn = dcn
        if dcn:
            # mmcv ModulatedDeformConv2dPack naming: conv2.weight +
            # conv2.conv_offset.{weight,bias}
            self.conv2 = tnn.Module()
            self.conv2.weight = tnn.Parameter(
                torch.randn(planes, planes, 3, 3) * 0.05)
            self.conv2.conv_offset = tnn.Conv2d(planes, 27, 3, stride,
                                                padding=1)
            with torch.no_grad():
                self.conv2.conv_offset.weight.mul_(0.1)
                self.conv2.conv_offset.bias.uniform_(-0.5, 0.5)
        else:
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, padding=1,
                                    bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.stride = stride
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x
        out = F.relu(self.bn1(self.conv1(x)))
        if self.dcn:
            om = self.conv2.conv_offset(out)
            out = _t_dcn_forward(out, om, self.conv2.weight, self.stride)
        else:
            out = self.conv2(out)
        out = F.relu(self.bn2(out))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(out + idt)


class TResNet(tnn.Module):
    def __init__(self, blocks=(3, 4, 6, 3), dcn_stages=(0, 0, 0, 0)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        planes, cin = 64, 64
        for s, n in enumerate(blocks):
            layers = []
            for b in range(n):
                layers.append(TBottleneck(
                    cin if b == 0 else planes * 4, planes,
                    stride=(1 if s == 0 else 2) if b == 0 else 1,
                    downsample=(b == 0), dcn=bool(dcn_stages[s])))
            setattr(self, f"layer{s + 1}", tnn.Sequential(*layers))
            cin = planes * 4
            planes *= 2

    def forward(self, x, out_indices=(1, 2, 3)):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, padding=1)
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            if s in out_indices:
                outs.append(x)
        return outs


def _flax_vs_torch(feats_t, feats_j, rtol=2e-4, atol=2e-4):
    assert len(feats_t) == len(feats_j)
    for ft, fj in zip(feats_t, feats_j):
        want = ft.detach().numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC
        np.testing.assert_allclose(np.asarray(fj), want, rtol=rtol,
                                   atol=atol)


def test_import_resnet50():
    from apollo_vision_net_tpu.models.resnet import ResNet

    tm = TResNet()
    _randomize_bn(tm)
    tm.eval()
    x = np.random.default_rng(0).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))

    fm = ResNet(depth=50, out_indices=(1, 2, 3))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = fm.init(jax.random.PRNGKey(0), xj)["params"]
    new, unused = import_module_params(params, _sd(tm), "resnet")
    assert unused == [], unused
    got = fm.apply({"params": new}, xj)
    _flax_vs_torch(want, got)


def test_import_resnet_dcn():
    """R50 with DCN stages 3-4 (the R101-DCN base-config tier, smaller
    depth for CPU time): exercises conv2_dcn_weight tap order and the
    conv_offset (dy,dx)->(dx,dy) channel permutation."""
    from apollo_vision_net_tpu.models.resnet import ResNet

    tm = TResNet(blocks=(1, 1, 1, 1), dcn_stages=(0, 0, 1, 1))
    _randomize_bn(tm)
    tm.eval()
    x = np.random.default_rng(1).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))

    # flax ResNet with matching block counts: patch the stage table
    import apollo_vision_net_tpu.models.resnet as rn
    old = rn._STAGE_BLOCKS[50]
    rn._STAGE_BLOCKS[50] = (1, 1, 1, 1)
    try:
        fm = ResNet(depth=50, out_indices=(1, 2, 3),
                    dcn_stages=(False, False, True, True))
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        params = fm.init(jax.random.PRNGKey(0), xj)["params"]
        new, unused = import_module_params(params, _sd(tm), "resnet")
        assert unused == [], unused
        got = fm.apply({"params": new}, xj)
    finally:
        rn._STAGE_BLOCKS[50] = old
    _flax_vs_torch(want, got, rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------------------
# torch DLA (reference models/backbones/dla.py naming: Conv2d with attached
# .norm submodule)
# --------------------------------------------------------------------------


class TConvNorm(tnn.Conv2d):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__(cin, cout, k, stride, padding, bias=False)
        self.norm = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return self.norm(super().forward(x))


class TDlaBasic(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = TConvNorm(cin, cout, 3, stride, 1)
        self.conv2 = TConvNorm(cout, cout, 3, 1, 1)

    def forward(self, x, residual=None):
        if residual is None:
            residual = x
        out = F.relu(self.conv1(x))
        out = self.conv2(out)
        return F.relu(out + residual)


class TDlaRoot(tnn.Module):
    def __init__(self, cin, cout, residual=False):
        super().__init__()
        self.conv = TConvNorm(cin, cout, 1)
        self.residual = residual

    def forward(self, *x):
        out = self.conv(torch.cat(x, 1))
        if self.residual:
            out = out + x[0]
        return F.relu(out)


class TDlaTree(tnn.Module):
    def __init__(self, levels, cin, cout, stride=1, level_root=False,
                 root_dim=0, root_residual=False):
        super().__init__()
        if root_dim == 0:
            root_dim = 2 * cout
        if level_root:
            root_dim += cin
        if levels == 1:
            self.tree1 = TDlaBasic(cin, cout, stride)
            self.tree2 = TDlaBasic(cout, cout, 1)
            self.root = TDlaRoot(root_dim, cout, root_residual)
        else:
            self.tree1 = TDlaTree(levels - 1, cin, cout, stride,
                                  root_dim=0, root_residual=root_residual)
            self.tree2 = TDlaTree(levels - 1, cout, cout,
                                  root_dim=root_dim + cout,
                                  root_residual=root_residual)
        self.level_root = level_root
        self.levels = levels
        self.downsample = tnn.MaxPool2d(stride, stride) if stride > 1 \
            else None
        self.project = None
        if cin != cout and levels == 1:
            self.project = TConvNorm(cin, cout, 1)

    def forward(self, x, residual=None, children=None):
        children = [] if children is None else children
        bottom = self.downsample(x) if self.downsample else x
        residual = self.project(bottom) if self.project is not None \
            else bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual)
        if self.levels == 1:
            x2 = self.tree2(x1)
            return self.root(x2, x1, *children)
        children.append(x1)
        return self.tree2(x1, children=children)


class TDla34(tnn.Module):
    LEVELS = (1, 1, 1, 2, 2, 1)
    CH = (16, 32, 64, 128, 256, 512)

    def __init__(self):
        super().__init__()
        ch = self.CH
        self.base_layer = TConvNorm(3, ch[0], 7, 1, 3)
        self.level0 = tnn.Sequential(TConvNorm(ch[0], ch[0], 3, 1, 1))
        self.level1 = tnn.Sequential(TConvNorm(ch[0], ch[1], 3, 2, 1))
        self.level2 = TDlaTree(1, ch[1], ch[2], 2)
        self.level3 = TDlaTree(2, ch[2], ch[3], 2, level_root=True)
        self.level4 = TDlaTree(2, ch[3], ch[4], 2, level_root=True)
        self.level5 = TDlaTree(1, ch[4], ch[5], 2, level_root=True)

    def forward(self, x, out_indices=(3, 4, 5)):
        x = F.relu(self.base_layer(x))
        x = F.relu(self.level0[0](x))
        x0 = x
        x = F.relu(self.level1[0](x))
        outs = {0: x0, 1: x}
        for i in range(2, 6):
            x = getattr(self, f"level{i}")(x)
            outs[i] = x
        return [outs[i] for i in out_indices]


def test_import_dla34():
    from apollo_vision_net_tpu.models.dla import DLA

    tm = TDla34()
    _randomize_bn(tm)
    tm.eval()
    x = np.random.default_rng(2).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))

    fm = DLA(out_indices=(3, 4, 5))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = fm.init(jax.random.PRNGKey(0), xj)["params"]
    new, unused = import_module_params(params, _sd(tm), "dla")
    assert unused == [], unused
    got = fm.apply({"params": new}, xj)
    _flax_vs_torch(want, got)


# --------------------------------------------------------------------------
# torch VoVNet (reference naming with '/'-joined OrderedDict keys)
# --------------------------------------------------------------------------


def _t_cnr(cin, cout, k, stride, mod, postfix):
    from collections import OrderedDict

    return [
        (f"{mod}_{postfix}/conv",
         tnn.Conv2d(cin, cout, k, stride, padding=k // 2, bias=False)),
        (f"{mod}_{postfix}/norm", tnn.BatchNorm2d(cout)),
        (f"{mod}_{postfix}/relu", tnn.ReLU(inplace=True)),
    ]


class TOSA(tnn.Module):
    def __init__(self, cin, stage_ch, concat_ch, layers, mod,
                 identity=False):
        super().__init__()
        from collections import OrderedDict

        self.identity = identity
        self.layers = tnn.ModuleList()
        c = cin
        for i in range(layers):
            self.layers.append(
                tnn.Sequential(OrderedDict(_t_cnr(c, stage_ch, 3, 1, mod, i))))
            c = stage_ch
        self.concat = tnn.Sequential(OrderedDict(
            _t_cnr(cin + layers * stage_ch, concat_ch, 1, 1, mod, "concat")))
        self.ese = tnn.Module()
        self.ese.fc = tnn.Conv2d(concat_ch, concat_ch, 1)

    def forward(self, x):
        idt = x
        feats = [x]
        for layer in self.layers:
            x = layer(x)
            feats.append(x)
        xt = self.concat(torch.cat(feats, 1))
        gate = xt.mean((2, 3), keepdim=True)
        gate = F.relu6(self.ese.fc(gate) + 3.0) / 6.0
        xt = xt * gate
        if self.identity:
            xt = xt + idt
        return xt


class TVoVNet39(tnn.Module):
    def __init__(self):
        super().__init__()
        from collections import OrderedDict

        stem = (_t_cnr(3, 64, 3, 2, "stem", "1")
                + _t_cnr(64, 64, 3, 1, "stem", "2")
                + _t_cnr(64, 128, 3, 2, "stem", "3"))
        self.stem = tnn.Sequential(OrderedDict(stem))
        conv_ch = (128, 160, 192, 224)
        out_ch = (256, 512, 768, 1024)
        blocks = (1, 1, 2, 2)
        cin = 128
        for s in range(4):
            mods = []
            for b in range(blocks[s]):
                mod = f"OSA{s + 2}_{b + 1}"
                mods.append((mod, TOSA(cin, conv_ch[s], out_ch[s], 5, mod,
                                       identity=(b > 0))))
                cin = out_ch[s]
            stage = tnn.Module()
            for name, m in mods:
                stage.add_module(name, m)
            stage._mods = [m for _, m in mods]
            setattr(self, f"stage{s + 2}", stage)

    def forward(self, x, out_indices=(1, 2, 3)):
        x = self.stem(x)
        outs = []
        for s in range(4):
            if s > 0:
                x = F.max_pool2d(x, 3, 2, ceil_mode=True)
            for m in getattr(self, f"stage{s + 2}")._mods:
                x = m(x)
            if s in out_indices:
                outs.append(x)
        return outs


def test_import_vovnet():
    from apollo_vision_net_tpu.models.vovnet import VoVNet

    tm = TVoVNet39()
    _randomize_bn(tm)
    tm.eval()
    x = np.random.default_rng(3).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))

    fm = VoVNet(arch="V-39-eSE", out_indices=(1, 2, 3))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = fm.init(jax.random.PRNGKey(0), xj)["params"]
    new, unused = import_module_params(params, _sd(tm), "vovnet")
    assert unused == [], unused
    got = fm.apply({"params": new}, xj)
    _flax_vs_torch(want, got, rtol=5e-4, atol=5e-4)


# --------------------------------------------------------------------------
# mmdet FPN + full-checkpoint routing (img_backbone./img_neck. prefixes)
# --------------------------------------------------------------------------


class TFPN(tnn.Module):
    def __init__(self, in_channels, out_channels=64, num_outs=4):
        super().__init__()
        self.lateral_convs = tnn.ModuleList()
        self.fpn_convs = tnn.ModuleList()
        for c in in_channels:
            lat = tnn.Module()
            lat.conv = tnn.Conv2d(c, out_channels, 1)
            self.lateral_convs.append(lat)
            fc = tnn.Module()
            fc.conv = tnn.Conv2d(out_channels, out_channels, 3, padding=1)
            self.fpn_convs.append(fc)
        for _ in range(num_outs - len(in_channels)):
            fc = tnn.Module()
            fc.conv = tnn.Conv2d(out_channels, out_channels, 3, 2, padding=1)
            self.fpn_convs.append(fc)
        self.num_outs = num_outs
        self.n_lat = len(in_channels)

    def forward(self, feats):
        lats = [m.conv(f) for m, f in zip(self.lateral_convs, feats)]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[-2:], mode="nearest")
        outs = [self.fpn_convs[i].conv(l) for i, l in enumerate(lats)]
        for i in range(self.n_lat, self.num_outs):
            src = outs[-1]
            if i > self.n_lat:  # relu_before_extra_convs, first on raw
                src = F.relu(src)
            outs.append(self.fpn_convs[i].conv(src))
        return outs


def test_import_fpn_and_full_checkpoint_routing():
    from apollo_vision_net_tpu.models.fpn import FPN

    tm = TFPN([32, 48], out_channels=64, num_outs=4)
    tm.eval()
    rng = np.random.default_rng(4)
    f0 = rng.standard_normal((1, 32, 16, 16)).astype(np.float32)
    f1 = rng.standard_normal((1, 48, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tm([torch.from_numpy(f0), torch.from_numpy(f1)])

    fm = FPN(out_channels=64, num_outs=4)
    fj = [jnp.asarray(f0.transpose(0, 2, 3, 1)),
          jnp.asarray(f1.transpose(0, 2, 3, 1))]
    params = fm.init(jax.random.PRNGKey(0), fj)["params"]
    new, unused = import_module_params(params, _sd(tm), "fpn")
    assert unused == [], unused
    got = fm.apply({"params": new}, fj)
    _flax_vs_torch(want, got)

    # full-checkpoint routing: img_backbone./img_neck. prefixes land on the
    # right subtrees via apply_pretrained
    from apollo_vision_net_tpu.models.resnet import ResNet

    tr = TResNet(blocks=(1, 1, 1, 1))
    _randomize_bn(tr)
    tr.eval()
    import apollo_vision_net_tpu.models.resnet as rn
    old = rn._STAGE_BLOCKS[50]
    rn._STAGE_BLOCKS[50] = (1, 1, 1, 1)
    try:
        bb = ResNet(depth=50, out_indices=(1, 2, 3))
        x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        bb_params = bb.init(jax.random.PRNGKey(1), xj)["params"]
        full_sd = {f"img_backbone.{k}": v for k, v in _sd(tr).items()}
        full_sd.update({f"img_neck.{k}": v for k, v in _sd(tm).items()})
        full_sd["pts_bbox_head.query.weight"] = np.zeros((4, 4), np.float32)
        neck_params = fm.init(jax.random.PRNGKey(2), fj)["params"]
        merged = apply_pretrained(
            {"img_backbone": bb_params, "img_neck": neck_params},
            full_sd, "resnet", log=None)
        with torch.no_grad():
            want_bb = tr(torch.from_numpy(x))
        got_bb = bb.apply({"params": merged["img_backbone"]}, xj)
        _flax_vs_torch(want_bb, got_bb)
        got_neck = fm.apply({"params": merged["img_neck"]}, fj)
        _flax_vs_torch(want, got_neck)
    finally:
        rn._STAGE_BLOCKS[50] = old
