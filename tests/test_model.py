"""U-Net: shape/param-count contract + forward parity with a torch oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crimac_unet_tpu.models.unet import UNet, build_unet, count_params
from crimac_unet_tpu.models.torch_import import torch_state_dict_to_flax


def _expected_param_count(in_ch, n_classes=3, depth=5, start=64):
    """Analytic parameter count of the reference architecture
    (reference unet.py:263-284)."""
    total = 0

    def conv(i, o, k):
        return i * o * k * k + o

    def bn(c):
        return 2 * c

    ins = in_ch
    outs = start
    for i in range(depth):
        outs = start * (2 ** i)
        total += conv(ins, outs, 3) + bn(outs)
        total += conv(outs, outs, 3) + bn(outs)
        ins = outs
    for _ in range(depth - 1):
        o = ins // 2
        total += ins * o * 2 * 2 + o        # transpose conv 2x2
        total += conv(2 * o, o, 3) + bn(o)  # conv1 after concat
        total += conv(o, o, 3) + bn(o)      # conv2
        ins = o
    total += conv(ins, n_classes, 1)
    return total


def test_unet_shapes_and_param_count():
    model = UNet(n_classes=3, depth=5, start_filts=64)
    x = jnp.zeros((2, 256, 256, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 256, 256, 3)
    got = count_params(variables["params"])
    assert got == _expected_param_count(4)  # ~31M, matches reference


def test_unet_small_depth():
    model = UNet(n_classes=3, depth=3, start_filts=8)
    x = jnp.zeros((1, 64, 64, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 64, 3)
    assert count_params(variables["params"]) == _expected_param_count(
        4, depth=3, start=8)


def _torch_oracle_unet(in_channels, n_classes, depth, start):
    """Independent torch construction of the same architecture, used as a
    numerical oracle for weight-import parity."""
    import torch.nn as tnn

    class Down(tnn.Module):
        def __init__(self, i, o, pool):
            super().__init__()
            self.main = tnn.Sequential(
                tnn.Conv2d(i, o, 3, padding=1), tnn.BatchNorm2d(o),
                tnn.ReLU(),
                tnn.Conv2d(o, o, 3, padding=1), tnn.BatchNorm2d(o),
                tnn.ReLU())
            self.pool = tnn.MaxPool2d(2, 2) if pool else None

        def forward(self, x):
            x = self.main(x)
            before = x
            if self.pool is not None:
                x = self.pool(x)
            return x, before

    class Up(tnn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.upconv = tnn.ConvTranspose2d(i, o, 2, stride=2)
            self.conv1 = tnn.Conv2d(2 * o, o, 3, padding=1)
            self.bn1 = tnn.BatchNorm2d(o)
            self.conv2 = tnn.Conv2d(o, o, 3, padding=1)
            self.bn2 = tnn.BatchNorm2d(o)

        def forward(self, skip, x):
            import torch
            import torch.nn.functional as F
            x = self.upconv(x)
            x = torch.cat((x, skip), 1)
            x = F.relu(self.bn1(self.conv1(x)))
            return F.relu(self.bn2(self.conv2(x)))

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            downs, ins = [], in_channels
            for i in range(depth):
                outs = start * 2 ** i
                downs.append(Down(ins, outs, i < depth - 1))
                ins = outs
            self.down_convs = tnn.Sequential(*downs)
            ups = []
            for _ in range(depth - 1):
                ups.append(Up(ins, ins // 2))
                ins //= 2
            self.up_convs = tnn.Sequential(*ups)
            self.conv_final = tnn.Conv2d(ins, n_classes, 1)

        def forward(self, x):
            outs = []
            for m in self.down_convs:
                x, before = m(x)
                outs.append(before)
            for i, m in enumerate(self.up_convs):
                x = m(outs[-(i + 2)], x)
            return self.conv_final(x)

    return Net()


def test_forward_parity_with_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    depth, start, in_ch = 3, 8, 4

    net = _torch_oracle_unet(in_ch, 3, depth, start)
    net.eval()
    # randomize running stats so BN eval parity is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = np.random.RandomState(1).rand(2, in_ch, 48, 48).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()

    variables = torch_state_dict_to_flax(net.state_dict())
    model = UNet(n_classes=3, depth=depth, start_filts=start)
    # pin true-f32 convs: torch runs f32 on CPU, while TPU DEFAULT
    # precision computes f32 convs through bf16 passes (~1e-2 apart on
    # a real v5e under CRIMAC_TEST_TPU=1) — precision, not the import
    with jax.default_matmul_precision("highest"):
        got = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_late_meta_inject_forward():
    model = UNet(n_classes=3, depth=3, start_filts=8, late_meta_inject=True)
    x = jnp.zeros((1, 32, 32, 4), jnp.float32)
    meta = jnp.zeros((1, 32, 32, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, meta=meta, train=False)
    y = model.apply(variables, x, meta=meta, train=False)
    assert y.shape == (1, 32, 32, 3)
    assert "meta_mlp" in variables["params"]


def test_build_unet_from_config():
    model = build_unet({"compute_dtype": "bfloat16", "depth": 5,
                        "start_filts": 64})
    assert model.dtype == jnp.bfloat16
    assert model.depth == 5


def test_dts_upsample_exact_vs_conv_transpose():
    """The matmul+depth-to-space upsampling (Transpose2x2) is bit-exact vs
    lax.conv_transpose in float32, with an identical parameter pytree."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 24, 24, 4).astype(np.float32))
    m_dts = UNet(n_classes=3, depth=3, start_filts=8, dts_upsample=True)
    m_ct = UNet(n_classes=3, depth=3, start_filts=8, dts_upsample=False)
    v = m_dts.init(jax.random.PRNGKey(3), x, train=False)
    # identical param trees: the conv_transpose variant accepts the same
    # variables unchanged
    y_dts = m_dts.apply(v, x, train=False)
    y_ct = m_ct.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_dts), np.asarray(y_ct),
                               atol=1e-5, rtol=1e-5)
    # and gradients flow through both identically-shaped trees
    g = jax.grad(lambda p: m_dts.apply(
        {"params": p, "batch_stats": v["batch_stats"]}, x,
        train=False).sum())(v["params"])
    assert g["up0"]["upconv"]["kernel"].shape == \
        v["params"]["up0"]["upconv"]["kernel"].shape


def test_transpose_conv_init_matches_torch_convention():
    """torch ConvTranspose2d kaiming_uniform fan-in is out_channels*k^2
    (weight.size(1) — a torch quirk), NOT in_channels*k^2; our upconv
    kernel/bias init must use the same bound or from-scratch upsampling
    layers start sqrt(2) small (review finding r3)."""
    torch = pytest.importorskip("torch")

    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.models.unet import UNet

    model = UNet(n_classes=3, depth=3, start_filts=16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)),
                   train=False)
    # up0: from_up 64ch -> features 32; torch fan = 32 * 4 = 128
    k = np.asarray(v["params"]["up0"]["upconv"]["kernel"])  # (2,2,64,32)
    b = np.asarray(v["params"]["up0"]["upconv"]["bias"])
    ref = torch.nn.ConvTranspose2d(64, 32, 2, 2)
    t_fan = torch.nn.init._calculate_fan_in_and_fan_out(ref.weight)[0]
    bound = 1.0 / (t_fan ** 0.5)
    assert abs(t_fan - 32 * 4) < 1e-9  # pin the torch convention itself
    assert np.abs(k).max() <= bound + 1e-7
    assert np.abs(k).max() > 0.9 * bound  # uniform actually fills it
    assert np.abs(b).max() <= bound + 1e-7


def test_fold_bn_accepts_frozen_mapping():
    """fold_batchnorm must fold FrozenDict trees, not silently no-op on
    them (review finding r3)."""
    import flax

    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.models.fold_bn import fold_batchnorm
    from crimac_unet_tpu.models.unet import UNet

    model = UNet(n_classes=3, depth=2, start_filts=4)
    v = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 4)),
                   train=False)
    frozen = flax.core.freeze(v)
    folded = fold_batchnorm(frozen["params"], frozen["batch_stats"])
    plain = fold_batchnorm(v["params"], v["batch_stats"])
    fa = jax.tree_util.tree_leaves(folded)
    fb = jax.tree_util.tree_leaves(plain)
    assert len(fa) == len(fb) > 0
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the fold actually removed the BN leaves
    assert "bn" not in str(jax.tree_util.tree_structure(folded))
