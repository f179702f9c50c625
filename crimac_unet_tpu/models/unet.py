"""Flax U-Net for echogram segmentation (NHWC, TPU layout).

Architecturally equivalent to the reference PyTorch model
(crimac_unet/models/unet.py:169-391): encoder of ``depth`` conv-BN-ReLU x2
blocks with 2x2 maxpool between levels, decoder of transpose-conv 2x2
upsampling + skip concat + conv-BN-ReLU x2, and a 1x1 logits head with NO
softmax (callers apply CE loss / softmax).  ``start_filts`` channels double
per level (4->64->...->1024 at depth 5, ~31M params).

TPU-first choices: NHWC layout (XLA's preferred conv layout on TPU),
configurable ``dtype`` so convs run in bfloat16 on the MXU with float32
params/batch-stats, and functional BatchNorm state via the flax
``batch_stats`` collection.  BatchNorm matches torch semantics
(eps=1e-5, running-stat momentum 0.1 == flax momentum 0.9); torch tracks
unbiased running variance while flax tracks biased — an O(1/n) training-
dynamics difference only, irrelevant for imported weights.

Weight import from reference ``.pt`` checkpoints lives in
``crimac_unet_tpu.models.torch_import``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in));
# using the same keeps training dynamics comparable to the reference, which
# never applies its (unused) weight_init helper (reference unet.py:291-301).
conv_kernel_init = nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform")


def _bias_init_like_torch(key, shape, dtype, fan_in):
    bound = 1.0 / (fan_in ** 0.5)
    import jax
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _convT_kernel_init_like_torch(key, shape, dtype=jnp.float32):
    """torch ConvTranspose2d kaiming_uniform(a=sqrt(5)): torch's fan-in
    convention for TRANSPOSE convs is ``weight.size(1) * kh * kw`` =
    out_channels * k^2 (a documented torch quirk), not in_channels * k^2
    — flax's variance_scaling(fan_in) on the (kh, kw, in, out) kernel
    computes the latter and lands sqrt(2) small (review finding r3;
    verified against torch empirically)."""
    import jax
    kh, kw, _, out_ch = shape
    bound = 1.0 / ((out_ch * kh * kw) ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class ConvBNRelu(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True  # False: BN folded into the conv (inference)
    apply_relu: bool = True  # False: caller fuses the ReLU downstream
                             # (pallas relu_pool_skip); params unchanged

    @nn.compact
    def __call__(self, x, train: bool):
        fan_in = x.shape[-1] * 9
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=True,
                    dtype=self.dtype, kernel_init=conv_kernel_init,
                    bias_init=lambda k, s, d=jnp.float32:
                        _bias_init_like_torch(k, s, d, fan_in),
                    name="conv")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.apply_relu else x


class DownConv(nn.Module):
    """Two conv-BN-ReLU units (+ optional 2x2 maxpool)
    (reference unet.py:63-93).

    ``pallas_pool=True`` routes the level-0 (C=64) eval-mode pool
    through the hand-written Pallas kernel (ops/pallas_pool.py) — bit-
    equal to the XLA lowering, ~4x faster on v5e where reduce_window
    runs at 16 % of its HBM bound.  Training keeps the XLA lowering
    (reduce_window has a native VJP; the kernel does not)."""
    features: int
    pooling: bool
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True
    pallas_pool: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        from ..ops import pallas_pool as PP
        x = ConvBNRelu(self.features, self.dtype, self.use_bn,
                       name="unit1")(x, train)
        out_shape = x.shape[:-1] + (self.features,)
        # fused conv->relu+skip+pool kernel: eval-mode, BN folded (the
        # unit2 output feeding the kernel must be the raw conv+bias),
        # supported geometry only
        fused = (self.pallas_pool and self.pooling and not train
                 and not self.use_bn and self.features == 64
                 and PP.supported(out_shape, self.dtype))
        x = ConvBNRelu(self.features, self.dtype, self.use_bn,
                       apply_relu=not fused, name="unit2")(x, train)
        if fused:
            return PP.relu_pool_skip(x)
        before_pool = x
        if self.pooling:
            # same C==64 restriction as the fused branch: deeper pools
            # (C>=128) run at their HBM bound under XLA already
            if (self.pallas_pool and not train and self.features == 64
                    and PP.supported(x.shape, x.dtype)):
                x = PP.maxpool2x2(x)
            else:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x, before_pool


class Transpose2x2(nn.Module):
    """2x2 stride-2 transpose conv evaluated as one pointwise contraction
    + depth-to-space.

    For kernel 2x2 / stride 2 / VALID the output blocks never overlap, so
    ``y[n, 2i+p, 2j+q, f] = sum_c x[n,i,j,c] * K[1-p,1-q,c,f] + b[f]`` —
    one (N*H*W, C) x (C, 4F) matmul the MXU tiles directly, instead of the
    fractionally-strided conv XLA builds for ``conv_transpose``.  Bit-exact
    vs ``nn.ConvTranspose`` in float32 (tests/test_model.py), with the SAME
    parameter pytree (kernel (2,2,C,F), bias (F,)) so checkpoints and torch
    imports are interchangeable.  Measured on v5e this formulation is
    slightly SLOWER than XLA's conv_transpose lowering (57.5 ms vs 53.2 ms
    fused predict chunk; the depth-to-space relayout costs more than the
    matmul saves), so ``dts_upsample`` defaults to False and this stays an
    A/B-able option."""
    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: object = conv_kernel_init
    bias_init: object = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (2, 2, C, self.features), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        n, h, w, _ = x.shape
        y = jnp.einsum("nhwc,pqcf->nhpwqf", x, kernel[::-1, ::-1],
                       preferred_element_type=jnp.float32)
        y = y.astype(x.dtype).reshape(n, 2 * h, 2 * w, self.features)
        return y + bias


class UpConv(nn.Module):
    """Transpose-conv 2x2 upsample, skip concat, two conv-BN-ReLU units
    (reference unet.py:96-137)."""
    features: int
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True
    dts_upsample: bool = False

    @nn.compact
    def __call__(self, from_down, from_up, train: bool):
        # torch fan-in convention for transpose convs: out_channels * k^2
        fan_in = self.features * 4
        bias_init = lambda k, s, d=jnp.float32: \
            _bias_init_like_torch(k, s, d, fan_in)  # noqa: E731
        if self.dts_upsample:
            up = Transpose2x2(self.features, dtype=self.dtype,
                              kernel_init=_convT_kernel_init_like_torch,
                              bias_init=bias_init, name="upconv")(from_up)
        else:
            up = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                  padding="VALID", use_bias=True,
                                  dtype=self.dtype,
                                  kernel_init=_convT_kernel_init_like_torch,
                                  bias_init=bias_init,
                                  name="upconv")(from_up)
        x = jnp.concatenate([up, from_down], axis=-1)
        x = ConvBNRelu(self.features, self.dtype, self.use_bn,
                       name="unit1")(x, train)
        x = ConvBNRelu(self.features, self.dtype, self.use_bn,
                       name="unit2")(x, train)
        return x


class MetaPostProcessing(nn.Module):
    """Per-pixel MLP 32-32-1 over metadata channels
    (reference unet.py:140-166).  NHWC makes the permutes a no-op."""
    out_features: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch Linear default init (kaiming_uniform(a=sqrt(5)) kernel +
        # U(+-1/sqrt(fan_in)) bias) — the same policy the convs follow;
        # flax's Dense defaults (lecun_normal, zero bias) would start the
        # meta path differently from the reference
        import functools

        def dense(feat, name, fan_in):
            return nn.Dense(
                feat, dtype=self.dtype, name=name,
                kernel_init=conv_kernel_init,
                bias_init=functools.partial(_bias_init_like_torch,
                                            fan_in=fan_in))

        x = dense(32, "fc1", x.shape[-1])(x)
        x = nn.relu(x)
        x = dense(32, "fc2", 32)(x)
        x = nn.relu(x)
        return dense(self.out_features, "fc3", 32)(x)


class UNet(nn.Module):
    """U-Net encoder/decoder; inputs NHWC, returns NHWC logits.

    ``late_meta_inject=True`` adds the reference's late metadata path
    (unet.py:346-391): a per-pixel MLP over the metadata channels whose
    single output channel is concatenated before the final 1x1 conv.
    """
    n_classes: int = 3
    depth: int = 5
    start_filts: int = 64
    late_meta_inject: bool = False
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True  # False: run with BN folded into the convs
                         # (inference; see models/fold_bn.py)
    dts_upsample: bool = False  # matmul+depth-to-space upsampling (exact
                                # but measured slower on v5e; A/B option)
    pallas_pool: bool = False  # level-0 eval pool via ops/pallas_pool.py
                               # (bit-equal; ~4x the XLA lowering on v5e)

    @nn.compact
    def __call__(self, x, meta=None, train: bool = False):
        if train and not self.use_bn:
            # must survive python -O: silently training a BN-folded
            # model would corrupt the folded statistics
            raise ValueError("BN-folded models are eval-only")
        encoder_outs = []
        for i in range(self.depth):
            feats = self.start_filts * (2 ** i)
            pooling = i < self.depth - 1
            x, before_pool = DownConv(feats, pooling, self.dtype,
                                      self.use_bn,
                                      pallas_pool=self.pallas_pool,
                                      name=f"down{i}")(x, train)
            encoder_outs.append(before_pool)

        feats = self.start_filts * (2 ** (self.depth - 1))
        for i in range(self.depth - 1):
            feats //= 2
            skip = encoder_outs[-(i + 2)]
            x = UpConv(feats, self.dtype, self.use_bn, self.dts_upsample,
                       name=f"up{i}")(skip, x, train)

        if self.late_meta_inject:
            if meta is None:
                raise ValueError("late_meta_inject requires meta input")
            meta_out = MetaPostProcessing(1, self.dtype, name="meta_mlp")(meta)
            x = jnp.concatenate([x, meta_out], axis=-1)

        fan_in = x.shape[-1]
        logits = nn.Conv(self.n_classes, (1, 1), use_bias=True,
                         dtype=self.dtype, kernel_init=conv_kernel_init,
                         bias_init=lambda k, s, d=jnp.float32:
                             _bias_init_like_torch(k, s, d, fan_in),
                         name="conv_final")(x)
        return logits.astype(jnp.float32)


def build_unet(config: dict) -> UNet:
    """Construct the flagship model from a merged config dict
    (reference SegPipeUNet, pipeline.py:379-410)."""
    dtype = jnp.dtype(config.get("compute_dtype", "float32"))
    from ..ops.pallas_pool import resolve_flag
    return UNet(n_classes=3,
                depth=int(config.get("depth", 5)),
                start_filts=int(config.get("start_filts", 64)),
                late_meta_inject=bool(config.get("late_meta_inject", False)),
                dtype=dtype,
                dts_upsample=bool(config.get("dts_upsample", False)),
                pallas_pool=resolve_flag(config.get("pallas_pool", "auto"),
                                         dtype))


def count_params(params) -> int:
    import jax
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
