"""FLOP accounting and MFU (model FLOPs utilization) helpers.

The reference publishes no performance numbers at all (SURVEY.md §6); this
framework treats perf as a first-class contract, so bench.py reports
pings/sec *and* MFU — analytic model FLOPs per forward/train step divided
by measured device time and the chip's peak.

Two FLOP sources, cross-checked in tests/test_flops.py:
  * :func:`unet_forward_flops` — closed-form conv FLOPs of the flagship
    U-Net (reference models/unet.py:169-343 topology: depth levels of two
    3x3 convs, 2x2 transpose-conv upsampling, skip concats, 1x1 head);
  * :func:`compiled_flops` — XLA's own cost analysis of the jitted program
    (exact for what actually runs, including fusion).
"""

from __future__ import annotations

import jax

# Peak dense-matmul throughput per chip, FLOP/s (bf16 unless noted).
# Sources: public TPU spec sheets; keyed by substrings of
# jax.devices()[0].device_kind.
_PEAK_FLOPS = [
    ("v5 lite", 197e12),   # v5e
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v6 lite", 918e12),   # v6e / Trillium
    ("v6e", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
]


def device_peak_flops(device=None) -> float | None:
    """Peak bf16 FLOP/s of the current accelerator, or None when unknown
    (e.g. CPU) — callers then report raw FLOP/s without an MFU ratio."""
    device = device or jax.devices()[0]
    kind = (getattr(device, "device_kind", "") or "").lower()
    for key, peak in _PEAK_FLOPS:
        if key in kind:
            return peak
    return None


def conv2d_flops(h: int, w: int, k: int, cin: int, cout: int) -> int:
    """Multiply-add-counted (x2) FLOPs of a same-padded k x k conv producing
    an (h, w, cout) map."""
    return 2 * h * w * k * k * cin * cout


def unet_forward_flops(height: int, width: int, in_channels: int = 4,
                       n_classes: int = 3, depth: int = 5,
                       start_filts: int = 64) -> int:
    """Per-example forward FLOPs of the reference U-Net topology
    (models/unet.py:263-284: two 3x3 convs per level, maxpool between
    levels, 2x2 stride-2 transpose-conv up, concat skip, 1x1 head).
    Conv FLOPs only — BN/ReLU/pool are bandwidth-bound and <1 %."""
    total = 0
    h, w = height, width
    cin = in_channels
    for i in range(depth):
        cout = start_filts * 2 ** i
        total += conv2d_flops(h, w, 3, cin, cout)
        total += conv2d_flops(h, w, 3, cout, cout)
        cin = cout
        if i < depth - 1:
            h, w = h // 2, w // 2
    for j in range(depth - 1):
        cu = cin                  # channels entering the up block
        cout = cu // 2
        # transpose conv 2x2 stride 2: every input pixel hits 4 outputs
        total += 2 * h * w * 4 * cu * cout
        h, w = 2 * h, 2 * w
        # conv1 on [upsampled ++ skip] = 2*cout channels in
        total += conv2d_flops(h, w, 3, 2 * cout, cout)
        total += conv2d_flops(h, w, 3, cout, cout)
        cin = cout
    total += conv2d_flops(h, w, 1, cin, n_classes)
    return int(total)


def unet_train_step_flops(height: int, width: int, **kw) -> int:
    """Forward + backward FLOPs per example: backward of a conv stack costs
    ~2x the forward (grad wrt activations + grad wrt weights)."""
    return 3 * unet_forward_flops(height, width, **kw)


def compiled_flops(fn, *args, **kwargs) -> float | None:
    """XLA cost-analysis FLOPs of ``jit(fn)(*args)``; None when the backend
    doesn't expose cost analysis."""
    # lower/compile errors in fn itself must surface — swallowing them
    # made a broken benchmark indistinguishable from a backend without
    # cost analysis
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except (KeyError, TypeError, IndexError, NotImplementedError):
        return None  # backend exposes no cost analysis


def mfu(total_flops: float, seconds: float, device=None) -> float | None:
    """total_flops/seconds as a fraction of chip peak (None off-TPU)."""
    peak = device_peak_flops(device)
    if peak is None or seconds <= 0:
        return None
    return total_flops / seconds / peak


def format_rate(flops: float, seconds: float) -> str:
    return f"{flops / max(seconds, 1e-12) / 1e12:.2f} TFLOP/s"
