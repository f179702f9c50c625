"""FLOP accounting: analytic U-Net FLOPs vs XLA's own cost analysis."""

import jax
import jax.numpy as jnp
import numpy as np

from crimac_unet_tpu.utils import flops as F


def test_analytic_matches_xla_cost_analysis():
    """The closed-form conv count must agree with XLA's cost analysis of
    the real forward program (conv ops dominate; tolerance covers BN/ReLU
    and fusion accounting differences)."""
    from crimac_unet_tpu.models.unet import build_unet
    H = W = 64
    cfg = {"compute_dtype": "float32", "depth": 5, "start_filts": 8}
    model = build_unet(cfg)
    x = jnp.zeros((2, H, W, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    measured = F.compiled_flops(
        lambda v, x: model.apply(v, x, train=False), variables, x)
    analytic = 2 * F.unet_forward_flops(H, W, in_channels=4, depth=5,
                                        start_filts=8)
    if measured is None:
        import pytest
        pytest.skip("backend exposes no cost analysis")
    assert abs(measured - analytic) / analytic < 0.15, \
        (measured, analytic)


def test_train_flops_multiple():
    f = F.unet_forward_flops(64, 64, depth=3, start_filts=8)
    assert F.unet_train_step_flops(64, 64, depth=3, start_filts=8) == 3 * f


def test_peak_table_lookup():
    class D:
        device_kind = "TPU v5 lite"
    assert F.device_peak_flops(D()) == 197e12

    class C:
        device_kind = "cpu"
    assert F.device_peak_flops(C()) is None
    assert F.mfu(1e12, 1.0, C()) is None


def test_device_op_table_parses_trace(tmp_path):
    """utils/profiling.device_op_table: aggregates TPU-track complete
    events from a trace.json.gz (the r5 profiling instrument)."""
    import gzip
    import json

    from crimac_unet_tpu.utils.profiling import device_op_table

    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    trace = {"traceEvents": [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 1500,
         "args": {"long_name": "%fusion.1 = f32[8]..."}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 500, "args": {}},
        {"ph": "X", "pid": 3, "name": "conv", "dur": 3000, "args": {}},
        {"ph": "X", "pid": 9, "name": "host-thing", "dur": 99999,
         "args": {}},
    ]}
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(trace, f)
    rows = device_op_table(tmp_path, top=0)
    assert [r["name"] for r in rows] == ["conv", "fusion.1"]
    assert rows[0]["total_ms"] == 3.0
    assert rows[1]["total_ms"] == 2.0 and rows[1]["count"] == 2
    assert rows[1]["long_name"].startswith("%fusion.1")
