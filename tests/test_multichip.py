"""Multi-device mesh: sharded inference parity + graft-entry dry run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crimac_unet_tpu.data.fixtures import make_zarr_survey
from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
from crimac_unet_tpu.models.unet import UNet
from crimac_unet_tpu.pipeline.inference import GriddedRunner, predict_reader


def test_sharded_inference_matches_single_device(tmp_path):
    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=160,
                          seed=33)
    reader = DataReaderZarr(sv)
    model = UNet(n_classes=3, depth=2, start_filts=4)
    x = jnp.zeros((1, 32, 32, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    base = {"patch_size": [32, 32], "patch_overlap": 4,
            "frequencies": [18, 38, 120, 200], "fwd_batch": 8}

    r1 = GriddedRunner(model, variables, dict(base, mesh_devices=1))
    r8 = GriddedRunner(model, variables, dict(base, mesh_devices=8))
    assert r8.mesh is not None and len(r8.mesh.devices.ravel()) == 8

    out1 = {s: o for s, e, o, _ in predict_reader(r1, reader, 80)}
    out8 = {s: o for s, e, o, _ in predict_reader(r8, reader, 80)}
    for s in out1:
        np.testing.assert_allclose(
            out1[s].astype(np.float32), out8[s].astype(np.float32),
            atol=2e-3)  # f16 ulp wobble from different conv partitioning
        np.testing.assert_array_equal(out1[s] != 0, out8[s] != 0)


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_forward_compiles():
    import __graft_entry__ as g
    fn, (variables, x) = g.entry()
    lowered = jax.jit(fn).lower(variables, x)
    assert lowered.compile() is not None


def test_sharded_gather_no_redistribute(tmp_path):
    """The compiled 8-device predict program must gather patches locally:
    no all-to-all / collective-permute anywhere (the round-1 design
    resharded the flat gather output before every forward batch), and the
    patch gather's output shape must be the per-device shard."""
    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=160,
                          seed=34)
    reader = DataReaderZarr(sv)
    model = UNet(n_classes=3, depth=2, start_filts=4)
    x = jnp.zeros((1, 32, 32, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    r8 = GriddedRunner(model, variables,
                       {"patch_size": [32, 32], "patch_overlap": 4,
                        "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
                        "mesh_devices": 8})

    # stage one chunk's inputs by intercepting the device call
    staged = {}
    real = r8._predict_patches

    def capture(variables, *args, **kw):
        staged["args"] = args
        staged["kw"] = kw
        return real(variables, *args, **kw)

    r8._predict_patches = capture
    next(iter(predict_reader(r8, reader, 80)))
    r8._predict_patches = real

    lowered = jax.jit(
        real.__wrapped__, static_argnames=("self", "R", "C",
                                           "border_zero", "use_meta")
    ).lower(r8, r8.variables, *staged["args"], **staged["kw"])
    hlo = lowered.compile().as_text()
    assert "all-to-all" not in hlo
    assert "collective-permute" not in hlo
    # per-device gather shard: fwd_batch 8 over 8 devices -> each device
    # slices 1 patch per sub-batch (f32[1,1,32,32,4] gather results); the
    # unsharded (nb, B, ...) gather would read f32[nb,8,32,32,4]
    flat = hlo.replace(" ", "")
    assert "f32[1,1,32,32,4]" in flat, "patch gather does not run sharded"
    n = staged["args"][1].shape[0]        # y0s is padded to nb * B inside
    nb = -(-n // 8)
    assert f"f32[{nb},8,32,32,4]" not in flat


class _CaptureLogger:
    """Minimal TB-logger stand-in recording (tag, value, step)."""

    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, global_step=None):
        self.scalars.append((tag, float(value), global_step))

    def series(self, tag):
        return [v for t, v, _ in self.scalars if t == tag]


def _train_cfg(path, ckpt_suffix, mesh_devices):
    return {"frequencies": [18, 38, 120, 200], "data_mode": "memm",
            "path_to_echograms": str(path), "patch_size": [32, 32],
            "loss_type": "CE", "batch_size": 8, "lr": 0.005,
            "lr_reduction": 0.5, "momentum": 0.95, "iterations": 4,
            "test_iter": 1, "log_step": 4, "lr_step": 4, "num_workers": 1,
            "partition_train": "selected surveys", "train_surveys": [2017],
            "validation_surveys": [2016], "partition_predict": "all surveys",
            "evaluation_surveys": [], "save_prediction_surveys": [],
            "eval_mode": "all", "patch_overlap": 4, "random_seed": 10,
            "depth": 2, "start_filts": 4, "mesh_devices": mesh_devices,
            # f32: this test pins 1-vs-8-device trajectory parity, which
            # the (default) bf16 conv compute blurs past the tolerances
            # via sharded-reduction rounding
            "train_dtype": "float32"}


def test_multidevice_training_loss_parity(tmp_path):
    """run_training over the 8-device CPU mesh end-to-end (prefetch
    sharding + pooled gather + validation + checkpoint on sharded state)
    must reproduce the single-device loss trajectory and final parameters
    (same seeds; tolerance covers sharded-reduction reordering)."""
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.pipeline.train import run_training

    make_survey_dir(tmp_path / "memm", year=2017, n_echograms=2, H=80,
                    W=200, seed=21)
    make_survey_dir(tmp_path / "memm", year=2016, n_echograms=1, H=80,
                    W=200, seed=22)

    logs, pipes = {}, {}
    for n in (1, 8):
        cfg = _train_cfg(tmp_path / "memm", n, mesh_devices=n)
        log = _CaptureLogger()
        pipes[n] = run_training(cfg, tmp_path / f"ckpt{n}", logger=log,
                                progress=False)
        logs[n] = log
        assert (tmp_path / f"ckpt{n}" / "last.msgpack").exists()
        assert (tmp_path / f"ckpt{n}" / "best.msgpack").exists()
        assert pipes[n].pool is not None  # pooled path engaged

    l1, l8 = logs[1].series("train/loss"), logs[8].series("train/loss")
    assert len(l1) == len(l8) == 4
    np.testing.assert_allclose(l1, l8, rtol=1e-3, atol=1e-4)
    f1 = logs[1].series("test/F1_score")
    f8 = logs[8].series("test/F1_score")
    np.testing.assert_allclose(f1, f8, rtol=1e-3, atol=1e-3)

    p1 = jax.tree_util.tree_leaves(pipes[1].state.params)
    p8 = jax.tree_util.tree_leaves(pipes[8].state.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_multidevice_pooled_meta_training_loss_parity(tmp_path):
    """Pooled METADATA training over the 8-device mesh (meta vectors
    replicated alongside the pool canvases, meta maps computed on each
    device's shard of the batch) must reproduce the single-device loss
    trajectory and final parameters."""
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.pipeline.train import run_training

    make_survey_dir(tmp_path / "memm", year=2017, n_echograms=2, H=80,
                    W=200, seed=25)
    make_survey_dir(tmp_path / "memm", year=2016, n_echograms=1, H=80,
                    W=200, seed=26)
    meta = {"portion_year": True, "portion_day": True, "depth_rel": True,
            "depth_abs_surface": True, "depth_abs_seabed": True,
            "time_diff": True}
    logs, pipes = {}, {}
    for n in (1, 8):
        cfg = dict(_train_cfg(tmp_path / "memm", n, mesh_devices=n),
                   meta_channels=meta, use_device_pool=True)
        log = _CaptureLogger()
        pipes[n] = run_training(cfg, tmp_path / f"mckpt{n}", logger=log,
                                progress=False)
        logs[n] = log
        assert pipes[n].pool is not None
        assert pipes[n].pool.meta_vectors is not None
    l1, l8 = logs[1].series("train/loss"), logs[8].series("train/loss")
    assert len(l1) == len(l8) == 4
    np.testing.assert_allclose(l1, l8, rtol=1e-3, atol=1e-4)
    p1 = jax.tree_util.tree_leaves(pipes[1].state.params)
    p8 = jax.tree_util.tree_leaves(pipes[8].state.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_init_distributed_single_host_noop(monkeypatch):
    """Without coordinator config, init_distributed must not touch the
    runtime (single-host no-op)."""
    from crimac_unet_tpu.parallel.mesh import init_distributed
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("CRIMAC_MULTIHOST", raising=False)
    assert init_distributed() is False
    assert len(jax.devices()) == 8  # still the virtual CPU mesh


def test_sharded_eval_no_redistribute(tmp_path):
    """The compiled 8-device eval scan must gather + evaluate locally:
    no all-to-all / collective-permute in the HLO (the histogram carry
    all-reduces, which is the one intended collective)."""
    from crimac_unet_tpu.ops import metrics as M
    from crimac_unet_tpu.pipeline.inference import evaluate_reader

    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=160,
                          seed=35)
    reader = DataReaderZarr(sv)
    model = UNet(n_classes=3, depth=2, start_filts=4)
    x = jnp.zeros((1, 32, 32, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    r8 = GriddedRunner(model, variables,
                       {"patch_size": [32, 32], "patch_overlap": 4,
                        "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
                        "mesh_devices": 8})

    staged = {}
    real = r8._eval_patches

    def capture(variables, *args, **kw):
        staged["args"] = args
        staged["kw"] = kw
        return real(variables, *args, **kw)

    r8._eval_patches = capture
    evaluate_reader(r8, reader, M.new_histogram(), eval_mode="all")
    r8._eval_patches = real

    lowered = jax.jit(
        real.__wrapped__,
        static_argnames=("self", "use_keep", "border_zero", "zarr_pad",
                         "use_meta", "grid_h")
    ).lower(r8, r8.variables, *staged["args"], **staged["kw"])
    hlo = lowered.compile().as_text()
    assert "all-to-all" not in hlo
    assert "collective-permute" not in hlo


def test_slab_mode_ping_axis_sharding_parity(tmp_path):
    """infer_mode='slab' over the 8-device mesh: the slab forward is
    sequence-parallel (ping axis sharded, GSPMD conv halo exchanges) and
    must match the single-device slab outputs."""
    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    sv = make_zarr_survey(tmp_path, year=2023, n_echograms=1, H=120,
                          W=200, seed=23)
    reader = DataReaderZarr(sv)
    cfg = {"patch_size": [32, 32], "patch_overlap": 4,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
           "depth": 2, "start_filts": 4, "infer_mode": "slab"}
    model = build_unet(cfg)
    v = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 32, 32, 4)),
                   train=False)

    outs = {}
    for n_dev in (1, 8):
        runner = GriddedRunner(model, v, dict(cfg, mesh_devices=n_dev))
        s, e, pred, _ = next(iter(predict_reader(runner, reader, 200)))
        outs[n_dev] = np.asarray(pred, np.float32)
    np.testing.assert_allclose(outs[1], outs[8], atol=2e-5)


@pytest.mark.parametrize("late", [False, True])
def test_slab_mode_meta_channels_sharded_parity(tmp_path, late):
    """Sequence-parallel slab inference WITH metadata channels (early
    concat AND the late-MLP injection, whose separate meta tensor gets
    its own ping-axis sharding constraint): 8-device outputs must match
    single-device."""
    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.data.meta_channels import get_in_channels
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    make_survey_dir(tmp_path, year=2017, n_echograms=1, H=120, W=200,
                    seed=37)
    e = get_echograms(years=[2017], path_to_echograms=str(tmp_path),
                      minimum_shape=32)[0]
    meta = {"portion_year": True, "portion_day": True, "depth_rel": True,
            "depth_abs_surface": False, "depth_abs_seabed": False,
            "time_diff": True}
    cfg = {"patch_size": [32, 32], "patch_overlap": 4,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
           "depth": 2, "start_filts": 4, "infer_mode": "slab",
           "meta_channels": meta, "late_meta_inject": late}
    model = build_unet(cfg)
    M = get_in_channels(meta)
    if late:
        v = model.init(jax.random.PRNGKey(21), jnp.zeros((1, 32, 32, 4)),
                       meta=jnp.zeros((1, 32, 32, M)), train=False)
    else:
        v = model.init(jax.random.PRNGKey(21),
                       jnp.zeros((1, 32, 32, 4 + M)), train=False)
    outs = {}
    for n_dev in (1, 8):
        runner = GriddedRunner(model, v, dict(cfg, mesh_devices=n_dev))
        s, e2, pred, _ = next(iter(predict_reader(runner, e, 200)))
        outs[n_dev] = np.asarray(pred, np.float32)
    np.testing.assert_allclose(outs[1], outs[8], atol=2e-5)


def test_sharded_quantized_transfer_matches_single_device(tmp_path):
    """transfer_dtype='uint8' (serving) over the 8-device mesh: the
    quantized predict path (dB-code slabs, packed sv-finiteness bits) and
    the quantized eval path (packed refine predicate, int8 labels) must
    match their single-device outputs — write masks bit-equal, probs
    within the f16/conv-partitioning wobble, eval histograms bit-equal
    (the label chain is device-count-independent)."""
    from crimac_unet_tpu.ops import metrics as M
    from crimac_unet_tpu.pipeline.inference import evaluate_reader

    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=160,
                          seed=34)
    reader = DataReaderZarr(sv)
    model = UNet(n_classes=3, depth=2, start_filts=4)
    x = jnp.zeros((1, 32, 32, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    base = {"patch_size": [32, 32], "patch_overlap": 4,
            "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
            "transfer_dtype": "uint8"}

    r1 = GriddedRunner(model, variables, dict(base, mesh_devices=1))
    r8 = GriddedRunner(model, variables, dict(base, mesh_devices=8))
    assert r8.mesh is not None

    out1 = {s: o for s, e, o, _ in predict_reader(r1, reader, 80)}
    out8 = {s: o for s, e, o, _ in predict_reader(r8, reader, 80)}
    assert out1.keys() == out8.keys() and out1
    for s in out1:
        np.testing.assert_allclose(
            out1[s].astype(np.float32), out8[s].astype(np.float32),
            atol=2e-3)
        np.testing.assert_array_equal(out1[s] != 0, out8[s] != 0)

    h1 = np.asarray(evaluate_reader(r1, reader, M.new_histogram()))
    h8 = np.asarray(evaluate_reader(r8, reader, M.new_histogram()))
    assert h1.sum() > 0
    # scored pixels and class split are exactly device-count-independent;
    # histogram bins can wobble by f16 ulps from conv partitioning, so
    # compare the invariants exactly and the F1 tightly
    assert h8.sum() == h1.sum()
    assert h8[0].sum() == h1[0].sum()
    f1_1 = M.max_f1(M.pr_curve_from_histogram(h1))[0]
    f1_8 = M.max_f1(M.pr_curve_from_histogram(h8))[0]
    assert abs(f1_8 - f1_1) < 5e-3, (f1_1, f1_8)
