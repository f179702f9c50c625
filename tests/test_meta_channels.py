"""Metadata channels: reference-semantics crop oracle + device slab/gather
parity + meta training/eval smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crimac_unet_tpu.data.dataset import RandomPatchDataset
from crimac_unet_tpu.data.fixtures import make_survey_dir
from crimac_unet_tpu.data.memmap_reader import get_echograms
from crimac_unet_tpu.data.meta_channels import (crop_meta, get_in_channels,
                                                META_CHANNEL_KEYS)
from crimac_unet_tpu.models.unet import UNet
from crimac_unet_tpu.ops.patches import make_grid_starts
from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                _build_meta_inputs)

ALL_META = {k: True for k in META_CHANNEL_KEYS}


@pytest.fixture(scope="module")
def ech(tmp_path_factory):
    path = tmp_path_factory.mktemp("meta")
    make_survey_dir(path, year=2017, n_echograms=1, H=90, W=200, seed=9)
    return get_echograms(years=[2017], path_to_echograms=str(path),
                         minimum_shape=60)[0]


def test_get_in_channels():
    assert get_in_channels(ALL_META) == 7
    assert get_in_channels({}) == 0
    assert get_in_channels({k: k == "portion_day"
                            for k in META_CHANNEL_KEYS}) == 2


def _oracle_meta(ech, center, window):
    """Direct numpy transcription of the reference meta extraction
    (dataset.py:288-351)."""
    wh, ww = window
    meta = []
    meta.append(np.full(window, ech.portion_of_year_scalar))
    idx = min(max(center[1], 0), ech.portion_of_day_vector.size - 1) \
        if center[1] < ech.portion_of_day_vector.size else -1
    idx = 0 if center[1] < 0 else (
        -1 if center[1] >= ech.portion_of_day_vector.size else center[1])
    pd = ech.portion_of_day_vector[idx]
    meta.append(np.full(window, np.sin(2 * np.pi * pd)))
    meta.append(np.full(window, np.cos(2 * np.pi * pd)))
    ci = np.arange(center[1] - ww // 2, center[1] + ww // 2)
    ci[ci < 0] = 0
    ci[ci >= ech.time_vector_diff.size] = -1
    meta.append(ech.time_vector_diff[ci].reshape(1, -1) * np.ones((wh, 1)))
    seabed = ech.get_seabed(0, ech.shape[1])
    rows = np.arange(center[0] - wh // 2, center[0] + wh // 2)
    cols = np.arange(center[1] - ww // 2, center[1] + ww // 2)
    cols[cols < 0] = 0
    cols[cols >= seabed.size] = -1
    meta.append(rows.reshape(-1, 1) / seabed[cols].reshape(1, -1))
    meta.append(rows.reshape(-1, 1) * np.ones((1, ww)) / wh)
    meta.append((seabed[cols].reshape(1, -1) - rows.reshape(-1, 1)) / wh)
    return np.stack(meta)


@pytest.mark.parametrize("center", [[40, 100], [5, 3], [85, 197], [0, 0]])
def test_crop_meta_matches_oracle(ech, center):
    got = crop_meta(ech, center, [32, 32], ALL_META)
    want = _oracle_meta(ech, center, [32, 32])
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)


def test_device_meta_gather_matches_crop_meta(ech):
    """The gridded slab+gather construction must reproduce per-patch
    crop_meta for every grid patch."""
    wh = ww = 32
    o = 4
    sh = sw = wh - 2 * o
    config = {"patch_size": [wh, ww], "patch_overlap": o,
              "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
              "meta_channels": ALL_META}
    model = UNet(n_classes=3, depth=2, start_filts=4)
    x = jnp.zeros((1, wh, ww, 4 + 7), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    runner = GriddedRunner(model, variables, config)

    R, C = 3, 4
    s = 48  # chunk start ping
    Hp, Wp = R * sh + 2 * o, C * sw + 2 * o
    centers_x = s + np.tile(np.arange(C) * sw, R) - o - 1 + ww // 2
    meta_slab, consts = _build_meta_inputs(runner, ech, Hp, Wp, -o, s - o,
                                           centers_x)
    y0s, x0s = make_grid_starts(R, C, sh, sw, o, o, o)
    got = np.asarray(runner._gather_meta(
        jnp.asarray(meta_slab), jnp.asarray(consts),
        jnp.asarray(y0s), jnp.asarray(x0s)))

    centers_y = np.repeat(np.arange(R) * sh, C) - o - 1 + wh // 2
    for n in range(R * C):
        want = crop_meta(ech, [int(centers_y[n]), int(centers_x[n])],
                         [wh, ww], ALL_META)
        np.testing.assert_allclose(got[n], want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"patch {n}")


def test_meta_training_smoke(ech, tmp_path):
    """Train a couple of steps with all meta channels + late injection."""
    from crimac_unet_tpu.data import samplers as S
    from crimac_unet_tpu.pipeline import engine
    from crimac_unet_tpu.models.unet import build_unet

    window = [32, 32]
    battery = [S.Background([ech], window), S.School([ech], window, 27)]
    for late in (False, True):
        config = {"patch_size": window, "frequencies": [18, 38, 120, 200],
                  "meta_channels": ALL_META, "late_meta_inject": late,
                  "lr": 0.005, "lr_step": 2, "lr_reduction": 0.5,
                  "momentum": 0.95, "depth": 2, "start_filts": 4,
                  "compute_dtype": "float32"}
        model = build_unet(config)
        state = engine.init_train_state(model, config, jax.random.PRNGKey(0))
        step = engine.make_train_step(model, config)
        ds = RandomPatchDataset(battery, window, [18, 38, 120, 200],
                                meta_channels=ALL_META, seed=0)
        batch = ds.batch(2)
        assert batch["meta"].shape == (2, 7, 32, 32)
        state, loss = step(state, jnp.asarray(batch["data"]),
                           jnp.asarray(batch["labels"]),
                           jnp.asarray(batch["meta"]),
                           jax.random.PRNGKey(1))
        assert np.isfinite(float(loss)), f"late={late}"

        eval_step = engine.make_eval_step(model, config)
        from crimac_unet_tpu.ops import metrics as M
        hist, loss = eval_step(state.params, state.batch_stats,
                               M.new_histogram(),
                               jnp.asarray(batch["data"]),
                               jnp.asarray(batch["labels"]),
                               jnp.asarray(batch["seabed_row"]),
                               jnp.asarray(batch["meta"]))
        assert np.asarray(hist).sum() > 0


def test_crop_meta_recenters_like_crop_data(ech):
    """When the window spans the whole water column, crop_data recenters
    rows at H//2 — the reference mutates the SHARED center before its
    meta block (dataset.py:260-261), so meta rows must follow (review
    finding: depth meta described different pixels than the data)."""
    e = ech
    H = e.shape[0]
    window = (H + 20, 32)  # taller than the echogram -> recenter fires
    mc = {"portion_year": False, "portion_day": False, "time_diff": False,
          "depth_rel": False, "depth_abs_surface": True,
          "depth_abs_seabed": False}
    off_center = [H - 1, 50]
    got = crop_meta(e, off_center, window, mc)
    want = crop_meta(e, [H // 2, 50], window, mc)
    np.testing.assert_array_equal(got, want)


def test_meta_channels_accept_01_ints():
    """Reference-era YAMLs use 0/1 — they worked upstream and must
    validate here (review finding)."""
    from crimac_unet_tpu.data.meta_channels import validate_meta_channels
    validate_meta_channels({"portion_year": 1, "portion_day": 0,
                            "time_diff": 0, "depth_rel": 0,
                            "depth_abs_surface": 0, "depth_abs_seabed": 0})
    with pytest.raises(ValueError, match="booleans"):
        validate_meta_channels({"portion_year": 2, "portion_day": 0,
                                "time_diff": 0, "depth_rel": 0,
                                "depth_abs_surface": 0,
                                "depth_abs_seabed": 0})
