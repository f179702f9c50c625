"""Device sample pool: gather parity with host crops + train-step feed."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crimac_unet_tpu.data.device_pool import DeviceSamplePool
from crimac_unet_tpu.data.fixtures import make_survey_dir
from crimac_unet_tpu.data.memmap_reader import get_echograms


@pytest.fixture(scope="module")
def pool_and_readers(tmp_path_factory):
    path = tmp_path_factory.mktemp("pool")
    make_survey_dir(path, year=2017, n_echograms=2, H=90, W=200, seed=31)
    # one echogram with a different (smaller) height exercises padding
    make_survey_dir(path, year=2016, n_echograms=1, H=70, W=160, seed=32)
    readers = get_echograms(years=[2016, 2017], path_to_echograms=str(path),
                            minimum_shape=40)
    pool = DeviceSamplePool(readers, [18, 38, 120, 200], [48, 48])
    return pool, readers


def test_gather_matches_host_crops(pool_and_readers, rng):
    pool, readers = pool_and_readers
    window = [48, 48]
    samples = []
    for _ in range(16):
        r = readers[rng.randint(len(readers))]
        # include out-of-bounds-ish centers (boundary fill paths)
        y = rng.randint(-10, r.shape[0] + 10)
        x = rng.randint(-10, r.shape[1] + 10)
        samples.append((r, [y, x]))

    idxs, starts = pool.prepare_batch(samples)
    data, labels = pool.gather(idxs, starts)
    data, labels = np.asarray(data), np.asarray(labels)

    for k, (r, center) in enumerate(samples):
        want_d = r.crop_data(list(center), window, [18, 38, 120, 200])
        want_l = r.crop_labels(list(center), window)
        np.testing.assert_allclose(data[k], want_d, rtol=1e-6,
                                   err_msg=f"sample {k} data")
        np.testing.assert_array_equal(labels[k], want_l,
                                      err_msg=f"sample {k} labels")


def test_pool_feeds_train_step(pool_and_readers):
    pool, readers = pool_and_readers
    from crimac_unet_tpu.models.unet import UNet
    from crimac_unet_tpu.pipeline import engine

    config = {"patch_size": [48, 48], "frequencies": [18, 38, 120, 200],
              "lr": 0.005, "lr_step": 2, "lr_reduction": 0.5,
              "momentum": 0.95, "depth": 2, "start_filts": 4,
              "compute_dtype": "float32"}
    model = UNet(n_classes=3, depth=2, start_filts=4)
    state = engine.init_train_state(model, config, jax.random.PRNGKey(0))
    step = engine.make_train_step(model, config)

    samples = [(readers[0], [40, 60]), (readers[1], [30, 100])]
    idxs, starts = pool.prepare_batch(samples)
    data, labels = pool.gather(idxs, starts)  # stays on device
    state, loss = step(state, data, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_zarr_pool_gather_matches_host_crops(tmp_path, rng):
    """ZarrSamplePool slab gather must reproduce DataReaderZarr.crop_data /
    crop_labels bit-exactly (clip+pad semantics, no recentering;
    reference batch/dataset.py:358-407)."""
    from crimac_unet_tpu.data.device_pool import ZarrSamplePool
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr

    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=80, W=220,
                          seed=7)
    reader = DataReaderZarr(sv)
    window = [48, 48]
    freqs = [18, 38, 120, 200]
    pool = ZarrSamplePool([reader], freqs, window, chunk_pings=64)

    samples = []
    for _ in range(12):
        y = rng.randint(-10, reader.shape[1] + 10)   # range axis
        x = rng.randint(-10, reader.shape[0] + 10)   # ping axis
        samples.append((reader, [y, x]))

    idxs, starts = pool.prepare_batch(samples)
    data, labels = pool.gather(idxs, starts)
    data, labels = np.asarray(data), np.asarray(labels)
    for k, (r, center) in enumerate(samples):
        want_d = r.crop_data(list(center), window, freqs)
        want_l = r.crop_labels(list(center), window)
        np.testing.assert_allclose(data[k], want_d, rtol=1e-6,
                                   err_msg=f"sample {k} data")
        np.testing.assert_array_equal(labels[k], want_l,
                                      err_msg=f"sample {k} labels")


def test_pooled_train_step_matches_host_path(pool_and_readers):
    """make_train_step_pooled (on-device gather) and the host-crop path
    must produce the same losses/params for the same samples and rng —
    the pool is a transport optimization, not a semantic change."""
    from crimac_unet_tpu.models.unet import UNet
    from crimac_unet_tpu.pipeline import engine

    pool, readers = pool_and_readers
    config = {"patch_size": [48, 48], "frequencies": [18, 38, 120, 200],
              "lr": 0.005, "lr_step": 5, "lr_reduction": 0.5,
              "momentum": 0.95, "depth": 2, "start_filts": 4,
              "compute_dtype": "float32"}
    model = UNet(n_classes=3, depth=2, start_filts=4)
    s_host = engine.init_train_state(model, config, jax.random.PRNGKey(0))
    s_pool = engine.init_train_state(model, config, jax.random.PRNGKey(0))
    host_step = engine.make_train_step(model, config)
    pool_step = engine.make_train_step_pooled(model, config)

    rng_np = np.random.RandomState(5)
    for it in range(3):
        samples = []
        for _ in range(4):
            r = readers[rng_np.randint(len(readers))]
            samples.append((r, [rng_np.randint(-5, r.shape[0] + 5),
                                rng_np.randint(-5, r.shape[1] + 5)]))
        key = jax.random.PRNGKey(100 + it)
        data = np.stack([r.crop_data(list(c), [48, 48],
                                     [18, 38, 120, 200])
                         for r, c in samples])
        labels = np.stack([r.crop_labels(list(c), [48, 48])
                           for r, c in samples]).astype(np.int32)
        s_host, l_host = host_step(s_host, jnp.asarray(data),
                                   jnp.asarray(labels), key)
        idxs, starts = pool.prepare_batch(samples)
        s_pool, l_pool = pool_step(s_pool, pool.data, pool.labels,
                                   jnp.asarray(idxs), jnp.asarray(starts),
                                   key)
        np.testing.assert_allclose(float(l_host), float(l_pool),
                                   rtol=1e-5, err_msg=f"iter {it}")
    flat_h = jax.tree_util.tree_leaves(s_host.params)
    flat_p = jax.tree_util.tree_leaves(s_pool.params)
    for a, b in zip(flat_h, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_run_training_pooled_end_to_end(tmp_path, monkeypatch):
    """run_training with use_device_pool wires the pool in (coordinate
    batches -> pooled step) and trains end-to-end with checkpoints."""
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.pipeline.train import run_training, maybe_build_pool
    from crimac_unet_tpu.data.partition import make_partition
    from crimac_unet_tpu import paths

    make_survey_dir(tmp_path / "memm", year=2017, n_echograms=2, H=80,
                    W=200, seed=9)
    make_survey_dir(tmp_path / "memm", year=2016, n_echograms=1, H=80,
                    W=200, seed=10)
    monkeypatch.setattr(paths, "path_to_echograms",
                        lambda: str(tmp_path / "memm"))

    config = {"frequencies": [18, 38, 120, 200], "data_mode": "memm",
              "patch_size": [48, 48], "loss_type": "CE", "batch_size": 2,
              "lr": 0.005, "lr_reduction": 0.5, "momentum": 0.95,
              "iterations": 3, "test_iter": 1, "log_step": 3, "lr_step": 3,
              "num_workers": 1, "partition_train": "selected surveys",
              "train_surveys": [2017], "validation_surveys": [2016],
              "eval_mode": "all", "patch_overlap": 5, "random_seed": 10,
              "partition_predict": "all surveys",
              "evaluation_surveys": [], "save_prediction_surveys": [],
              "depth": 2, "start_filts": 4, "min_shape": 40,
              "use_device_pool": True}

    # the pool really engages for this config
    data_obj = make_partition(config)
    readers_train, _ = data_obj.partition_data_train()
    pool = maybe_build_pool(config, readers_train)
    assert pool is not None

    segpipe = run_training(config, tmp_path / "ckpt", progress=False)
    assert segpipe.pool is not None
    assert (tmp_path / "ckpt" / "last.msgpack").exists()
    assert (tmp_path / "ckpt" / "best.msgpack").exists()
    assert int(segpipe.state.step) == 3


def test_pooled_validation_matches_host_crops(pool_and_readers, rng):
    """make_eval_step_pooled (on-device gather + host seabed strips) must
    produce the bit-identical PR histogram and loss as the host-crop
    validation step on the same draws."""
    from crimac_unet_tpu.data.dataset import seabed_patch_row
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.ops import metrics as M
    from crimac_unet_tpu.pipeline import engine

    pool, readers = pool_and_readers
    window = [48, 48]
    config = {"patch_size": window, "frequencies": [18, 38, 120, 200],
              "lr": 0.005, "lr_step": 1000, "lr_reduction": 0.5,
              "momentum": 0.95, "depth": 2, "start_filts": 4,
              "batch_size": 6}
    model = build_unet(config)
    state = engine.init_train_state(model, config, jax.random.PRNGKey(2))
    eval_host = engine.make_eval_step(model, config)
    eval_pooled = engine.make_eval_step_pooled(model, config)

    samples = []
    for _ in range(6):
        r = readers[rng.randint(len(readers))]
        y = rng.randint(0, r.shape[0])
        x = rng.randint(-5, r.shape[1] + 5)
        samples.append((r, [y, x]))

    data = np.stack([r.crop_data(list(c), window, [18, 38, 120, 200])
                     for r, c in samples])
    labels = np.stack([r.crop_labels(list(c), window).astype(np.int32)
                       for r, c in samples])
    seabed = np.stack([seabed_patch_row(r, c, window) for r, c in samples])
    h_host, l_host = eval_host(
        state.params, state.batch_stats, M.new_histogram(),
        jnp.asarray(data), jnp.asarray(labels), jnp.asarray(seabed),
        overlap=0, with_loss=True)

    idxs, starts = pool.prepare_batch(samples)
    h_pool, l_pool = eval_pooled(
        state.params, state.batch_stats, M.new_histogram(),
        pool.data, pool.labels, jnp.asarray(idxs), jnp.asarray(starts),
        jnp.asarray(seabed), overlap=0, with_loss=True)

    np.testing.assert_array_equal(np.asarray(h_host), np.asarray(h_pool))
    np.testing.assert_allclose(float(l_host), float(l_pool), rtol=1e-6)


ALL_META = {"portion_year": True, "portion_day": True, "depth_rel": True,
            "depth_abs_surface": True, "depth_abs_seabed": True,
            "time_diff": True}


def test_pool_meta_gather_matches_host_crop_meta(pool_and_readers, rng):
    """The on-device meta computation (_gather_meta_crops over per-echogram
    vectors) must reproduce the host crop_meta maps (reference
    batch/dataset.py:288-351) — including the meta grid's offset from the
    data crop, index clamping, and the window-taller-than-column
    recentering."""
    from crimac_unet_tpu.data.device_pool import (DeviceSamplePool,
                                                  _gather_meta_crops)
    from crimac_unet_tpu.data.meta_channels import crop_meta

    _, readers = pool_and_readers
    for window in ([48, 48], [96, 48]):  # [96,48] > H=70: recenter path
        pool = DeviceSamplePool(readers, [18, 38, 120, 200], window,
                                meta_channels=ALL_META)
        assert pool.meta_vectors is not None
        samples = []
        for _ in range(12):
            r = readers[rng.randint(len(readers))]
            samples.append((r, [rng.randint(-10, r.shape[0] + 10),
                                rng.randint(-10, r.shape[1] + 10)]))
        idxs, starts = pool.prepare_batch(samples)
        got = np.asarray(_gather_meta_crops(
            *pool.meta_vectors, jnp.asarray(idxs), jnp.asarray(starts),
            tuple(window), pool.meta_flags))
        for k, (r, c) in enumerate(samples):
            want = crop_meta(r, list(c), window, ALL_META)
            np.testing.assert_allclose(
                got[k], want, atol=2e-5, rtol=1e-5,
                err_msg=f"sample {k} window {window}")


def test_pooled_train_step_matches_host_path_meta(pool_and_readers):
    """Pooled training WITH metadata channels (meta maps computed on
    device) matches the host-crop meta path: same losses and params for
    the same draws and rng."""
    from crimac_unet_tpu.data.device_pool import DeviceSamplePool
    from crimac_unet_tpu.data.meta_channels import crop_meta
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline import engine

    _, readers = pool_and_readers
    window = [48, 48]
    config = {"patch_size": window, "frequencies": [18, 38, 120, 200],
              "lr": 0.005, "lr_step": 5, "lr_reduction": 0.5,
              "momentum": 0.95, "depth": 2, "start_filts": 4,
              "compute_dtype": "float32", "meta_channels": ALL_META}
    pool = DeviceSamplePool(readers, [18, 38, 120, 200], window,
                            meta_channels=ALL_META)
    model = build_unet(config)
    rng0 = jax.random.PRNGKey(0)
    s_host = engine.init_train_state(model, config, rng0)
    s_pool = engine.init_train_state(model, config, rng0)
    host_step = engine.make_train_step(model, config)
    pool_step = engine.make_train_step_pooled(model, config)

    rng_np = np.random.RandomState(7)
    for it in range(3):
        samples = []
        for _ in range(4):
            r = readers[rng_np.randint(len(readers))]
            samples.append((r, [rng_np.randint(-5, r.shape[0] + 5),
                                rng_np.randint(-5, r.shape[1] + 5)]))
        key = jax.random.PRNGKey(200 + it)
        data = np.stack([r.crop_data(list(c), window, [18, 38, 120, 200])
                         for r, c in samples])
        labels = np.stack([r.crop_labels(list(c), window)
                           for r, c in samples]).astype(np.int32)
        meta = np.stack([crop_meta(r, list(c), window, ALL_META)
                         for r, c in samples])
        s_host, l_host = host_step(s_host, jnp.asarray(data),
                                   jnp.asarray(labels), jnp.asarray(meta),
                                   key)
        idxs, starts = pool.prepare_batch(samples)
        s_pool, l_pool = pool_step(s_pool, pool.data, pool.labels,
                                   pool.meta_vectors, jnp.asarray(idxs),
                                   jnp.asarray(starts), key,
                                   flags=pool.meta_flags)
        np.testing.assert_allclose(float(l_host), float(l_pool),
                                   rtol=1e-5, err_msg=f"iter {it}")
    flat_h = jax.tree_util.tree_leaves(s_host.params)
    flat_p = jax.tree_util.tree_leaves(s_pool.params)
    for a, b in zip(flat_h, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_pooled_validation_matches_host_crops_meta(pool_and_readers, rng):
    """Pooled validation WITH metadata channels: PR histogram totals must
    match the host meta path exactly, bin placement within the f16
    quantization of the tiny f32-vs-f64 meta rounding, loss to 1e-5."""
    from crimac_unet_tpu.data.dataset import seabed_patch_row
    from crimac_unet_tpu.data.device_pool import DeviceSamplePool
    from crimac_unet_tpu.data.meta_channels import crop_meta
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.ops import metrics as M
    from crimac_unet_tpu.pipeline import engine

    _, readers = pool_and_readers
    window = [48, 48]
    config = {"patch_size": window, "frequencies": [18, 38, 120, 200],
              "lr": 0.005, "lr_step": 1000, "lr_reduction": 0.5,
              "momentum": 0.95, "depth": 2, "start_filts": 4,
              "batch_size": 6, "meta_channels": ALL_META}
    pool = DeviceSamplePool(readers, [18, 38, 120, 200], window,
                            meta_channels=ALL_META)
    model = build_unet(config)
    state = engine.init_train_state(model, config, jax.random.PRNGKey(2))
    eval_host = engine.make_eval_step(model, config)
    eval_pooled = engine.make_eval_step_pooled(model, config)

    samples = []
    for _ in range(6):
        r = readers[rng.randint(len(readers))]
        samples.append((r, [rng.randint(0, r.shape[0]),
                            rng.randint(-5, r.shape[1] + 5)]))
    data = np.stack([r.crop_data(list(c), window, [18, 38, 120, 200])
                     for r, c in samples])
    labels = np.stack([r.crop_labels(list(c), window).astype(np.int32)
                       for r, c in samples])
    seabed = np.stack([seabed_patch_row(r, c, window) for r, c in samples])
    meta = np.stack([crop_meta(r, list(c), window, ALL_META)
                     for r, c in samples])
    h_host, l_host = eval_host(
        state.params, state.batch_stats, M.new_histogram(),
        jnp.asarray(data), jnp.asarray(labels), jnp.asarray(seabed),
        jnp.asarray(meta), overlap=0, with_loss=True)

    idxs, starts = pool.prepare_batch(samples)
    h_pool, l_pool = eval_pooled(
        state.params, state.batch_stats, M.new_histogram(),
        pool.data, pool.labels, pool.meta_vectors, jnp.asarray(idxs),
        jnp.asarray(starts), jnp.asarray(seabed), flags=pool.meta_flags,
        overlap=0, with_loss=True)

    hh, hp = np.asarray(h_host, np.int64), np.asarray(h_pool, np.int64)
    # identical pixel selection (the label chain sees identical inputs)
    np.testing.assert_array_equal(hh.sum(axis=1), hp.sum(axis=1))
    # probabilities may land one f16 bin apart where the ~1e-7 f32-vs-f64
    # meta rounding crosses a bin edge — bound the total displacement
    assert np.abs(hh - hp).sum() <= 64, np.abs(hh - hp).sum()
    np.testing.assert_allclose(float(l_host), float(l_pool), rtol=1e-5)


def test_run_training_pooled_meta_end_to_end(tmp_path):
    """run_training with meta_channels + use_device_pool: the pool engages
    (it used to be forced to host crops), carries meta vectors, and trains
    with best/last checkpoints."""
    import os
    from crimac_unet_tpu.pipeline.train import run_training

    make_survey_dir(tmp_path / "m", year=2017, n_echograms=1, H=80, W=160,
                    seed=43)
    make_survey_dir(tmp_path / "m", year=2016, n_echograms=1, H=80, W=160,
                    seed=44)
    config = {
        "frequencies": [18, 38, 120, 200], "data_mode": "memm",
        "path_to_echograms": str(tmp_path / "m"),
        "patch_size": [32, 32], "loss_type": "CE", "batch_size": 2,
        "lr": 0.005, "lr_reduction": 0.5, "momentum": 0.95,
        "iterations": 2, "test_iter": 2, "log_step": 2, "lr_step": 2,
        "num_workers": 1, "partition_train": "selected surveys",
        "train_surveys": [2017], "validation_surveys": [2016],
        "partition_predict": "all surveys", "evaluation_surveys": [],
        "save_prediction_surveys": [], "eval_mode": "all",
        "patch_overlap": 4, "random_seed": 10, "depth": 2,
        "start_filts": 4, "use_device_pool": True,
        "meta_channels": ALL_META,
    }
    segpipe = run_training(config, str(tmp_path / "ckpt"), progress=False)
    assert segpipe.pool is not None and \
        segpipe.pool.meta_vectors is not None
    assert segpipe.pool_val is not None and \
        segpipe.pool_val.meta_vectors is not None
    assert np.isfinite(segpipe.best_F1_val)
    assert os.path.isfile(tmp_path / "ckpt" / "best.msgpack")


def test_attach_pool_meta_mismatch_raises(pool_and_readers):
    """Either direction of a config/pool meta mismatch fails loudly at
    attach time, not as a jit signature error at the first step."""
    from crimac_unet_tpu.data.device_pool import DeviceSamplePool
    from crimac_unet_tpu.pipeline.segpipe import SegPipeUNet

    _, readers = pool_and_readers
    base = {"frequencies": [18, 38, 120, 200], "patch_size": [48, 48],
            "loss_type": "CE", "batch_size": 2, "lr": 0.005,
            "lr_step": 1000, "lr_reduction": 0.5, "momentum": 0.95,
            "eval_mode": "all",
            "random_seed": 1, "depth": 2, "start_filts": 4}
    plain = DeviceSamplePool(readers, [18, 38, 120, 200], [48, 48])
    meta_pool = DeviceSamplePool(readers, [18, 38, 120, 200], [48, 48],
                                 meta_channels=ALL_META)
    sp_meta = SegPipeUNet(dict(base, meta_channels=ALL_META))
    with pytest.raises(ValueError, match="built without"):
        sp_meta.attach_pool(plain)
    sp_plain = SegPipeUNet(dict(base))
    with pytest.raises(ValueError, match="does not enable"):
        sp_plain.attach_pool(meta_pool)


def test_forced_pool_zarr_meta_raises(tmp_path):
    """use_device_pool: true + meta_channels on zarr surveys cannot pool
    (meta is memmap-only) — forced mode raises instead of silently
    training on host crops."""
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.pipeline.train import maybe_build_pool

    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=80,
                          seed=5)
    readers = [DataReaderZarr(sv)]
    cfg = {"patch_size": [32, 32], "frequencies": [18, 38, 120, 200],
           "meta_channels": ALL_META, "use_device_pool": True}
    with pytest.raises(ValueError, match="memmap-only"):
        maybe_build_pool(cfg, readers)
    # auto mode falls back loudly (prints) but returns None
    assert maybe_build_pool(dict(cfg, use_device_pool="auto"),
                            readers) is None


def test_zarr_pool_rejects_meta_channels(tmp_path):
    """Metadata channels are memmap-only (reference dataset.py:245-252) —
    a zarr pool with meta must fail loudly at construction."""
    from crimac_unet_tpu.data.device_pool import ZarrSamplePool
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr

    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=80,
                          seed=3)
    reader = DataReaderZarr(sv)
    with pytest.raises(ValueError, match="memmap-only"):
        ZarrSamplePool([reader], [18, 38, 120, 200], [32, 32],
                       meta_channels=ALL_META)


def test_run_training_engages_validation_pool(tmp_path):
    """run_training builds + uses the validation pool (coordinate batches
    with seabed strips) alongside the train pool."""
    import os
    from crimac_unet_tpu.pipeline.train import run_training

    make_survey_dir(tmp_path / "m", year=2017, n_echograms=1, H=80, W=160,
                    seed=41)
    make_survey_dir(tmp_path / "m", year=2016, n_echograms=1, H=80, W=160,
                    seed=42)
    config = {
        "frequencies": [18, 38, 120, 200], "data_mode": "memm",
        "path_to_echograms": str(tmp_path / "m"),
        "patch_size": [32, 32], "loss_type": "CE", "batch_size": 2,
        "lr": 0.005, "lr_reduction": 0.5, "momentum": 0.95,
        "iterations": 2, "test_iter": 2, "log_step": 2, "lr_step": 2,
        "num_workers": 1, "partition_train": "selected surveys",
        "train_surveys": [2017], "validation_surveys": [2016],
        "partition_predict": "all surveys", "evaluation_surveys": [],
        "save_prediction_surveys": [], "eval_mode": "all",
        "patch_overlap": 4, "random_seed": 10, "depth": 2,
        "start_filts": 4,
    }
    segpipe = run_training(config, str(tmp_path / "ckpt"), progress=False)
    assert segpipe.pool is not None
    assert segpipe.pool_val is not None, "validation pool not engaged"
    assert np.isfinite(segpipe.best_F1_val)
    assert os.path.isfile(tmp_path / "ckpt" / "best.msgpack")


def test_zarr_pool_heterogeneous_readers_one_compiled_shape(tmp_path, rng):
    """Readers with different range sizes and a survey SHORTER than
    chunk_pings: the fixed-shape staged upload (range padding + tail
    shift — review finding r3) must stay bit-exact vs host crops."""
    from crimac_unet_tpu.data.device_pool import ZarrSamplePool
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr

    r1 = DataReaderZarr(make_zarr_survey(tmp_path / "a", year=2017,
                                         n_echograms=1, H=80, W=220,
                                         seed=7))
    r2 = DataReaderZarr(make_zarr_survey(tmp_path / "b", year=2018,
                                         n_echograms=1, H=60, W=40,
                                         seed=8))  # 40 pings < chunk 64
    window = [48, 48]
    freqs = [18, 38, 120, 200]
    pool = ZarrSamplePool([r1, r2], freqs, window, chunk_pings=64)

    samples = []
    for _ in range(6):
        for r in (r1, r2):
            y = rng.randint(-10, r.shape[1] + 10)
            x = rng.randint(-10, r.shape[0] + 10)
            samples.append((r, [y, x]))
    idxs, starts = pool.prepare_batch(samples)
    data, labels = pool.gather(idxs, starts)
    data, labels = np.asarray(data), np.asarray(labels)
    for k, (r, center) in enumerate(samples):
        np.testing.assert_allclose(
            data[k], r.crop_data(list(center), window, freqs), rtol=1e-6,
            err_msg=f"sample {k} data")
        np.testing.assert_array_equal(
            labels[k], r.crop_labels(list(center), window),
            err_msg=f"sample {k} labels")


def test_pool_preserves_caller_frequency_order(tmp_path):
    """Pooled batches must carry channels in CALLER order like the host
    crop path — the internal sort silently permuted them (review
    finding)."""
    from crimac_unet_tpu.data.device_pool import DeviceSamplePool
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.data.memmap_reader import get_echograms

    make_survey_dir(tmp_path, year=2017, n_echograms=1, H=48, W=80, seed=1)
    ech = get_echograms(years=[2017], path_to_echograms=str(tmp_path),
                        minimum_shape=40)[0]
    order = [200, 18, 120, 38]
    pool = DeviceSamplePool([ech], order, (32, 32))
    assert pool.frequencies == order
    # channel c of the pool equals the reader's data for order[c]
    got = np.asarray(pool.data[0, :, 32:32 + 48, 32:32 + 80])
    for c, f in enumerate(order):
        want = np.nan_to_num(np.asarray(ech.data_memmaps(f)[0]), nan=0.0)
        np.testing.assert_allclose(got[c], want, rtol=1e-6)


def test_attach_pool_meta_flagset_mismatch_raises(pool_and_readers):
    """Same-COUNT but different-SET meta flags must also fail at attach
    time: the pooled gather computes maps from the pool's flags while the
    model is sized from the config's count — coinciding counts would
    otherwise train silently on the wrong features (review finding r3)."""
    from crimac_unet_tpu.data.device_pool import DeviceSamplePool
    from crimac_unet_tpu.pipeline.segpipe import SegPipeUNet

    _, readers = pool_and_readers
    base = {"frequencies": [18, 38, 120, 200], "patch_size": [48, 48],
            "loss_type": "CE", "batch_size": 2, "lr": 0.005,
            "lr_step": 1000, "lr_reduction": 0.5, "momentum": 0.95,
            "eval_mode": "all",
            "random_seed": 1, "depth": 2, "start_filts": 4}
    # both sets count 3 channels: {portion_day(2) + portion_year(1)} vs
    # {time_diff, depth_rel, depth_abs_surface}
    flags_a = dict.fromkeys(ALL_META, 0) | {"portion_day": 1,
                                            "portion_year": 1}
    flags_b = dict.fromkeys(ALL_META, 0) | {"time_diff": 1, "depth_rel": 1,
                                            "depth_abs_surface": 1}
    pool_a = DeviceSamplePool(readers, [18, 38, 120, 200], [48, 48],
                              meta_channels=flags_a)
    sp_b = SegPipeUNet(dict(base, meta_channels=flags_b))
    with pytest.raises(ValueError, match="meta_channels mismatch"):
        sp_b.attach_pool(pool_a)


def test_meta_guards_partial_dict_and_odd_window(pool_and_readers):
    """get_in_channels rejects partial flag dicts with the validator's
    message (not a bare KeyError), and odd patch dims fail loudly in both
    the host crop path and the pool constructor (the reference arange
    grid law only fills even windows)."""
    from crimac_unet_tpu.data.device_pool import DeviceSamplePool
    from crimac_unet_tpu.data.meta_channels import (crop_meta,
                                                    get_in_channels)

    _, readers = pool_and_readers
    with pytest.raises(ValueError, match="keys must be"):
        get_in_channels({"portion_year": 1})
    with pytest.raises(ValueError, match="must be a mapping"):
        get_in_channels(["portion_year"])
    with pytest.raises(ValueError, match="even patch dims"):
        crop_meta(readers[0], [24, 24], (47, 48), ALL_META)
    with pytest.raises(ValueError, match="even patch dims"):
        DeviceSamplePool(readers, [18, 38, 120, 200], [48, 47],
                         meta_channels=ALL_META)
