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
