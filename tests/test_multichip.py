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
