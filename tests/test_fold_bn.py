"""BN folding: the folded BN-free forward equals the eval-mode BN forward."""

import jax
import jax.numpy as jnp
import numpy as np

from crimac_unet_tpu.models.fold_bn import fold_variables
from crimac_unet_tpu.models.unet import UNet, count_params


def test_folded_forward_matches_eval_forward(rng):
    model = UNet(depth=3, start_filts=8)
    x0 = jnp.zeros((1, 32, 32, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    # non-trivial running stats: run a few train steps' worth of updates
    key = jax.random.PRNGKey(1)
    for i in range(3):
        xb = jax.random.lognormal(jax.random.fold_in(key, i),
                                  2.0, (2, 32, 32, 4))
        _, upd = model.apply(variables, xb, train=True,
                             mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}

    folded = fold_variables(variables)
    model_nobn = UNet(depth=3, start_filts=8, use_bn=False)
    # folded tree drops every bn leaf
    n_orig = count_params(variables["params"])
    n_fold = count_params(folded["params"])
    assert n_fold < n_orig

    x = jax.random.lognormal(jax.random.PRNGKey(2), 2.0, (2, 32, 32, 4))
    # pin true-f32 convs: on TPU the DEFAULT matmul precision computes
    # f32 convs through bf16 passes, and the two mathematically-equal
    # programs then differ at ~1e-2 — conv precision, not folding
    # (observed on a real v5e under CRIMAC_TEST_TPU=1)
    with jax.default_matmul_precision("highest"):
        want = model.apply(variables, x, train=False)
        got = model_nobn.apply(folded, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_folded_runner_predict_parity(tmp_path):
    """GriddedRunner with fold_bn produces the same chunk outputs (within
    f16 quantization) as the unfolded runner."""
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=160,
                          seed=44)
    reader = DataReaderZarr(sv)
    cfg = {"patch_size": [32, 32], "patch_overlap": 4,
           "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
           "compute_dtype": "float32", "depth": 2, "start_filts": 4}
    model = build_unet(cfg)
    x = jnp.zeros((1, 32, 32, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    r_bn = GriddedRunner(model, variables, dict(cfg, fold_bn=False))
    r_fold = GriddedRunner(model, variables, dict(cfg, fold_bn=True))
    assert r_fold.model.use_bn is False

    out_bn = {s: o for s, e, o, _ in predict_reader(r_bn, reader, 80)}
    out_fold = {s: o for s, e, o, _ in predict_reader(r_fold, reader, 80)}
    for s in out_bn:
        np.testing.assert_allclose(out_bn[s].astype(np.float32),
                                   out_fold[s].astype(np.float32),
                                   atol=2e-3)
        np.testing.assert_array_equal(out_bn[s] != 0, out_fold[s] != 0)
