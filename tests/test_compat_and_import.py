"""Compat layer exports, .pt disk round-trip, meta-channel predict smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_compat_exports():
    from crimac_unet_tpu import compat as c
    for name in ("Echogram", "DataReaderZarr", "get_data_readers",
                 "DataMemm", "DataZarr", "Background", "SchoolZarr",
                 "Gridded", "Dataset", "UNet_Baseline", "SegPipeUNet",
                 "save_survey_predictions_zarr", "refine_label_boundary",
                 "db_with_limits", "getGrid", "get_data_split"):
        assert hasattr(c, name), name


def test_torch_checkpoint_disk_roundtrip(tmp_path):
    """A reference-style .pt state_dict on disk loads through
    engine.load_checkpoint and drives the flax model."""
    torch = pytest.importorskip("torch")
    from test_model import _torch_oracle_unet
    from crimac_unet_tpu.models.unet import UNet
    from crimac_unet_tpu.pipeline.engine import load_checkpoint

    torch.manual_seed(3)
    net = _torch_oracle_unet(4, 3, 2, 4)
    net.eval()
    path = tmp_path / "paper_v2_heave_2.pt"
    torch.save(net.state_dict(), path)

    payload = load_checkpoint(str(path))
    model = UNet(n_classes=3, depth=2, start_filts=4)
    x = np.random.RandomState(0).rand(1, 4, 32, 32).astype(np.float32)
    got = model.apply({"params": payload["params"],
                       "batch_stats": payload["batch_stats"]},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-4, rtol=1e-3)


def test_predict_with_meta_channels(tmp_path):
    """Gridded prediction with all metadata channels on a memmap reader."""
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.data.meta_channels import META_CHANNEL_KEYS
    from crimac_unet_tpu.models.unet import UNet
    from crimac_unet_tpu.pipeline.inference import (GriddedRunner,
                                                    predict_reader)

    make_survey_dir(tmp_path, year=2017, n_echograms=1, H=70, W=120, seed=2)
    ech = get_echograms(years=[2017], path_to_echograms=str(tmp_path),
                        minimum_shape=60)[0]
    meta = {k: True for k in META_CHANNEL_KEYS}
    config = {"patch_size": [32, 32], "patch_overlap": 4,
              "frequencies": [18, 38, 120, 200], "fwd_batch": 8,
              "meta_channels": meta}
    model = UNet(n_classes=3, depth=2, start_filts=4)
    x = jnp.zeros((1, 32, 32, 11), jnp.float32)  # 4 acoustic + 7 meta
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    runner = GriddedRunner(model, variables, config)
    chunks = list(predict_reader(runner, ech, preload_n_pings=60))
    assert len(chunks) == 2
    for s, e, out, _ in chunks:
        assert out.shape == (2, 70, e - s)
        assert np.isfinite(out.astype(np.float32)).all()
        assert (out != 0).any()


def test_flax_to_torch_roundtrip(tmp_path):
    """flax_to_torch_state_dict is an exact inverse of the import: a
    torch state dict (reference naming/layout) -> flax -> torch
    round-trips bit-for-bit including the key set, so models trained
    here deploy back into the reference pipeline."""
    import numpy as np
    torch = pytest.importorskip("torch")

    import jax
    import jax.numpy as jnp
    from crimac_unet_tpu.models.torch_import import (
        flax_to_torch_state_dict, load_torch_checkpoint,
        save_torch_checkpoint, torch_state_dict_to_flax)
    from crimac_unet_tpu.models.unet import build_unet

    # build variables from OUR side (training init) with late meta
    meta_ch = 2
    model = build_unet({"depth": 3, "start_filts": 8,
                        "late_meta_inject": True})
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 32, 32, 4)),
                           meta=jnp.zeros((1, 32, 32, meta_ch)),
                           train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    p = tmp_path / "export.pt"
    save_torch_checkpoint(variables, p)
    back = load_torch_checkpoint(p)

    flat_a = jax.tree_util.tree_flatten_with_path(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})[0]
    flat_b = jax.tree_util.tree_flatten_with_path(
        {"params": back["params"], "batch_stats": back["batch_stats"]})[0]
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(ka))

    # the exported key set matches the reference state_dict exactly
    sd = torch.load(p, map_location="cpu", weights_only=True)
    want_keys = set()
    for i in range(3):
        for j, bn in ((0, 1), (3, 4)):
            want_keys.add(f"down_convs.{i}.main.{j}.weight")
            want_keys.add(f"down_convs.{i}.main.{j}.bias")
            for stat in ("weight", "bias", "running_mean", "running_var",
                         "num_batches_tracked"):
                want_keys.add(f"down_convs.{i}.main.{bn}.{stat}")
    for i in range(2):
        for name in ("upconv", "conv1", "conv2"):
            want_keys.add(f"up_convs.{i}.{name}.weight")
            want_keys.add(f"up_convs.{i}.{name}.bias")
        for name in ("bn1", "bn2"):
            for stat in ("weight", "bias", "running_mean", "running_var",
                         "num_batches_tracked"):
                want_keys.add(f"up_convs.{i}.{name}.{stat}")
    want_keys |= {"conv_final.weight", "conv_final.bias"}
    for i in (0, 2, 4):
        want_keys.add(f"post_processing_weights.main.{i}.weight")
        want_keys.add(f"post_processing_weights.main.{i}.bias")
    assert set(sd.keys()) == want_keys

    # folded (serving) params are rejected with a clear error
    with pytest.raises(ValueError, match="batch_stats"):
        flax_to_torch_state_dict({"params": variables["params"]})
