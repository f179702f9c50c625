"""Loss factory, optimizer schedule parity vs torch, training resume,
work-parquet label masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crimac_unet_tpu.pipeline import engine


def test_loss_factory_types(rng):
    logits = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    labels = jnp.asarray(rng.choice([0, 1, 2, -100], size=(2, 8, 8))
                         .astype(np.int32))
    for lt in ("CE", "Focal", "Dice", "Combined"):
        fn = engine.make_loss_fn({"loss_type": lt})
        val = float(fn(logits, labels))
        assert np.isfinite(val) and val >= 0, lt
    with pytest.raises(ValueError):
        engine.make_loss_fn({"loss_type": "nope"})


def test_weighted_ce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits = rng.randn(2, 3, 8, 8).astype(np.float32)
    labels = rng.choice([0, 1, 2, -100], size=(2, 8, 8)).astype(np.int64)
    w = [10.0, 300.0, 250.0]
    want = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = float(engine.weighted_ce_loss(
        jnp.asarray(logits.transpose(0, 2, 3, 1)),
        jnp.asarray(labels.astype(np.int32)), w))
    assert abs(got - want) < 1e-5


def test_sgd_schedule_matches_torch():
    """optax sgd+momentum with staircase decay must track torch SGD +
    ExponentialLR stepped every lr_step (reference pipeline.py:156-189)."""
    torch = pytest.importorskip("torch")
    import optax

    lr, gamma, mom, lr_step, steps = 0.1, 0.5, 0.95, 3, 10
    w0 = np.array([1.0, -2.0], dtype=np.float32)

    # torch
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([p], lr=lr, momentum=mom)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=gamma)
    for i in range(steps):
        opt.zero_grad()
        loss = (p ** 2).sum()
        loss.backward()
        opt.step()
        if (i + 1) % lr_step == 0:
            sched.step()
    want = p.detach().numpy()

    # ours
    config = {"lr": lr, "lr_step": lr_step, "lr_reduction": gamma,
              "momentum": mom}
    tx = engine.make_optimizer(config)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    for i in range(steps):
        grads = 2 * params
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), want, rtol=1e-5)


def test_training_resume(tmp_path):
    """resume_from restores step/opt state and training continues."""
    from crimac_unet_tpu.data.fixtures import make_survey_dir
    from crimac_unet_tpu.data.memmap_reader import get_echograms
    from crimac_unet_tpu.data import samplers as S
    from crimac_unet_tpu.pipeline.segpipe import SegPipeUNet

    make_survey_dir(tmp_path, year=2017, n_echograms=1, H=80, W=150, seed=4)
    ech = get_echograms(years=[2017], path_to_echograms=str(tmp_path),
                        minimum_shape=60)[0]
    config = {"patch_size": [32, 32], "frequencies": [18, 38, 120, 200],
              "batch_size": 2, "iterations": 2, "test_iter": 1,
              "log_step": 100, "lr_step": 2, "lr": 0.005,
              "lr_reduction": 0.5, "momentum": 0.95, "depth": 2,
              "start_filts": 4, "compute_dtype": "float32",
              "train_dtype": "float32", "random_seed": 1,
              "meta_channels": [], "late_meta_inject": False,
              "save_model_params": True, "mesh_devices": 1}

    ckpt = tmp_path / "run"
    pipe = SegPipeUNet(config, checkpoint_dir=ckpt)
    battery = [S.Background([ech], [32, 32])]
    from crimac_unet_tpu.data.dataset import RandomPatchDataset

    def batches(n):
        ds = RandomPatchDataset(battery, [32, 32], [18, 38, 120, 200],
                                seed=0)
        return (ds.batch(2) for _ in range(n))

    pipe.train_model(batches(2), lambda: batches(1), progress=False)
    assert int(pipe.state.step) == 2

    pipe2 = SegPipeUNet(config, checkpoint_dir=ckpt)
    state = pipe2.resume_from(ckpt / "last.msgpack")
    assert int(state.step) == 2
    pipe2.train_model(batches(2), lambda: batches(1), progress=False)
    assert int(pipe2.state.step) == 4


def test_work_parquet_label_mask(tmp_path):
    import pandas as pd
    from crimac_unet_tpu.data.fixtures import make_zarr_survey
    from crimac_unet_tpu.data.zarr_reader import DataReaderZarr

    sv = make_zarr_survey(tmp_path, year=2017, n_echograms=1, H=60, W=100,
                          seed=8)
    r = DataReaderZarr(sv)
    t5 = np.asarray(r.time_vector)[5]
    rv = np.asarray(r.range_vector)
    df = pd.DataFrame([{"pingTime": t5,
                        "mask_depth_upper": rv[10],
                        "mask_depth_lower": rv[20],
                        "ID": "school-27"}])
    pq = tmp_path / "work.parquet"
    df.to_parquet(pq, engine="pyarrow")
    labels = r.create_label_mask_from_work(parquet_path=pq, heave=False)
    assert labels.shape == r.shape
    assert labels[5].max() == 27
    assert (labels[5] == 27).sum() >= 9


def test_checkpoint_extras_sidecar_and_atomic_write(tmp_path):
    """save_checkpoint writes via temp+rename and records extras in a
    sidecar; load_checkpoint_extras round-trips (code-review findings:
    in-place truncation could destroy the previous good checkpoint, and
    best_F1 was lost across resume)."""
    from crimac_unet_tpu.models.unet import build_unet
    from crimac_unet_tpu.pipeline import engine
    config = {"patch_size": [16, 16], "frequencies": [38],
              "lr": 0.005, "lr_step": 2, "lr_reduction": 0.5,
              "momentum": 0.95, "depth": 2, "start_filts": 2}
    model = build_unet(config)
    state = engine.init_train_state(model, config, jax.random.PRNGKey(0))
    p = tmp_path / "ck" / "last.msgpack"
    engine.save_checkpoint(p, state, extras={"best_f1": 0.55})
    assert engine.load_checkpoint_extras(p) == {"best_f1": 0.55}
    assert not (tmp_path / "ck" / "last.msgpack.tmp").exists()
    payload = engine.load_checkpoint(p, template={
        "params": state.params, "batch_stats": state.batch_stats,
        "opt_state": state.opt_state, "step": state.step})
    assert int(payload["step"]) == 0
    assert engine.load_checkpoint_extras(tmp_path / "nope.msgpack") == {}


def test_resume_from_rejects_pt_checkpoints(tmp_path):
    from crimac_unet_tpu.pipeline.segpipe import SegPipeUNet
    config = {"patch_size": [16, 16], "frequencies": [38], "lr": 0.005,
              "lr_step": 2, "lr_reduction": 0.5, "momentum": 0.95,
              "depth": 2, "start_filts": 2, "batch_size": 2,
              "log_step": 2, "random_seed": 1}
    sp = SegPipeUNet(config)
    with pytest.raises(ValueError, match="optimizer state"):
        sp.resume_from(tmp_path / "weights.pt")


def test_device_prefetch_depth_zero_yields_everything():
    """depth <= 0 used to silently yield NOTHING, truncating training to
    zero iterations (code-review finding)."""
    from crimac_unet_tpu.parallel.prefetch import device_prefetch
    batches = [{"x": np.full(2, i)} for i in range(5)]
    out = list(device_prefetch(iter(batches), None, depth=0))
    assert len(out) == 5
    np.testing.assert_array_equal(np.asarray(out[3]["x"]), [3, 3])


def test_lr_schedule_matches_reference_staircase():
    from crimac_unet_tpu.pipeline import engine
    sched = engine.make_lr_schedule({"lr": 0.005, "lr_step": 1000,
                                     "lr_reduction": 0.5})
    assert float(sched(999)) == pytest.approx(0.005)
    assert float(sched(1000)) == pytest.approx(0.0025)
    assert float(sched(3000)) == pytest.approx(0.005 * 0.5 ** 3)
