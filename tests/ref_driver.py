"""Run the ACTUAL reference pipeline (/root/reference/crimac_unet — torch,
pure Python) on this repo's synthetic fixtures, as a subprocess.

This is the round-3 parity harness (VERDICT r2 #1): instead of comparing
our pipeline against builder-written numpy oracles, run the reference's
own code and diff its outputs against ours:

  * memmap path — DatasetGriddedReader + label transforms + SegPipeUNet
    forward + metric selection (pipeline_train_predict/pipeline.py:205-379,
    evaluate.py:83-119, save_predict.py:222-266)
    -> tests/test_reference_parity.py
  * zarr path — DataReaderZarr + get_crop_zarr + the zarr save_predict
    writer and resume (data_reader.py:510-893, batch/dataset.py:358-407,
    save_predict.py:87-219), executing on tests/xrlite.py (a functional
    eager xarray subset backed by our zarrlite, installed as `xarray`)
    -> tests/test_reference_parity_zarr.py
  * offline preprocessing — the lazy labels_heave.dat / seabed.npy
    generators and the memmap->zarr survey converter
    (generate_heave_compensation_files.py:31-63, data_reader.py:433-507,
    data_preprocessing/memmap_to_zarr.py:127-171)
    -> tests/test_reference_parity_preprocess.py

Usage: python ref_driver.py <config.json>

Config keys:
  echograms_path   fixture survey dir (make_survey_dir output)
  work_dir         scratch dir (symlink tree + setpyenv.json live here)
  out_dir          where outputs are written
  ckpt             state-dict .pt path; created (seeded) if absent
  depth, start_filts, patch_size, patch_overlap, batch_size
  eval_modes       list of 'all'|'region'|'trace'
  do_predict       bool — run save_reader_predictions_memm per echogram
  forward_probe    optional {"depth": D, "start_filts": S, "ckpt": path,
                   "batch": path} — build a second UNet_Baseline at the
                   real architecture, save its state_dict + the torch
                   logits for a seeded input batch
  cache_gen        optional {"echogram_dirs": [...]} — reference-side
                   lazy cache generation on pristine echogram dirs
  mat2zarr         optional {"out_dir": ..., "year": Y} — the reference's
                   memmap->zarr converter
  zarr             optional dict driving the reference zarr pipeline
                   (see test_reference_parity_zarr.py)

No reference code is imported into the test process itself (top-level
module names like `data`/`utils` would collide); everything runs here,
isolated.  dask/numcodecs get thin shims; `xarray` gets the FUNCTIONAL
xrlite stub so the reference's zarr code paths execute for real.
"""

import json
import os
import sys
import types

REFERENCE = "/root/reference/crimac_unet"


def reference_available():
    """True when the executed-parity harness can run: the reference
    checkout is present and torch is importable.  The parity test
    modules skip themselves otherwise, so the suite stays runnable on
    machines without the (read-only, environment-provided) reference."""
    if not os.path.isdir(REFERENCE):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


def install_stubs():
    """Stub modules the reference imports at module scope (zarr-stack
    dependencies, absent here).  ``xarray`` gets a FUNCTIONAL eager stub
    (tests/xrlite.py, backed by zarrlite) so the reference's zarr reader
    and writer code paths execute for real; dask/numcodecs get the thin
    shims those paths touch.  Each stub carries a real ModuleSpec:
    torch._dynamo's trace-rule setup runs importlib.util.find_spec over
    loaded modules and raises on __spec__ = None."""
    import importlib.machinery
    import importlib.util

    def stub(name):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
        return mod

    dask = stub("dask")
    dask.config = types.SimpleNamespace(set=lambda *a, **k: None)

    # functional xarray subset — load tests/xrlite.py under its own name
    # BEFORE the reference package dir shadows top-level module names
    xrl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "xrlite.py")
    spec = importlib.util.spec_from_file_location("xrlite", xrl_path)
    xrlite = importlib.util.module_from_spec(spec)
    sys.modules["xrlite"] = xrlite
    spec.loader.exec_module(xrlite)
    sys.modules["xarray"] = xrlite
    xrlite.__spec__ = importlib.machinery.ModuleSpec("xarray", loader=None)

    numcodecs = stub("numcodecs")

    class Blosc:  # save_predict.py:20,128 — params consumed by
        # xrlite.to_zarr's encoding translation
        BITSHUFFLE = 2

        def __init__(self, cname="lz4", clevel=5, shuffle=1, **k):
            self.cname = cname
            self.clevel = clevel
            self.shuffle = shuffle

    numcodecs.Blosc = Blosc

    # the reference targets Python <3.10 (data_reader.py:360 uses
    # collections.Iterable, removed in 3.10) — restore the alias
    import collections
    import collections.abc
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable

    # the reference targets numpy <1.24 (data_reader.py:532 astype(np.int))
    import numpy as np
    if not hasattr(np, "int"):
        np.int = int
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "bool"):
        np.bool = bool


def build_ref_tree(work_dir, echograms_path):
    """Symlink the read-only reference package into work_dir and plant our
    own setpyenv.json (paths.py resolves it relative to __file__)."""
    pkg = os.path.join(work_dir, "refpkg")
    os.makedirs(pkg, exist_ok=True)
    for entry in os.listdir(REFERENCE):
        if entry == "setpyenv.json":
            continue
        dst = os.path.join(pkg, entry)
        if not os.path.lexists(dst):
            os.symlink(os.path.join(REFERENCE, entry), dst)
    with open(os.path.join(pkg, "setpyenv.json"), "w") as f:
        json.dump({"path_to_echograms": str(echograms_path),
                   "path_to_zarr_files": str(echograms_path)}, f)
    return pkg


def main(cfg):
    import numpy as np

    install_stubs()
    pkg = build_ref_tree(cfg["work_dir"], cfg["echograms_path"])
    sys.path.insert(0, pkg)

    import torch

    import models.unet as ref_models
    from batch.dataset import DatasetGriddedReader
    from batch.transforms import (define_data_transform,
                                  define_data_transform_test,
                                  define_label_transform_test)
    from constants import LABEL_SEABED_MASK_VAL
    from data.partition import DataMemm
    from pipeline_train_predict.pipeline import SegPipeUNet
    from pipeline_train_predict.save_predict import \
        save_reader_predictions_memm
    from torch.utils.data import ConcatDataset, DataLoader

    out = cfg["out_dir"]
    os.makedirs(out, exist_ok=True)
    depth, sf = int(cfg["depth"]), int(cfg["start_filts"])
    patch = list(cfg["patch_size"])
    overlap = int(cfg["patch_overlap"])

    def seed_bn_stats(model, seed):
        """Non-trivial BN running stats so the import/fold path is
        exercised beyond the (0, 1) init — ONE recipe for every probe."""
        torch.manual_seed(seed)
        sd = model.state_dict()
        for k, v in sd.items():
            if k.endswith("running_mean"):
                sd[k] = torch.randn_like(v) * 0.05
            elif k.endswith("running_var"):
                sd[k] = (1.0 + 0.1 * torch.randn_like(v)).abs() + 1e-3
        model.load_state_dict(sd)
        return model

    def make_model(d, s, ckpt, seed=0):
        model = ref_models.UNet_Baseline(
            n_classes=3, in_channels=4, late_meta_inject=False, depth=d,
            start_filts=s, up_mode="transpose", merge_mode="concat")
        if os.path.isfile(ckpt):
            model.load_state_dict(torch.load(ckpt, map_location="cpu"))
        else:
            seed_bn_stats(model, seed)
            torch.save(model.state_dict(), ckpt)
        model.eval()
        return model

    common = dict(
        data_mode="memm", frequencies=[18, 38, 120, 200],
        patch_size=patch, loss_type="CE", lr=0.01, lr_reduction=0.5,
        lr_step=1000, momentum=0.95, batch_size=int(cfg["batch_size"]),
        num_workers=0, iterations=1, test_iter=1, log_step=1,
        save_model_params=False, meta_channels={}, late_meta_inject=False,
        eval_mode="all", experiment_name="parity")

    # the pipeline model (small arch for CPU speed) — only built for the
    # stages that predict; preprocess-only configs (cache_gen/mat2zarr)
    # skip the UNet builds and the checkpoint write
    segpipe = None
    if cfg.get("eval_modes") or cfg.get("do_predict") or cfg.get("zarr"):
        # one build: make_model creates+saves the seed-7 checkpoint when
        # absent and loads it otherwise; load_model_params re-reads the
        # file only for SegPipe's model_is_loaded/device bookkeeping
        segpipe = SegPipeUNet(checkpoint_dir=None, **common)
        segpipe.model = make_model(depth, sf, cfg["ckpt"], seed=7)
        segpipe.load_model_params(checkpoint_path=cfg["ckpt"])

    if cfg.get("eval_modes") or cfg.get("do_predict"):
        partition = DataMemm(
            frequencies=common["frequencies"], patch_size=patch,
            partition_train="selected surveys", train_surveys=[],
            validation_surveys=[], partition_predict="selected surveys",
            evaluation_surveys=cfg["surveys"], eval_mode="all",
            save_prediction_surveys=cfg["surveys"], patch_overlap=overlap)
        surveys = partition.get_evaluation_surveys()
        json.dump([int(s) for s in surveys],
                  open(os.path.join(out, "surveys.json"), "w"))

    for mode in cfg.get("eval_modes", []):
        data_transform = define_data_transform_test(False)
        label_transform = define_label_transform_test(
            frequencies=common["frequencies"], label_masks=mode,
            patch_overlap=overlap)
        datasets = []
        for survey in surveys:
            for reader in partition.get_survey_readers(survey):
                datasets.append(DatasetGriddedReader(
                    reader, patch, common["frequencies"],
                    meta_channels={}, grid_start=None, grid_end=None,
                    patch_overlap=overlap, augmentation_function=None,
                    label_transform_function=label_transform,
                    data_transform_function=data_transform,
                    grid_mode="all"))
        loader = DataLoader(ConcatDataset(datasets),
                            batch_size=common["batch_size"], shuffle=False,
                            num_workers=0)
        # validate_model_testing's exact computation (pipeline.py:343-358)
        labels, preds, _ = segpipe.get_predictions_dataloader(
            loader, disable_tqdm=True)
        preds[labels == LABEL_SEABED_MASK_VAL] = 0
        labels, preds = segpipe.select_valid_predictions(labels, preds)
        np.save(os.path.join(out, f"eval_{mode}_labels.npy"), labels)
        np.save(os.path.join(out, f"eval_{mode}_preds.npy"), preds)

    if cfg.get("do_predict"):
        for survey in surveys:
            for reader in partition.get_survey_readers(survey):
                save_reader_predictions_memm(
                    reader, segpipe, meta_channels={}, patch_size=patch,
                    patch_overlap=overlap,
                    batch_size=common["batch_size"], num_workers=0,
                    target_dname=os.path.join(out,
                                              f"{reader.name}_pred.npy"))

    probe = cfg.get("forward_probe")
    if probe:
        model = make_model(int(probe["depth"]), int(probe["start_filts"]),
                           probe["ckpt"], seed=11)
        rng = np.random.RandomState(13)
        x = rng.randn(2, 4, *patch).astype(np.float32)
        with torch.no_grad():
            logits = model(torch.from_numpy(x)).numpy()
        np.save(probe["batch"], x)
        np.save(probe["batch"].replace(".npy", "_logits.npy"), logits)

    mp = cfg.get("meta_probe")
    if mp:
        # the reference's REAL late-meta class, incl. its hard-coded
        # conv1x1(65, 3) head (models/unet.py:346-370) — depth 5 /
        # start_filts 64 is the only architecture it is consistent with
        meta_ch = int(mp.get("meta_in_channels", 2))
        model = ref_models.UNet_LateMetInject(
            n_classes=3, in_channels=4, meta_in_channels=meta_ch,
            late_meta_inject=True, depth=5, start_filts=64,
            up_mode="transpose", merge_mode="concat")
        seed_bn_stats(model, 17)
        torch.save(model.state_dict(), mp["ckpt"])
        model.eval()
        rng = np.random.RandomState(19)
        x = rng.randn(2, 4, *patch).astype(np.float32)
        meta = rng.randn(2, meta_ch, *patch).astype(np.float32)
        with torch.no_grad():
            logits = model(torch.from_numpy(x),
                           torch.from_numpy(meta)).numpy()
        np.save(mp["batch"], x)
        np.save(mp["batch"].replace(".npy", "_meta.npy"), meta)
        np.save(mp["batch"].replace(".npy", "_logits.npy"), logits)

    tp = cfg.get("train_probe")
    if tp:
        # two REAL reference optimizer steps (train_model,
        # pipeline.py:156-179: SGD momentum + the weighted-CE criterion
        # of get_criterion, model in train() mode so BN batch stats and
        # running-stat updates are live)
        model = make_model(depth, sf, tp["ckpt"], seed=23)
        model.train()
        optimizer = torch.optim.SGD(model.parameters(), lr=0.01,
                                    momentum=0.95)
        criterion = torch.nn.CrossEntropyLoss(
            weight=torch.tensor([10.0, 300.0, 250.0]))
        rng = np.random.RandomState(29)
        losses = []
        for step in range(2):
            x = rng.randn(4, 4, *patch).astype(np.float32)
            y = rng.choice([0, 1, 2, -100], size=(4, *patch),
                           p=[0.5, 0.2, 0.2, 0.1]).astype(np.int64)
            np.save(os.path.join(out, f"train_x{step}.npy"), x)
            np.save(os.path.join(out, f"train_y{step}.npy"), y)
            optimizer.zero_grad()
            logits = model(torch.from_numpy(x))
            loss = criterion(logits, torch.from_numpy(y))
            loss.backward()
            optimizer.step()
            losses.append(float(loss.item()))
        np.save(os.path.join(out, "train_losses.npy"),
                np.array(losses, np.float64))
        torch.save(model.state_dict(),
                   os.path.join(out, "train_after.pt"))

    tj = cfg.get("trajectory_probe")
    if tj:
        # a SHORT TRAINING TRAJECTORY (default 50 optimizer steps) of the
        # real reference loop — same criterion/optimizer as train_probe
        # but long enough that accumulated FP drift / BN running-stat
        # conventions would surface (VERDICT r3 #6: "steps match" is not
        # "training matches").  Batches are NOT saved: the test process
        # regenerates the identical stream from the same seeded RNG.
        steps = int(tj.get("steps", 50))
        model = make_model(depth, sf, tj["ckpt"], seed=43)
        model.train()
        optimizer = torch.optim.SGD(model.parameters(), lr=0.01,
                                    momentum=0.95)
        criterion = torch.nn.CrossEntropyLoss(
            weight=torch.tensor([10.0, 300.0, 250.0]))
        rng = np.random.RandomState(41)
        losses = []
        for _ in range(steps):
            x = rng.randn(4, 4, *patch).astype(np.float32)
            y = rng.choice([0, 1, 2, -100], size=(4, *patch),
                           p=[0.5, 0.2, 0.2, 0.1]).astype(np.int64)
            optimizer.zero_grad()
            loss = criterion(model(torch.from_numpy(x)),
                             torch.from_numpy(y))
            loss.backward()
            optimizer.step()
            losses.append(float(loss.item()))
        np.save(os.path.join(out, "traj_losses.npy"),
                np.array(losses, np.float64))
        torch.save(model.state_dict(),
                   os.path.join(out, "traj_after.pt"))

    ec = cfg.get("export_check")
    if ec:
        # strict load of OUR exported .pt into the reference's real class
        # (flax_to_torch_state_dict contract), then a forward for the
        # test process to compare against
        model = ref_models.UNet_Baseline(
            n_classes=3, in_channels=4, late_meta_inject=False,
            depth=int(ec["depth"]), start_filts=int(ec["start_filts"]),
            up_mode="transpose", merge_mode="concat")
        model.load_state_dict(torch.load(ec["ckpt"], map_location="cpu"))
        model.eval()
        rng = np.random.RandomState(37)
        x = rng.randn(2, 4, *patch).astype(np.float32)
        with torch.no_grad():
            logits = model(torch.from_numpy(x)).numpy()
        np.save(ec["batch"], x)
        np.save(ec["batch"].replace(".npy", "_logits.npy"), logits)

    cg = cfg.get("cache_gen")
    if cg:
        # the reference's OWN lazy cache generation: labels_heave.dat via
        # write_label_file_without_heave_correction_one_echogram
        # (generate_heave_compensation_files.py:31-63, triggered from
        # Echogram.label_memmap, data_reader.py:386-391) and seabed.npy
        # via the gradient-filter estimator (data_reader.py:433-507) —
        # run on pristine echogram dirs so the files compared in
        # test_reference_parity_preprocess.py are reference-generated
        from data.data_reader import Echogram

        for d in cg["echogram_dirs"]:
            ech = Echogram(d)
            ech.label_memmap(heave=True)
            ech.get_seabed(0, n_pings=ech.shape[1])

    mz = cfg.get("mat2zarr")
    if mz:
        # the reference's memmap -> zarr survey converter
        # (data_preprocessing/memmap_to_zarr.py:127-171), writing through
        # xrlite's to_zarr
        from data_preprocessing.memmap_to_zarr import write_zarr_files

        write_zarr_files(mz["out_dir"], int(mz["year"]))

    z = cfg.get("zarr")
    if z:
        # ---- the reference's REAL zarr pipeline, running on xrlite ----
        # (data_reader.py:510-893 DataReaderZarr, dataset.py:358-407
        # get_crop_zarr, save_predict.py:87-219 zarr writer)
        import pipeline_train_predict.save_predict as sp
        from data.data_reader import DataReaderZarr

        reader = DataReaderZarr(z["sv_path"])
        zout = z["out_dir"]
        os.makedirs(zout, exist_ok=True)

        json.dump(
            {"name": reader.name, "year": int(reader.year),
             "shape": [int(s) for s in reader.shape],
             "fish_categories": [int(c) for c in reader.fish_categories],
             "frequencies": [int(f) for f in
                             np.asarray(reader.frequencies.values)]},
            open(os.path.join(zout, "reader_meta.json"), "w"))
        np.save(os.path.join(zout, "valid_pings.npy"),
                reader.get_valid_pings())
        for i, (p0, npi, r0, nr) in enumerate(z.get("probes", [])):
            np.save(os.path.join(zout, f"data_slice_{i}.npy"),
                    reader.get_data_slice(
                        int(p0), int(npi), idx_range=int(r0),
                        n_range=int(nr),
                        frequencies=common["frequencies"]))
            np.save(os.path.join(zout, f"label_slice_{i}.npy"),
                    reader.get_label_slice(int(p0), int(npi),
                                           idx_range=int(r0),
                                           n_range=int(nr)))
        sb_p0, sb_n = z.get("seabed_probe", [3, 120])
        np.save(os.path.join(zout, "seabed_mask.npy"),
                reader.get_seabed_mask(int(sb_p0), int(sb_n), 0, None,
                                       return_numpy=True))
        np.save(os.path.join(zout, "seabed.npy"),
                reader.get_seabed(0, reader.shape[0]))
        reader.get_fish_schools().to_csv(
            os.path.join(zout, "fish_schools.csv"))

        if z.get("eval_all"):
            # validate_model_survey_zarr's computation (evaluate.py:39-79)
            # — which uses define_data_transform (NO set_data_border_value,
            # evaluate.py:49), unlike the memm eval's _test variant
            data_transform = define_data_transform(False)
            label_transform = define_label_transform_test(
                frequencies=common["frequencies"], label_masks="all",
                patch_overlap=overlap)
            dataset = DatasetGriddedReader(
                reader, patch, common["frequencies"], meta_channels={},
                grid_start=None, grid_end=None, data_preload=False,
                patch_overlap=overlap, augmentation_function=None,
                label_transform_function=label_transform,
                data_transform_function=data_transform, grid_mode="all")
            loader = DataLoader(dataset,
                                batch_size=common["batch_size"],
                                shuffle=False, num_workers=0)
            labels, preds, _ = segpipe.get_predictions_dataloader(
                loader, disable_tqdm=True)
            preds[labels == LABEL_SEABED_MASK_VAL] = 0
            labels, preds = segpipe.select_valid_predictions(labels, preds)
            np.save(os.path.join(zout, "zarr_eval_all_labels.npy"), labels)
            np.save(os.path.join(zout, "zarr_eval_all_preds.npy"), preds)

        # region/trace eval over zarr is BROKEN in the reference:
        # extend_label_masks calls echogram.get_object_bounding_boxes()
        # (extend_label_masks.py:66), defined only on the memmap Echogram
        # (data_reader.py:404) — record the crash for DIVERGENCES.md
        try:
            label_transform = define_label_transform_test(
                frequencies=common["frequencies"], label_masks="region",
                patch_overlap=overlap)
            dataset = DatasetGriddedReader(
                reader, patch, common["frequencies"], meta_channels={},
                grid_start=None, grid_end=None, data_preload=False,
                patch_overlap=overlap, augmentation_function=None,
                label_transform_function=label_transform,
                data_transform_function=define_data_transform(False),
                grid_mode="all")
            dataset[0]
            crash = {"crashed": False}
        except Exception as e:  # noqa: BLE001 — the crash IS the datum
            crash = {"crashed": True, "type": type(e).__name__,
                     "message": str(e)[:200]}
        json.dump(crash,
                  open(os.path.join(zout, "zarr_region_crash.json"), "w"))

        pz = z.get("predict")
        if pz:
            kw = dict(segpipe=segpipe, meta_channels={},
                      patch_size=patch, patch_overlap=overlap,
                      batch_size=common["batch_size"], num_workers=0,
                      preload_n_pings=int(pz["preload_n_pings"]))
            # full run: the production write path (mode='w' then
            # append_dim='ping_time' per split, Blosc zstd-3 BITSHUFFLE)
            sp.save_survey_predictions_zarr(
                reader, target_dname=pz["full_store"],
                resume_writing=False, **kw)
            # interrupted-then-resumed run: first split only (simulating
            # a stop between splits), then resume_writing=True restarts
            # from the store's ping count (initialize_zarr_directory,
            # save_predict.py:107-121)
            real_split = sp.get_data_split
            sp.get_data_split = lambda r, n: real_split(r, n)[:1]
            try:
                sp.save_survey_predictions_zarr(
                    reader, target_dname=pz["resumed_store"],
                    resume_writing=False, **kw)
            finally:
                sp.get_data_split = real_split
            sp.save_survey_predictions_zarr(
                reader, target_dname=pz["resumed_store"],
                resume_writing=True, **kw)

    print("REF_DRIVER_OK")


if __name__ == "__main__":
    with open(sys.argv[1]) as f:
        main(json.load(f))
