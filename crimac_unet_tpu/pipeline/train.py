"""Training entry point.

    python -m crimac_unet_tpu.pipeline.train --yaml_path configs/....yaml

Keeps the reference CLI surface (pipeline_train_predict/train.py:113-158):
YAML + argparse merge, experiment dirs ``saved_models/<exp>/<ts>`` and
``tensorboard_logs/<exp>/<ts>``, config logged as a markdown table, training
with periodic best-F1 validation checkpointing.
"""

from __future__ import annotations

import os
import shutil
import time
from pathlib import Path

import numpy as np

from ..config import (config_args_to_markdown, get_argparse_parser,
                      load_yaml_config, parse_config_options)
from ..data.dataset import BatchPrefetcher, RandomPatchDataset
from ..data.partition import make_partition
from ..utils.general import fix_seeds, get_datetime_str
from .segpipe import SegPipeUNet


def make_datasets(config, data_obj):
    """Partition + sampler battery -> train/test dataset factories
    (reference train.py:35-110).  Also returns the train readers so the
    caller can build a device sample pool over them."""
    readers_train, readers_test = data_obj.partition_data_train()
    samplers_train, samplers_test, probs = data_obj.get_samplers_train(
        readers_train, readers_test)

    meta = config.get("meta_channels") or None

    def train_factory(seed_offset=0):
        return RandomPatchDataset(samplers_train, config["patch_size"],
                                  sorted(config["frequencies"]),
                                  sampler_probs=probs, meta_channels=meta,
                                  seed=config["random_seed"] + seed_offset)

    def test_factory(seed_offset=0):
        return RandomPatchDataset(samplers_test, config["patch_size"],
                                  sorted(config["frequencies"]),
                                  sampler_probs=probs, meta_channels=meta,
                                  seed=config["random_seed"] + 10_000
                                  + seed_offset)
    return train_factory, test_factory, readers_train, readers_test


def maybe_build_pool(config, readers_train, budget_mb=None, role="train"):
    """HBM-resident sample pool when enabled and within the HBM budget.

    ``use_device_pool``: ``"auto"`` (default) pools whenever the train
    readers fit ``device_pool_budget_mb`` (default 2048); ``True`` forces
    pooling (raises if impossible); ``False`` keeps host crops.  Metadata
    runs pool too — the meta channel maps are computed ON DEVICE from
    per-echogram vectors inside the fused step (memmap only, like the
    reference's meta support; zarr+meta falls back to host crops, where
    the reader raises the reference's memmap-only error).
    ``role``: 'train' (forced mode raises when over budget) or
    'validation' (always falls back to host crops — the forced train
    pool is already satisfied, and the remaining-budget gate must not
    kill a satisfiable run)."""
    from ..data import device_pool as dp
    from ..data.meta_channels import get_in_channels
    mode = config.get("use_device_pool", "auto")
    if not mode:
        return None
    meta = (config.get("meta_channels")
            if get_in_channels(config.get("meta_channels")) > 0 else None)
    if meta and readers_train and \
            readers_train[0].data_format != "memmap":
        if mode is True and role == "train":
            # forced mode promises 'raises if impossible' (see the budget
            # branch below) — zarr meta cannot pool, and silently training
            # at the ~9x-slower host-crop rate would hide the broken force
            raise ValueError(
                "use_device_pool: true with meta_channels on zarr surveys "
                "cannot pool (metadata channels are memmap-only, reference "
                "dataset.py:245-252); set use_device_pool: auto/false or "
                "drop meta_channels")
        print(f"{role} device pool disabled: meta_channels on zarr "
              "surveys use host crops (metadata is memmap-only)")
        return None
    window = tuple(config["patch_size"])
    freqs = sorted(config["frequencies"])
    if not readers_train:
        return None
    if budget_mb is None:
        budget_mb = config.get("device_pool_budget_mb", 2048)
    if not dp.fits_budget(readers_train, freqs, window, budget_mb):
        mb = dp.pool_bytes(readers_train, freqs, window) / 2 ** 20
        if mode == "auto" or role != "train":
            print(f"{role} device pool would need {mb:.0f} MB > "
                  f"{budget_mb:.0f} MB available (device_pool_budget_mb="
                  f"{config.get('device_pool_budget_mb', 2048)}); "
                  f"{role} uses host crops")
            return None
        # forced mode: fail loudly with the numbers instead of letting
        # the upload die minutes later in an opaque XLA
        # RESOURCE_EXHAUSTED (the docstring promises 'raises if
        # impossible' — review finding r3)
        raise ValueError(
            f"use_device_pool: true but the pool needs {mb:.0f} MB "
            f"> device_pool_budget_mb={budget_mb}; raise the budget, "
            "reduce the survey set, or set use_device_pool: auto/false")
    cls = (dp.DeviceSamplePool
           if readers_train[0].data_format == "memmap"
           else dp.ZarrSamplePool)
    return cls(readers_train, freqs, window, meta_channels=meta)


def run_training(config, checkpoint_dir, experiment_name=None,
                 logger=None, progress=True):
    fix_seeds(config["random_seed"])
    data_obj = make_partition(config)
    train_factory, test_factory, readers_train, readers_test = \
        make_datasets(config, data_obj)

    pool = maybe_build_pool(config, readers_train)
    if pool is not None:
        base_factory = train_factory

        def train_factory(seed_offset=0):  # noqa: F811 — pooled wrapper
            return base_factory(seed_offset).use_pool(pool)

    # validation pool: the periodic validate_model_training passes draw
    # test_iter x batch crops from the validation readers every log_step;
    # gathering those on device too removes the last bulk host-crop path
    # from the training loop (budget-gated like the train pool)
    # gate the validation pool against the budget REMAINING after the
    # train pool — both are resident simultaneously, and 'auto' must not
    # allocate up to 2x the configured HBM budget
    from ..data import device_pool as dp
    budget = int(config.get("device_pool_budget_mb", 2048))
    if pool is not None:
        budget -= int(dp.pool_bytes(readers_train,
                                    sorted(config["frequencies"]),
                                    tuple(config["patch_size"])) / 2 ** 20)
    pool_val = maybe_build_pool(config, readers_test,
                                budget_mb=max(budget, 0),
                                role="validation")
    if pool_val is not None:
        base_test_factory = test_factory

        def test_factory(seed_offset=0):  # noqa: F811 — pooled wrapper
            return base_test_factory(seed_offset).use_pool(
                pool_val, with_seabed=True)

    segpipe = SegPipeUNet(config, checkpoint_dir=checkpoint_dir,
                          experiment_name=experiment_name or "model")
    if pool is not None:
        segpipe.attach_pool(pool)
    if pool_val is not None:
        segpipe.attach_pool_val(pool_val)

    n_batches = int(config["iterations"])
    if config.get("resume_checkpoint"):
        # resume training (optimizer state + step counter) — a capability
        # the reference lacks (bare state_dicts, SURVEY.md §5); only the
        # remaining iterations are run
        segpipe.resume_from(config["resume_checkpoint"])
        resume_step = int(segpipe.state.step)
        n_batches = max(0, n_batches - resume_step)
        # salt the sampler seeds with the resumed step so the continued
        # run draws FRESH samples instead of replaying the beginning of
        # the seeded stream it already trained on (the samplers' RNG
        # state is not part of the checkpoint)
        resumed_factory = train_factory

        def train_factory(seed_offset=0):  # noqa: F811
            return resumed_factory(seed_offset + 100003 * resume_step)
        print(f"Resumed from step {resume_step}; "
              f"{n_batches} iterations remaining")

    train_batches = BatchPrefetcher(
        train_factory, config["batch_size"], n_batches,
        num_workers=config.get("num_workers", 4))

    # fresh validation draws EVERY pass (the reference's torch Dataset
    # advances the global RNG between validations, so each validation
    # epoch scores different random crops, train.py:84-110); a fixed
    # seed here would score the identical batch set six times and let
    # best-F1 selection overfit one sample set.  Still deterministic
    # given random_seed: pass k always draws the same (distinct) crops.
    import itertools
    _val_pass = itertools.count()

    def make_test_batches():
        ds = test_factory(seed_offset=777 + 1009 * next(_val_pass))
        return (ds.batch(config["batch_size"])
                for _ in range(int(config["test_iter"])))

    try:
        segpipe.train_model(train_batches, make_test_batches, logger,
                            progress=progress)
    finally:
        train_batches.close()
    return segpipe


def main(argv=None):
    args = get_argparse_parser("train").parse_args(argv)
    configuration = load_yaml_config(args.yaml_path)
    config = parse_config_options(configuration, args)

    experiment_name = Path(config["yaml_path"]).stem
    experiment_id = get_datetime_str()
    checkpoint_dir = Path("saved_models", experiment_name, experiment_id)
    log_dir = Path("tensorboard_logs", experiment_name, experiment_id)

    logger = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        logger = SummaryWriter(log_dir=str(log_dir))
        logger.add_text("Config", config_args_to_markdown(config),
                        global_step=0)
        shutil.copy(args.yaml_path, log_dir)
    except Exception as exc:  # TB optional
        logger = None  # a half-initialized writer must not half-log
        print(f"TensorBoard logging disabled: {exc}")

    print("Data mode:", config["data_mode"])
    start = time.time()
    run_training(config, checkpoint_dir, experiment_name, logger)
    print(f"Executed time for training (h): "
          f"{np.round((time.time() - start) / 3600, 2)}")


if __name__ == "__main__":
    main()
