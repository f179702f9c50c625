"""Training end-to-end in zarr data mode (exercises the zarr sampler
battery) + executable examples."""

import numpy as np
import pytest

from crimac_unet_tpu.config import parse_config_options
from crimac_unet_tpu.data.fixtures import make_zarr_survey
from crimac_unet_tpu.pipeline.train import run_training


def test_zarr_mode_training(tmp_path):
    make_zarr_survey(tmp_path, year=2017, n_echograms=2, H=80, W=200,
                     seed=17, layout="nested")
    cfg = parse_config_options({
        "random_seed": 2, "data_mode": "zarr",
        "path_to_zarr_files": str(tmp_path),
        "patch_size": [32, 32], "batch_size": 2, "iterations": 4,
        "test_iter": 1, "log_step": 2, "lr_step": 2, "num_workers": 2,
        "depth": 2, "start_filts": 4,
        "partition_train": "selected surveys", "train_surveys": [2017],
        "validation_surveys": [2017], "compute_dtype": "float32",
        "train_dtype": "float32", "mesh_devices": 1})
    ckpt = tmp_path / "run"
    pipe = run_training(cfg, ckpt, progress=False)
    assert (ckpt / "best.msgpack").exists()
    assert np.isfinite(pipe.best_F1_val)
    # the ZarrSamplePool engages by default for surveys that fit HBM
    assert pipe.pool is not None
    assert pipe.pool.data_format == "zarr"


def test_examples_run(capsys):
    from crimac_unet_tpu.examples import (example_aot_deployment,
                                          example_ek60_onboarding,
                                          example_production_serving,
                                          example_samplers,
                                          example_zarr_reader)
    e = example_ek60_onboarding.main([])
    assert e.shape[0] > 0
    example_zarr_reader.main([])
    example_samplers.main()
    example_production_serving.main()
    probs = example_aot_deployment.main()
    assert probs.shape[-1] == 3
    out = capsys.readouterr().out
    assert "Survey:" in out and "Batch:" in out
    assert "annotation (2, " in out and "export_for_reference" in out
    assert "fewer\nbytes than float32" in out.replace("  ", " ") \
        or "fewer bytes than float32" in out


def test_batch_prefetcher_surfaces_worker_crash():
    """A crash inside a prefetch worker must propagate to the consumer
    (not hang the queue or silently drop batches)."""
    import pytest

    from crimac_unet_tpu.data.dataset import BatchPrefetcher

    class Boom(RuntimeError):
        pass

    class BadDataset:
        def __init__(self, n_ok):
            self.n_ok = n_ok

        def batch(self, bs):
            if self.n_ok <= 0:
                raise Boom("worker died")
            self.n_ok -= 1
            return {"data": np.zeros((bs, 1))}

    pf = BatchPrefetcher(lambda seed_offset=0: BadDataset(2), 2, 6,
                         num_workers=1)
    try:
        with pytest.raises(Boom):
            for _ in pf:
                pass
    finally:
        pf.close()
