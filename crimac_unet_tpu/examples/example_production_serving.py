"""Production serving walkthrough: checkpoint -> slab-mode survey
prediction -> (optionally) export the weights back to the reference.

Demonstrates the recommended serving configuration (README "Inference"):
  * ``infer_mode: slab`` — one fully-convolutional forward per chunk
    (~1.7x over patch windows when device-bound, end-metric-identical
    with trained weights, BASELINE.md r3);
  * BatchNorm folded into the convs (default at inference);
  * ``transfer_dtype: uint8`` — host-side dB transform, 8-bit codes on
    the h2d slab (4x fewer bytes than float32; measured |dF1| 0.0011
    at this preset, BASELINE.md) + bf16 MXU compute;
  * on a multi-chip mesh the slab forward runs sequence-parallel over
    the survey's ping axis automatically (mesh_devices).

For the AOT variant of this story (artifact on a bare-jax host) see
``example_aot_deployment.py``.

Run (synthesizes a small survey; substitute your own store + checkpoint):
  python -m crimac_unet_tpu.examples.example_production_serving
"""

import tempfile
import warnings


def main():
    import jax
    import jax.numpy as jnp

    from ..data.fixtures import make_zarr_survey
    from ..data.zarr_reader import DataReaderZarr
    from ..data.zarrlite import ZGroup
    from ..models.unet import build_unet
    from ..pipeline.engine import load_checkpoint  # noqa: F401 (real use)
    from ..pipeline.inference import (GriddedRunner,
                                      save_survey_predictions_zarr)

    with tempfile.TemporaryDirectory() as tmp:
        sv_path = make_zarr_survey(tmp, year=2019, n_echograms=1,
                                   H=200, W=600, seed=1)
        reader = DataReaderZarr(sv_path)

        cfg = {
            "patch_size": [64, 64], "patch_overlap": 8,
            "frequencies": [18, 38, 120, 200],
            "depth": 2, "start_filts": 8,       # demo-sized model; the
            # flagship is depth 5 / start_filts 64 with patch [256, 256]
            "fwd_batch": 32,
            "compute_dtype": "bfloat16",
            "infer_mode": "slab",               # production serving mode
            "transfer_dtype": "uint8",          # 8-bit dB-code h2d slabs
            "mesh_devices": 1,                  # 0 = all visible chips
        }
        model = build_unet(cfg)

        # real deployments load weights instead:
        #   payload = load_checkpoint("saved_models/<run>/best.msgpack")
        #   variables = {"params": payload["params"],
        #                "batch_stats": payload["batch_stats"]}
        # (reference .pt checkpoints load the same way — the path also
        # handles torch state dicts)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 4)), train=False)

        with warnings.catch_warnings():
            # demo geometry is pooling-aligned; the flagship geometry
            # warns about slab/patch pooling misalignment (expected and
            # documented — DIVERGENCES.md)
            warnings.simplefilter("ignore")
            runner = GriddedRunner(model, variables, cfg)

        # name the store <reader>_pred.zarr up front — the save_predict
        # CLI convention, and what school_eval's from-predictions mode
        # globs for below
        out = f"{tmp}/{reader.name}_pred.zarr"
        save_survey_predictions_zarr(runner, reader, out,
                                     preload_n_pings=300)
        group = ZGroup.open(out)
        ann = group["annotation"]
        print(f"wrote {out}: annotation {ann.shape} {ann.dtype} "
              f"(category [27, 1], reference on-disk contract)")

        # school-level detection from the store just written — no model
        # or device needed (pipeline/school_eval.py from-predictions
        # mode; also a CLI: crimac-school-eval with
        # school_from_predictions in the YAML)
        from ..pipeline.school_eval import school_eval_survey
        m = school_eval_survey(None, [reader], from_predictions=tmp,
                               prob_threshold=0.2)
        for cname, cm in m["categories"].items():
            print(f"school detection [{cname}]: mean AP "
                  f"{cm['mean_ap']:.3f}, {cm['n_detections']} detections"
                  f" / {cm['n_gt']} annotated schools")

        # optional: ship the trained weights back to the reference stack
        # (requires unfolded batch_stats, i.e. a training checkpoint):
        from ..models.torch_import import save_torch_checkpoint
        save_torch_checkpoint(variables, f"{tmp}/export_for_reference.pt")
        print("exported reference-loadable state dict: "
              "export_for_reference.pt")

        # AOT deployment artifact: the serving forward (scrub -> dB ->
        # folded-BN U-Net -> softmax) serialized as StableHLO — loads
        # and runs with jax alone, no flax / model source / checkpoint
        # (pipeline/export.py; also a CLI:
        #   python -m crimac_unet_tpu.pipeline.export ...).
        # This config serves in slab mode, so export the MATCHING slab
        # artifact: all dims symbolic (pooling-aligned), one artifact
        # for whole chunks of any geometry.
        from ..pipeline.export import (export_slab_predictor,
                                       load_predictor, save_exported)
        # The artifact's input dtype follows transfer_dtype — with this
        # config (uint8) the host feeds dB codes, exactly what the live
        # runner ships (see example_aot_deployment.py for the full
        # bare-host walkthrough).
        from ..pipeline.inference import _quantize_db_u8
        exported = export_slab_predictor(model, variables, cfg)
        save_exported(exported, f"{tmp}/unet_slab.stablehlo")
        predict = load_predictor(f"{tmp}/unet_slab.stablehlo")
        import numpy as np
        raw = np.abs(np.random.RandomState(1).standard_normal(
            (1, 128, 320, 4)).astype(np.float32)) * 1e-5
        probs = predict(_quantize_db_u8(raw))
        print(f"AOT slab artifact: unet_slab.stablehlo -> probs "
              f"{probs.shape} (symbolic chunk dims, uint8 dB-code "
              f"input, platforms {list(exported.platforms)})")


if __name__ == "__main__":
    main()
