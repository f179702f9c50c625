"""AOT deployment walkthrough: checkpoint -> StableHLO artifact ->
bare-jax serving host.

The reference's deployment unit is a Docker image running its full torch
pipeline (reference dockerscript.py); the model cannot leave the
Python/torch stack.  Here the serving forward is exported ONCE
(pipeline/export.py) and the deployment host needs only jax — no flax,
no model source, no checkpoint parsing:

  * exporter side: ``export_checkpoint(ckpt, config, out)`` (or the CLI
    ``python -m crimac_unet_tpu.pipeline.export``) — with
    ``config_serving.yaml`` the artifact's input is the serving preset's
    uint8 dB codes (``transfer_dtype: uint8``), slab mode gives symbolic
    pooling-aligned chunk dims;
  * serving side: ``load_predictor(path)`` + the 10-line uint8 quantizer
    (``_quantize_db_u8``'s documented law: round((clip(dB,-75,0)+75)*255/75))
    — 4x fewer input bytes than float32, outputs bit-equal to the live
    GriddedRunner dequant path (tests/test_export.py).  With
    ``output_dtype: uint8`` the artifact also RETURNS 8-bit codes
    (round(p*255); dequant = code/255) — half the output bytes, the
    measured-|dF1|-free serving quantization (BASELINE.md).

Run (synthesizes everything; substitute your own checkpoint + stores):
  python -m crimac_unet_tpu.examples.example_aot_deployment
"""

import tempfile
from pathlib import Path


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ..models.unet import build_unet
    from ..pipeline.export import (export_slab_predictor, load_predictor,
                                   save_exported)
    from ..pipeline.inference import _quantize_db_u8

    # ---- exporter side (has the framework + checkpoint) ----------------
    cfg = {
        "patch_size": [64, 64], "frequencies": [18, 38, 120, 200],
        "depth": 2, "start_filts": 8,     # demo-sized; flagship is 5/64
        "compute_dtype": "bfloat16",
        "infer_mode": "slab",             # whole-chunk forward
        "transfer_dtype": "uint8",        # serving preset: dB-code input
        "output_dtype": "uint8",          # serving preset: round(p*255)
                                          # codes out (half the bytes;
                                          # dequant = code/255)
    }
    model = build_unet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 4)), train=False)
    # real deployments: variables = load_checkpoint("best.msgpack")

    with tempfile.TemporaryDirectory() as tmp:
        artifact = Path(tmp) / "unet_serving.stablehlo"
        save_exported(export_slab_predictor(model, variables, cfg),
                      artifact)
        print(f"exported {artifact.name}: "
              f"{artifact.stat().st_size / 1e6:.1f} MB")

        # ---- serving side (bare jax + the artifact) --------------------
        predict = load_predictor(artifact)

        # a raw sv chunk as any reader would hand it over (range x ping
        # dims must be multiples of 2**(depth-1) — the slab alignment)
        rng = np.random.RandomState(7)
        sv_chunk = rng.lognormal(np.log(1e-6), 2.5,
                                 (1, 128, 256, 4)).astype(np.float32)
        sv_chunk[0, 10:14, 30:50, :] = np.nan     # dropouts ride as code 0

        codes = _quantize_db_u8(sv_chunk)         # the whole host-side prep
        out = np.asarray(predict(codes))          # uint8 probability codes
        assert out.dtype == np.uint8
        probs = out.astype(np.float32) / 255.0    # the dequant contract
        assert probs.shape == (1, 128, 256, 3)
        assert np.isfinite(probs).all()
        assert np.allclose(probs.sum(-1), 1.0, atol=2 / 255 + 1e-3)
        print(f"served chunk {sv_chunk.shape} as {codes.nbytes / 1e3:.0f} kB "
              f"of uint8 codes ({sv_chunk.nbytes / codes.nbytes:.0f}x fewer "
              f"bytes than float32); sandeel prob range "
              f"[{probs[..., 1].min():.3f}, {probs[..., 1].max():.3f}]")
    return probs


if __name__ == "__main__":
    main()
