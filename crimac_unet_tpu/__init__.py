"""crimac_unet_tpu — TPU-native (JAX/XLA/Flax/Pallas) framework for semantic
segmentation of multi-frequency fisheries echosounder data.

A ground-up rebuild of the capabilities of
`CRIMAC-WP4-Machine-learning/CRIMAC-classifiers-unet` (surveyed in
/root/repo/SURVEY.md): background / sandeel / other-fish segmentation of
Sv echograms at 18/38/120/200 kHz, with class-balanced random-patch
training and sliding-window full-survey inference written to zarr.

Architecture (TPU-first, not a port):
  - host data plane: readers (memmap + zarr), samplers, patch gather,
    zarr writing (``crimac_unet_tpu.data``)
  - device compute plane: the full per-patch transform chain (dB transform,
    label sentinel algebra, binary morphology, augmentation) as fused,
    batched jitted ops (``crimac_unet_tpu.ops``), feeding a Flax NHWC U-Net
    (``crimac_unet_tpu.models``)
  - parallelism: 1-D ``jax.sharding.Mesh`` data axis over ICI; gradients
    all-reduce inside jit (``crimac_unet_tpu.parallel``)
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml [project] version

import os as _os

# The installed axon TPU plugin ignores JAX_PLATFORMS; honour an explicit
# platform override through the config API before any backend initializes
# (used by tests/CI to force the virtual-CPU mesh in subprocesses).
if _os.environ.get("CRIMAC_JAX_PLATFORM"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms",
                           _os.environ["CRIMAC_JAX_PLATFORM"])
    except Exception:
        pass
