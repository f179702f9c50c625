# Production inference image (reference /root/reference/Dockerfile:1-11,
# rebased from pytorch/pytorch onto a JAX TPU base).
#
# Build:  docker build -t crimac-unet-tpu .
# Run:    docker run -e MODELWEIGHTS=... -e SURVEY=... -e CONFIG=... \
#             -e OUTPUT_DIR=/out -v ...:/out crimac-unet-tpu
FROM python:3.12-slim

RUN pip install --no-cache-dir "jax[tpu]" flax optax pyyaml numpy scipy \
    pandas scikit-learn matplotlib tqdm

COPY crimac_unet_tpu /app/crimac_unet_tpu
WORKDIR /app

CMD ["python", "-m", "crimac_unet_tpu.pipeline.dockerscript"]
