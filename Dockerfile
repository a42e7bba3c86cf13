# dro-sfm-tpu deployment image for Cloud TPU VMs.
#
# Replaces the reference's implicit CUDA/Horovod environment
# (`/root/reference/run.sh`, readme install snippets) with a TPU-ready
# container: jax[tpu] against Google's libtpu releases, plus the runtime
# deps of the training/eval/inference CLIs. Build on or for a TPU VM:
#
#   docker build -t dro-sfm-tpu .
#   docker run --privileged --network=host \
#       -v /dev:/dev -v $DATA:/data dro-sfm-tpu \
#       python scripts/train.py configs/train_kitti_sup.yaml
#
# (--privileged + /dev for TPU device access; on TPU pods run the same
# container on every worker — see README "Multi-host launch".)
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        git ffmpeg libgl1 libglib2.0-0 \
    && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir \
        flax optax chex einops numpy opencv-python-headless pillow pyyaml \
        matplotlib h5py pytest wandb

WORKDIR /workspace/dro-sfm-tpu
COPY . .

ENV PYTHONUNBUFFERED=1
CMD ["python", "scripts/train.py", "configs/overfit_synthetic.yaml"]
