# Container image for voicefixer_tpu, mirroring the reference's Docker story
# (/root/reference/Dockerfile: python base, pip install ., bake the model
# weights with --weight_prepare, CLI entrypoint) re-targeted at TPU VMs.
#
# Build on a Cloud TPU VM (or any host; jax falls back to CPU):
#   docker build -t voicefixer-tpu .
#   docker run --privileged voicefixer-tpu -i in.wav -o out.wav --mode 0

FROM python:3.12-slim-bookworm

ARG USERNAME=voicefixer
ARG USER_UID=1000
ARG USER_GID=1000
ARG WORKDIR_PATH=/opt/voicefixer_tpu
ENV PYTHONUNBUFFERED=1

# jax[tpu] pulls libtpu for TPU VMs; on non-TPU hosts jax uses the CPU
# backend and everything still runs (slower).
RUN pip install --no-cache-dir "jax[tpu]" numpy scipy \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax numpy scipy

RUN mkdir -p ${WORKDIR_PATH}
ADD . ${WORKDIR_PATH}
RUN groupadd --gid $USER_GID $USERNAME \
    && useradd --uid $USER_UID --gid $USER_GID -m -d ${WORKDIR_PATH} $USERNAME \
    && chown -R $USERNAME:$USERNAME ${WORKDIR_PATH}

WORKDIR ${WORKDIR_PATH}
USER $USERNAME
ENV PATH="${PATH}:${WORKDIR_PATH}/.local/bin"

RUN pip install --no-cache-dir .
# bake the converted weights into the image (reference Dockerfile:30);
# skip the compile-cache prewarm — image builds usually run on CPU-only
# build hosts, and a CPU-backend cache is useless on the TPU VM (the first
# on-device run warms the persistent cache instead)
RUN VF_SKIP_PREWARM=1 voicefixer-tpu --weight_prepare

ENTRYPOINT ["voicefixer-tpu"]
