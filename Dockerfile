# Docker application of face re-identification — TPU-native rebuild of the
# reference image (reference docker/code/Dockerfile:1-20: TF-GPU base, pip
# requirements, pretrained weights wget-baked in, helper scripts chmod'd).
#
# Build:  docker build -t face-vijnana-yolov3-tpu .
# Run:    docker run --privileged -it face-vijnana-yolov3-tpu
#         (on a Cloud TPU VM; --privileged exposes the TPU devices)
FROM python:3.12-slim
WORKDIR /usr/src/app
COPY . .
RUN apt-get update && apt-get -y install --no-install-recommends wget \
    && rm -rf /var/lib/apt/lists/*
# jax[tpu] pulls libtpu; the package itself installs the four console scripts
# (fvy-face-detection, fvy-face-identification, fvy-yolov3-detect, fvy-evaluate)
RUN pip install --no-cache-dir "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir .
# Pretrained artifacts baked into the image, exactly as the reference bakes
# its darknet weights and .hd5 checkpoints (docker/code/Dockerfile:11-15).
# The legacy .hd5/.pobj checkpoints load through core/keras_import (h5) and
# the registry pickle reader unchanged.
RUN wget https://pjreddie.com/media/files/yolov3.weights -O yolov3.weights
RUN wget "https://www.dropbox.com/s/3nizyylif4s9kr7/face_detector.hd5?dl=1" -O face_detector.hd5
RUN wget "https://www.dropbox.com/s/j414cgv62e8lq1t/yolov3_base.hd5?dl=1" -O yolov3_base.hd5
RUN wget "https://www.dropbox.com/s/blyf39a4qxmqiyd/db_facial_id.pobj?dl=1" -O db_facial_id.pobj
RUN chmod 766 scripts/train.sh scripts/test.sh scripts/reproduce_reference.sh
CMD ["/bin/bash"]
