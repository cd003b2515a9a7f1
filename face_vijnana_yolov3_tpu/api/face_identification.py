"""Face identification entry point: data / train / evaluate / test / fid_db.

Mode-for-mode equivalent of the reference `face_identification.py` main
(reference src/space/face_identification.py:1716-1776), emitting
`solution_fi.csv` rows `file,subject_id,x,y,w,h,score`, `results_fi/` overlays,
and the subject DB artifacts (see data/facedb.py).

TPU-native differences: all crops of an image embed in ONE padded batched device
call (the reference runs fid_extractor.predict per crop — one device round trip
each, :915), and registry matching is a device distance-matrix op instead of a
python loop over subjects (:919-925).
"""

from __future__ import annotations

import glob
import os
import pickle
import shutil
import sys
import time

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.api.config import Conf, load_conf, apply_overrides
from face_vijnana_yolov3_tpu.api.face_detection import FaceDetectorPipeline
from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel
from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
from face_vijnana_yolov3_tpu.ops.similarity import match_embeddings
from face_vijnana_yolov3_tpu.utils.io import imsave
from face_vijnana_yolov3_tpu.utils.runtime import tpu_compiler_options

DEBUG = True

RESOURCE_TYPE_UCCS = "uccs"
RESOURCE_TYPE_VGGFACE2 = "vggface2"

_EMBED_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


def create_db_fi(fi_conf):
    """`data` mode: build the subject-face DB (reference create_db_fi,
    face_identification.py:78-210). Model-free, like the reference."""
    from face_vijnana_yolov3_tpu.data import facedb

    image_size = (
        fi_conf.nn_arch.image_size
        if not isinstance(fi_conf.nn_arch, dict)
        else fi_conf.nn_arch["image_size"]
    )
    if fi_conf.resource_type == RESOURCE_TYPE_UCCS:
        facedb.create_subject_db_uccs(fi_conf.raw_data_path, image_size)
    elif fi_conf.resource_type == RESOURCE_TYPE_VGGFACE2:
        facedb.create_subject_db_vggface2(fi_conf.raw_data_path, image_size)
    else:
        raise ValueError("resource type is not valid.")


class FaceIdentifierPipeline:
    def __init__(self, conf: Conf, *, precision: str = "float32"):
        self.conf = conf.fi_conf
        self.fd_conf = conf.fd_conf
        self.hps = vars(self.conf.hps)
        self.nn_arch = vars(self.conf.nn_arch)
        self.image_size = self.nn_arch["image_size"]
        self.precision = precision
        self.model = FaceIdentifierModel(
            image_size=self.image_size, dense1_dim=self.nn_arch["dense1_dim"]
        )

        if self.conf.model_loading:
            if self.conf.model_path.endswith((".h5", ".hd5")):
                # Drop-in load of the reference's face_identifier.h5
                # (face_identification.py:305).
                from face_vijnana_yolov3_tpu.core.keras_import import (
                    identifier_from_keras_h5,
                )

                self.params, self.state = identifier_from_keras_h5(
                    self.conf.model_path
                )
            else:
                from face_vijnana_yolov3_tpu.core.checkpoints import (
                    load_checkpoint,
                )

                ckpt = load_checkpoint(self.conf.model_path)
                self.params, self.state = ckpt["params"], ckpt["state"]
                self.opt_state = ckpt.get("opt_state")
        elif (self.conf.yolov3_base_model_load
              and os.path.exists("yolov3_base.h5")):
            # Reference fast path: cached trunk h5, shared with the detector
            # (FaceIdentifier.YOLOV3Base is a verbatim copy of FaceDetector's,
            # face_identification.py:397-614, incl. the cache load at :404).
            from face_vijnana_yolov3_tpu.core.keras_import import (
                collect_keras_weights,
                trunk_from_keras,
            )

            self.params, self.state = trunk_from_keras(
                collect_keras_weights("yolov3_base.h5")
            )
            fresh, _ = self.model.init(jax.random.PRNGKey(1))
            self.params["dense1"] = fresh["dense1"]
        elif os.path.exists(self.conf.weights_path):
            self.params, self.state = self.model.init_from_darknet(
                self.conf.weights_path, jax.random.PRNGKey(1)
            )
            from face_vijnana_yolov3_tpu.core.keras_import import (
                save_trunk_keras_h5,
            )

            # Same base cache the reference writes (face_identification.py:612)
            save_trunk_keras_h5(self.params, self.state, "yolov3_base.h5")
        else:
            print(
                f"[face_identification] {self.conf.weights_path} not found — "
                "random-initializing trunk"
            )
            self.params, self.state = self.model.init(jax.random.PRNGKey(1))
        if not hasattr(self, "opt_state"):
            self.opt_state = None

        # Nested full detector, like the reference's FaceIdentifier.__init__
        # (face_identification.py:373).
        self.fd = FaceDetectorPipeline(self.fd_conf, precision=precision)
        self._embed_cache: dict[int, object] = {}
        self._embed_raw_cache: dict[int, object] = {}
        self._roi_cache: dict[tuple, object] = {}
        self._q_embed = None  # int8 qparams, calibrated on first embed batch

    # -------------------------------------------------------------- embedding

    @property
    def _hybrid_front(self) -> bool:
        """bfloat16 embed with the int8 front guard (conf.bf16_front_mode),
        as in FaceDetectorPipeline."""
        return (self.precision == "bfloat16"
                and getattr(self.conf, "bf16_front_mode", "f32") == "int8")

    def _embed_raw(self, bucket: int):
        """Unjitted embed fn — for nesting inside fused programs (the ROI
        identify program): tracing a compiler_options-carrying jit inside
        another jit is a JAX error (options are top-level-only)."""
        if bucket not in self._embed_raw_cache:
            if self.precision == "int8" or self._hybrid_front:
                # Full int8 trunk, or (hybrid) int8 guard segments + folded
                # bf16 rest via the quant mixed-tail mechanism.
                qparams = self._q_embed

                def run(images):
                    return self.model.embed_quant(qparams, images)

            elif self.precision == "bfloat16":
                # Folded serving fast path, with the f32 front guard: the
                # trained trunk amplifies bf16 rounding of conv_0/1 on rare
                # crops, rotating the L2-normalized embedding
                # (models/identifier.embed_folded docstring).
                folded = self.model.fold(self.params, self.state)
                front = getattr(self.conf, "bf16_f32_front", 2)

                def run(images):
                    return self.model.embed_folded(
                        folded, images, compute_dtype=jnp.bfloat16,
                        f32_front_blocks=front,
                    )

            else:
                params, state = self.params, self.state

                def run(images):
                    emb, _ = self.model.embed(
                        params, state, images, train=False,
                        compute_dtype=jnp.float32,
                    )
                    return emb

            self._embed_raw_cache[bucket] = run
        return self._embed_raw_cache[bucket]

    def _embed_fn(self, bucket: int):
        if bucket not in self._embed_cache:
            self._embed_cache[bucket] = jax.jit(
                self._embed_raw(bucket),
                compiler_options=tpu_compiler_options("serving"),
            )
        return self._embed_cache[bucket]

    def embed(self, images: np.ndarray) -> np.ndarray:
        """fid extractor: (B,S,S,3) → (B,D), bucket-padded so a handful of
        compiled programs serve every batch size. precision='int8'
        auto-calibrates the quantized trunk on the first batch."""
        if ((self.precision == "int8" or self._hybrid_front)
                and getattr(self, "_q_embed", None) is None):
            folded = self.model.fold(self.params, self.state)
            pct = getattr(self.conf, "int8_calib_percentile", 0.0) or None
            tail = 0
            if self._hybrid_front:
                n_blocks = sum(1 for op in self.model.ops if op[0] == "save")
                front = max(1, int(getattr(self.conf, "bf16_f32_front", 2))
                            or 1)
                tail = n_blocks - (front - 1)
            self._q_embed = jax.device_put(
                self.model.quantize(
                    folded, jnp.asarray(images[:16], jnp.float32),
                    percentile=pct, bf16_tail_blocks=tail,
                    bias_correct=bool(
                        getattr(self.conf, "int8_bias_correct", False)),
                )
            )
        n = images.shape[0]
        bucket = next((b for b in _EMBED_BUCKETS if b >= n), None)
        if bucket is None:
            out = [
                self.embed(images[s : s + _EMBED_BUCKETS[-1]])
                for s in range(0, n, _EMBED_BUCKETS[-1])
            ]
            return np.concatenate(out)
        padded = images
        if n < bucket:
            padded = np.concatenate(
                [images, np.zeros((bucket - n, *images.shape[1:]), images.dtype)]
            )
        emb = self._embed_fn(bucket)(jnp.asarray(padded, jnp.float32))
        return np.asarray(emb)[:n]

    # -------------------------------------------------------------- db names

    def _db_names(self):
        if self.conf.resource_type == RESOURCE_TYPE_UCCS:
            return ("subject_image_db.csv", "subject_faces",
                    "subject_facial_ids.h5", "ref_facial_id_db.pickle",
                    "img_triplet_pairs.pickle")
        if self.conf.resource_type == RESOURCE_TYPE_VGGFACE2:
            return ("subject_image_vggface2_db.csv", "subject_faces_vggface2",
                    "subject_facial_vggface2_ids.h5",
                    "ref_facial_id_vggface2_db.pickle",
                    "img_triplet_pairs_vggface2.pickle")
        raise ValueError("resource type is not valid.")

    # -------------------------------------------------------------- modes

    def create_db(self):
        create_db_fi(self.conf)

    def train(self):
        from face_vijnana_yolov3_tpu.data.facedb import TripletDataset
        from face_vijnana_yolov3_tpu.train.trainer import train_identifier

        db_csv, faces_subdir, _, _, pairs_pickle = self._db_names()
        dataset = TripletDataset(
            self.conf.raw_data_path,
            db_csv=db_csv,
            faces_subdir=faces_subdir,
            pairs_pickle=pairs_pickle,
            load_flag=False,
        )
        import jax.numpy as jnp

        from face_vijnana_yolov3_tpu.parallel import mesh as mesh_lib

        model_axis = int(getattr(self.conf, "model_axis", 1))
        # Keras-style model_path (face_identifier.h5, the reference's train
        # artifact, face_identification.py:643): train against a sibling
        # Orbax dir, export the h5 at the end (see FaceDetectorPipeline.train).
        keras_h5 = self.conf.model_path.endswith((".h5", ".hd5"))
        ckpt_path = (self.conf.model_path + ".orbax" if keras_h5
                     else self.conf.model_path)
        self.params, self.state, losses = train_identifier(
            self.model,
            self.params,
            self.state,
            dataset,
            self.hps,
            mesh=mesh_lib.make_mesh(model_axis=model_axis),
            checkpoint_path=ckpt_path,
            init_opt_state=self.opt_state,
            history_path=ckpt_path + "_history.jsonl",
            # bfloat16 pipeline precision = mixed-precision training; int8 is
            # serving-only, train falls back to strict f32.
            compute_dtype=(
                jnp.bfloat16 if self.precision == "bfloat16" else None
            ),
            checkpoint_every=getattr(self.conf, "checkpoint_every", 0),
            mining=getattr(self.conf, "negative_mining", "random"),
            remat=getattr(self.conf, "train_remat", False),
            fakequant=getattr(self.conf, "train_qat", False),
        )
        self._embed_cache.clear()
        self._embed_raw_cache.clear()
        self._roi_cache.clear()  # fused ROI programs capture the embed closure
        # Stale int8 calibration would otherwise keep serving pre-training
        # quantized weights; next embed() re-folds + re-calibrates.
        self._q_embed = None
        print("Save the model.")
        if keras_h5:
            from face_vijnana_yolov3_tpu.core.keras_import import (
                save_identifier_keras_h5,
            )

            save_identifier_keras_h5(self.params, self.state,
                                     self.conf.model_path)
        return losses

    def create_face_reconst_model(self):
        """Build (or load) the experimental reconstruction decoder
        (reference create_face_reconst_model, face_identification.py:1155-1488;
        gated by conf face_vijana_recon_load like the reference)."""
        from face_vijnana_yolov3_tpu.models.recon import FaceReconstructionModel
        from face_vijnana_yolov3_tpu.core.checkpoints import (
            checkpoint_exists, load_checkpoint, save_checkpoint,
        )

        self.recon_model = FaceReconstructionModel(
            image_size=self.image_size, dense1_dim=self.nn_arch["dense1_dim"]
        )
        ckpt_path = "face_vijnana_recon_tpu"
        if self.conf.face_vijana_recon_load and checkpoint_exists(ckpt_path):
            ckpt = load_checkpoint(ckpt_path)
            self.recon_params, self.recon_state = ckpt["params"], ckpt["state"]
            return
        self.recon_params, self.recon_state = self.recon_model.init(
            jax.random.PRNGKey(2), self.params
        )
        save_checkpoint(
            ckpt_path, {"params": self.recon_params, "state": self.recon_state}
        )

    def reconstruct(self, facial_ids: np.ndarray) -> np.ndarray:
        """(B, dense1_dim) ids → (B, S, S, 3) reconstructed images."""
        if not hasattr(self, "recon_model"):
            self.create_face_reconst_model()
        out, _ = self.recon_model.apply(
            self.recon_params, self.recon_state, jnp.asarray(facial_ids)
        )
        return np.asarray(out)

    def make_facial_ids_db(self):
        from face_vijnana_yolov3_tpu.data.facedb import make_facial_ids_db

        db_csv, faces_subdir, ids_h5, _, _ = self._db_names()
        make_facial_ids_db(
            self.embed, self.conf.raw_data_path, db_csv, faces_subdir, ids_h5
        )

    def register_facial_ids(self):
        from face_vijnana_yolov3_tpu.data.facedb import register_facial_ids

        db_csv, faces_subdir, _, reg_pickle, _ = self._db_names()
        return register_facial_ids(
            self.embed, self.conf.raw_data_path, db_csv, faces_subdir, reg_pickle
        )

    # -------------------------------------------------------------- identify

    def _load_registry(self):
        _, _, _, reg_pickle, _ = self._db_names()
        with open(reg_pickle, "rb") as f:
            registry = pickle.load(f)
        subject_ids = list(registry.keys())
        reg = np.asarray([registry[s] for s in subject_ids], np.float32)
        return subject_ids, reg

    def _identify_image(self, image_o: np.ndarray, boxes: np.ndarray,
                        subject_ids, reg_embs):
        """Crop → batched embed → device registry match; returns row dicts.

        Crop semantics are the reference's exactly (face_identification.py:
        872-912): int() box corners, the (t-1):(b-1) off-by-one slice from the
        RAW image, /255, INTER_CUBIC letterbox; boxes whose crop has zero
        width/height are skipped.
        """
        crops, keep = [], []
        for k in range(boxes.shape[0]):
            l, t, r, b = (int(boxes[k, 0]), int(boxes[k, 1]),
                          int(boxes[k, 2]), int(boxes[k, 3]))
            crop = image_o[(t - 1):(b - 1), (l - 1):(r - 1), :]
            if crop.shape[0] == 0 or crop.shape[1] == 0:
                continue
            lb, _ = letterbox_host(crop / 255, self.image_size, "cubic")
            crops.append(lb)
            keep.append(k)
        if not crops:
            return []
        embs = self.embed(np.asarray(crops, np.float32))
        best_idx, best_dist = match_embeddings(
            jnp.asarray(embs), jnp.asarray(reg_embs)
        )
        best_idx, best_dist = np.asarray(best_idx), np.asarray(best_dist)
        rows = []
        for j, k in enumerate(keep):
            if best_dist[j] > self.hps["sim_th"]:
                continue
            rows.append(
                {
                    "box_index": k,
                    "subject_id": subject_ids[int(best_idx[j])],
                    "xmin": boxes[k, 0],
                    "ymin": boxes[k, 1],
                    "xmax": boxes[k, 2],
                    "ymax": boxes[k, 3],
                    "score": boxes[k, 4],
                }
            )
        return rows

    def _roi_fused_fn(self, bucket: int, n_sub: int, n_images: int,
                      max_h: int, max_w: int, window_h: int, window_w: int,
                      n_reg: int, staged_dtype):
        """ONE jitted program per detect chunk: per-ROI dynamic-slice window
        → letterbox matmuls → embed trunk → registry match, with an internal
        `lax.map` over `n_sub` sub-batches of `bucket` ROIs (bounds peak
        memory at the bucket level while keeping the whole chunk in a single
        dispatch — per-call RPC latency over the tunneled device is ~100 ms).
        Inputs arrive as one packed f32 array (ops/roi.pack_roi_operands),
        outputs leave as one (n_sub, bucket, 2) array: one upload, one
        execute, one download per chunk."""
        key = (bucket, n_sub, n_images, max_h, max_w, window_h, window_w,
               n_reg, np.dtype(staged_dtype).str)
        if key not in self._roi_cache:
            from face_vijnana_yolov3_tpu.ops.roi import (
                roi_letterbox_device_windowed,
                unpack_roi_operands,
            )

            inner_embed = self._embed_raw(bucket)
            image_size = self.image_size

            @partial(jax.jit,
                     compiler_options=tpu_compiler_options("serving"))
            def run(staged, packed, reg):
                def sub(p):
                    org, ri, rw, ci, cw = unpack_roi_operands(p, image_size)
                    crops = roi_letterbox_device_windowed(
                        staged, org, ri, rw, ci, cw,
                        window_h=window_h, window_w=window_w,
                    )
                    emb = inner_embed(crops)
                    idx, dist = match_embeddings(emb, reg)
                    return jnp.stack([idx.astype(jnp.float32), dist], -1)

                return jax.lax.map(sub, packed)  # (n_sub, bucket, 2)

            self._roi_cache[key] = run
        return self._roi_cache[key]

    def _identify_chunk_device(self, images: list, boxes_list: list,
                               subject_ids, reg_dev, staged_dev=None):
        """Device-fused identify for a whole detect chunk: every image's
        crop+cubic-letterbox runs as windowed MXU matmuls against the staged
        batch (ops/roi.py), fused with embed + registry match — ONE program
        call per ~64 ROIs across ALL images of the chunk. Per-call dispatch
        latency over the tunneled device (~100 ms) dominates small per-image
        programs, so batching the chunk is worth ~batch_size× on wall clock.

        Host work per box is a ~13 KB tap table instead of a single-core cv2
        cubic resize + f32 crop upload.

        staged_dev: the detect pass's (B,maxH,maxW,3) device staging buffer
        (detect_batch_fused return_staged) — the originals then never upload
        a second time; omitted, the chunk stages here.

        Same observable semantics as the host `_identify_image` (crop window
        off-by-one, zero-size skip, sim_th gate) at float-rounding parity —
        the reference host math is f64, this path is f32 HIGHEST.

        Returns a list of per-image row lists.
        """
        from face_vijnana_yolov3_tpu.ops.roi import (
            build_roi_windows,
            stack_roi_taps,
            window_bucket,
            zero_taps,
        )

        owners: list[tuple[int, int]] = []  # ROI → (image j, box k)
        wins: list[tuple[int, int, int, int]] = []
        for j, (im, bx) in enumerate(zip(images, boxes_list)):
            keep_j, wins_j = build_roi_windows(bx, im.shape[0], im.shape[1])
            owners.extend((j, k) for k in keep_j)
            wins.extend(wins_j)
        out_rows: list[list] = [[] for _ in images]
        if not owners:
            return out_rows
        n = len(owners)

        if staged_dev is not None:
            staged = staged_dev
            bh, bw = int(staged.shape[1]), int(staged.shape[2])
            staged_np_dtype = np.dtype(str(staged.dtype))
        else:
            # Stage the chunk once (uint8: 4x less h2d than f32, /255 fuses
            # into the resize); dims bucket to 128-multiples to bound program
            # count across a mixed-resolution test set.
            bh = -(-max(im.shape[0] for im in images) // 128) * 128
            bw = -(-max(im.shape[1] for im in images) // 128) * 128
            dtype = (np.uint8 if all(im.dtype == np.uint8 for im in images)
                     else np.float32)
            staged = np.zeros((len(images), bh, bw, 3), dtype)
            for j, im in enumerate(images):
                if dtype == np.uint8:
                    staged[j, : im.shape[0], : im.shape[1]] = im
                else:
                    # Float staging must pre-normalize: the device resize
                    # treats f32 staged pixels as already in [0,1] (only the
                    # uint8 path fuses a /255), while the host twin ALWAYS
                    # divides the raw crop by 255 (_identify_image).
                    staged[j, : im.shape[0], : im.shape[1]] = (
                        np.asarray(im, np.float32) / 255.0
                    )
            staged_np_dtype = staged.dtype

        # Windowed fast path: each ROI dynamic-slices a bucketed window of
        # its image at its origin, so the resize matmuls contract over ~the
        # crop extent instead of the full staged axes.
        wh = window_bucket(max(w[2] for w in wins), bh)
        ww = window_bucket(max(w[3] for w in wins), bw)
        origins = np.zeros((n, 3), np.int32)
        for r, ((j, _k), (y0, x0, _ch, _cw)) in enumerate(zip(owners, wins)):
            origins[r] = (j, min(y0, bh - wh), min(x0, bw - ww))
        ri, rw, ci, cw = stack_roi_taps(wins, self.image_size, origins[:, 1:])

        bucket = next((b for b in _EMBED_BUCKETS if b >= n),
                      _EMBED_BUCKETS[-1])
        # Whole chunk in one program: pad the ROI count to a power-of-2
        # number of bucket-size sub-batches (bounds the set of compiled
        # programs; padding ROIs are zero-tap black crops).
        n_sub = -(-n // bucket)
        n_sub = 1 << (n_sub - 1).bit_length()
        total = n_sub * bucket
        if n < total:
            zri, zrw, zci, zcw = zero_taps(self.image_size)
            pad = total - n
            origins = np.concatenate([origins,
                                      np.zeros((pad, 3), np.int32)])
            ri = np.concatenate([ri, np.tile(zri, (pad, 1, 1))])
            rw = np.concatenate([rw, np.tile(zrw, (pad, 1, 1))])
            ci = np.concatenate([ci, np.tile(zci, (pad, 1, 1))])
            cw = np.concatenate([cw, np.tile(zcw, (pad, 1, 1))])

        if ((self.precision == "int8" or self._hybrid_front)
                and self._q_embed is None):
            # int8 needs calibrated qparams before the embed closure is built;
            # calibrate on REAL crops via a one-off letterbox-only program.
            from face_vijnana_yolov3_tpu.ops.roi import (
                roi_letterbox_device_windowed,
            )

            k = min(16, n)
            crops = jax.jit(
                lambda im, og, a, b, c, d: roi_letterbox_device_windowed(
                    im, og, a, b, c, d, window_h=wh, window_w=ww
                )
            )(jnp.asarray(staged), jnp.asarray(origins[:k]),
              jnp.asarray(ri[:k]), jnp.asarray(rw[:k]),
              jnp.asarray(ci[:k]), jnp.asarray(cw[:k]))
            self.embed(np.asarray(crops))  # triggers calibration

        from face_vijnana_yolov3_tpu.ops.roi import pack_roi_operands

        packed = pack_roi_operands(origins, ri, rw, ci, cw).reshape(
            n_sub, bucket, -1
        )
        # key on the STAGED batch dim, not len(images): detect pads its
        # staging batch to batch_size, so the last (short) chunk reuses the
        # same compiled program instead of recompiling
        run = self._roi_fused_fn(
            bucket, n_sub, int(staged.shape[0]), bh, bw, wh, ww,
            int(reg_dev.shape[0]), staged_np_dtype,
        )
        out = np.asarray(
            run(jnp.asarray(staged), jnp.asarray(packed), reg_dev)
        ).reshape(total, 2)
        best_idx = out[:, 0].astype(np.int32)
        best_dist = out[:, 1].astype(np.float32)

        for r, (j, k) in enumerate(owners):
            if best_dist[r] > self.hps["sim_th"]:
                continue
            boxes = boxes_list[j]
            out_rows[j].append(
                {
                    "box_index": k,
                    "subject_id": subject_ids[int(best_idx[r])],
                    "xmin": boxes[k, 0],
                    "ymin": boxes[k, 1],
                    "xmax": boxes[k, 2],
                    "ymax": boxes[k, 3],
                    "score": boxes[k, 4],
                }
            )
        return out_rows

    def _identify_image_device(self, image_o: np.ndarray, boxes: np.ndarray,
                               subject_ids, reg_dev, staged_dev=None):
        """Single-image view of `_identify_chunk_device` (same program)."""
        staged = staged_dev[None] if staged_dev is not None else None
        return self._identify_chunk_device(
            [image_o], [boxes], subject_ids, reg_dev, staged_dev=staged
        )[0]

    def _run_identification(self, draw_results: bool):
        import pandas as pd

        test_path = self.conf.test_path
        output_file_path = self.conf.output_file_path
        file_names = glob.glob(os.path.join(test_path, "*.jpg"))
        subject_ids, reg_embs = self._load_registry()
        device_roi = (
            os.environ.get("FVY_DEVICE_ROI") == "1"
            or getattr(self.conf, "device_roi", False)
        )
        reg_dev = jnp.asarray(reg_embs) if device_roi else None

        gt_groups = None
        if draw_results:
            results_dir = os.path.join(test_path, "results_fi")
            if os.path.isdir(results_dir):
                shutil.rmtree(results_dir)
            os.mkdir(results_dir)
            gt_df = pd.read_csv(os.path.join(test_path, "validation.csv"))
            gt_groups = gt_df.groupby("FILE")

        batch_size = int(vars(self.fd_conf.hps)["batch_size"])

        # scaled_decode=False on both paths: the crop-from-original quirk
        # (and result drawing) needs full-resolution pixels.
        def _stream():
            if device_roi:
                # Chunk-fused device path: all of a detect chunk's crops
                # embed+match in one program call (per-call dispatch latency
                # dominates per-image programs on the tunneled device), and
                # yield_staged reuses the detect pass's staging buffer (one
                # upload per image total).
                for chunk, originals, _geoms, boxes_list, staged_dev in (
                    self.fd._iter_detection_chunks(
                        file_names, batch_size,
                        scaled_decode=False, yield_staged=True,
                    )
                ):
                    rows_per_img = self._identify_chunk_device(
                        originals, boxes_list, subject_ids, reg_dev,
                        staged_dev=staged_dev,
                    )
                    for k, fn in enumerate(chunk):
                        yield fn, originals[k], boxes_list[k], rows_per_img[k]
            else:
                for fn, image_o, _geom, boxes in self.fd._iter_detections(
                    file_names, batch_size, scaled_decode=False,
                ):
                    yield fn, image_o, boxes, self._identify_image(
                        image_o, boxes, subject_ids, reg_embs
                    )

        count1 = 1
        with open(output_file_path, "w") as f:
            for fn, image_o, boxes, rows in _stream():
                if DEBUG:
                    print(count1, "/", len(file_names), fn)
                count1 += 1
                base = fn.split(os.sep)[-1]
                # Reference caps WRITTEN rows at 60 but iterates all boxes —
                # unmatched boxes don't consume the budget
                # (face_identification.py:867,:941).
                written = 0
                for row in rows:
                    if written >= 60:
                        break
                    f.write(
                        f"{base},{row['subject_id']},{row['xmin']},{row['ymin']},"
                        f"{row['xmax'] - row['xmin']},"
                        f"{row['ymax'] - row['ymin']},{row['score']}\n"
                    )
                    written += 1

                if not draw_results:
                    continue
                try:
                    df = gt_groups.get_group(base)
                except KeyError:
                    continue
                gt_boxes = []
                for i in range(df.shape[0]):
                    if not bool((df.iloc[i, 3:] > 0).all()):
                        continue
                    xmin = int(df.iloc[i, 3])
                    xmax = int(xmin + df.iloc[i, 5] - 1)
                    ymin = int(df.iloc[i, 4])
                    ymax = int(ymin + df.iloc[i, 6] - 1)
                    gt_boxes.append(
                        {"xmin": xmin, "ymin": ymin, "xmax": xmax,
                         "ymax": ymax, "subject_id": df.iloc[i, 2]}
                    )
                if not gt_boxes or boxes.shape[0] == 0:
                    continue
                from face_vijnana_yolov3_tpu.utils.drawing import draw_boxes

                image1 = draw_boxes(image_o, gt_boxes, color=(255, 0, 0))
                pred = [
                    {"xmin": r["xmin"], "ymin": r["ymin"], "xmax": r["xmax"],
                     "ymax": r["ymax"], "score": r["score"],
                     "subject_id": r["subject_id"]}
                    for r in rows
                ]
                image2 = draw_boxes(image1, pred, color=(0, 255, 0))
                out_name = base[:-4] + "_detected" + base[-4:]
                imsave(
                    os.path.join(test_path, "results_fi", out_name), image2
                )

    def evaluate(self):
        self._run_identification(draw_results=True)

    def test(self):
        self._run_identification(draw_results=False)


def main(argv: list[str] | None = None):
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    argv = sys.argv[1:] if argv is None else argv
    from face_vijnana_yolov3_tpu.api.face_detection import _parse_cli

    conf_path, overrides = _parse_cli(argv)
    conf = load_conf(conf_path)
    apply_overrides(conf, overrides)
    mode = conf.fi_conf.mode

    ts = time.time()
    if mode == "data":
        create_db_fi(conf.fi_conf)
    elif mode == "train":
        fi = FaceIdentifierPipeline(conf)
        fi.train()
        fi.make_facial_ids_db()
        fi.register_facial_ids()
    elif mode == "evaluate":
        fi = FaceIdentifierPipeline(conf)
        fi.evaluate()
    elif mode == "test":
        fi = FaceIdentifierPipeline(conf)
        fi.test()
    elif mode == "fid_db":
        fi = FaceIdentifierPipeline(conf)
        fi.make_facial_ids_db()
    te = time.time()
    print("Elasped time: {0:f}s".format(te - ts))


if __name__ == "__main__":
    main()
