"""Face detection entry point: train / evaluate / test, config-JSON driven.

Mode-for-mode equivalent of the reference `face_detection.py` main
(reference src/space/face_detection.py:951-987), emitting the same artifacts:
`solution_fd.csv` rows `file,x,y,w,h,score` (≤60 per image), annotated JPEGs in
`<test_path>/results/` (evaluate mode), `ratios.csv`.

TPU-native differences: inference runs as batched jitted forward + the fused
on-device postprocess (the reference predicts one image at a time and decodes on
the host); training is the SPMD mesh step instead of `multi_gpu_model`.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from face_vijnana_yolov3_tpu.api.config import FdConf, load_conf, apply_overrides
from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
from face_vijnana_yolov3_tpu.ops.letterbox import (
    letterbox_host,
    unletterbox_boxes_chunk,
)
from face_vijnana_yolov3_tpu.ops.postprocess import (
    FacePostprocessConfig,
    face_postprocess,
)
from face_vijnana_yolov3_tpu.utils.io import imread, imsave
from face_vijnana_yolov3_tpu.utils.runtime import tpu_compiler_options

DEBUG = True


def _stage_bucket() -> int:
    """Staging-dim rounding granularity for the fused device-letterbox path.

    The jitted program is keyed on the staging shape, so staged H/W round up
    to multiples of this bucket to bound program count on mixed-resolution
    sets. Default 128 = at most a handful of programs for any realistic mix;
    FVY_STAGE_BUCKET=16 cuts the zero-pad upload waste (720p scaled 3/8
    stages at 270x480 -> 384x512 under 128 = 1.5x the bytes; 272x480 under
    16 = 1.01x) at the cost of one compile (~60-90 s on the tunneled chip)
    per distinct rounded source size — the right trade for uniform streams
    (one camera, one dataset), the wrong one for grab-bag image dirs.
    """
    return int(os.environ.get("FVY_STAGE_BUCKET", "128"))


class FaceDetectorPipeline:
    """Detector lifecycle: build/load params, batched detect, modes."""

    def __init__(self, conf: FdConf, *, precision: str = "float32"):
        self.conf = conf
        self.hps = vars(conf.hps) if not isinstance(conf.hps, dict) else conf.hps
        self.nn_arch = (
            vars(conf.nn_arch) if not isinstance(conf.nn_arch, dict) else conf.nn_arch
        )
        self.image_size = self.nn_arch["image_size"]
        self.grid = self.image_size // 32  # 13 at the reference's 416
        self.cell_image_size = self.image_size // self.grid
        self.precision = precision
        self.model = FaceDetectorModel(
            image_size=self.image_size,
            out_channels=self.nn_arch["bb_info_c_size"],
        )

        if conf.model_loading:
            if conf.model_path.endswith((".h5", ".hd5")):
                # Drop-in load of the reference's Keras checkpoint
                # (face_detector.h5 — reference face_detection.py:329).
                from face_vijnana_yolov3_tpu.core.keras_import import (
                    detector_from_keras_h5,
                )

                self.params, self.state = detector_from_keras_h5(conf.model_path)
            else:
                from face_vijnana_yolov3_tpu.core.checkpoints import (
                    load_checkpoint,
                )

                ckpt = load_checkpoint(conf.model_path)
                self.params, self.state = ckpt["params"], ckpt["state"]
                self.opt_state = ckpt.get("opt_state")
                from face_vijnana_yolov3_tpu.core.checkpoints import (
                    load_train_meta,
                )

                tm = load_train_meta(conf.model_path)
                self._ckpt_qat = bool(tm.get("qat", False))
                # release-time measured serving pin (update_train_meta /
                # scripts/select_serving_tail.py); None = no pin recorded
                self._ckpt_int8_tail = tm.get("int8_tail")
        elif conf.yolov3_base_model_load and os.path.exists("yolov3_base.h5"):
            # Reference fast path: cached trunk h5 (face_detection.py:393-396).
            from face_vijnana_yolov3_tpu.core.keras_import import (
                collect_keras_weights,
                trunk_from_keras,
            )

            self.params, self.state = trunk_from_keras(
                collect_keras_weights("yolov3_base.h5")
            )
            fresh, _ = self.model.init(jax.random.PRNGKey(0))
            self.params["head"] = fresh["head"]
        elif os.path.exists(conf.weights_path):
            self.params, self.state = self.model.init_from_darknet(
                conf.weights_path, jax.random.PRNGKey(0)
            )
            # Reference caches the built base (face_detection.py:598) so the
            # next run with yolov3_base_model_load skips the darknet parse.
            from face_vijnana_yolov3_tpu.core.keras_import import (
                save_trunk_keras_h5,
            )

            save_trunk_keras_h5(self.params, self.state, "yolov3_base.h5")
        else:
            # The reference hard-requires yolov3.weights; a fresh random trunk
            # keeps the pipeline runnable in weightless environments (tests).
            print(
                f"[face_detection] {conf.weights_path} not found — "
                "random-initializing trunk"
            )
            self.params, self.state = self.model.init(jax.random.PRNGKey(0))
        if not hasattr(self, "opt_state"):
            self.opt_state = None

        self._pp_cfg = FacePostprocessConfig(
            image_size=self.image_size,
            grid=self.grid,
            conf_th=self.hps["face_conf_th"],
            nms_iou_th=self.hps["nms_iou_th"],
            num_cands=self.hps["num_cands"],
        )
        self._jit_detect = None
        self._detect_fn = None  # raw (unjitted) twin, for nesting in fused jits

    # -------------------------------------------------------------- detect

    @property
    def _hybrid_front(self) -> bool:
        """bfloat16 serving with the int8 front guard (conf.bf16_front_mode).
        Calibrates like int8 (auto on the first detect batch)."""
        return (self.precision == "bfloat16"
                and getattr(self.conf, "bf16_front_mode", "f32") == "int8")

    def calibrate_int8(self, images: np.ndarray,
                       percentile: float | None = None):
        """Calibrate the int8 serving path on a representative batch.

        `images` is a (N,S,S,3) float letterboxed batch (8-16 images suffice).
        Folds conv+BN, quantizes weights per-channel, and records per-position
        activation scales (models/quant.py). detect_batch auto-calibrates on
        its first batch when precision == "int8" and this was never called.

        percentile: activation-range clipping (models/quant.calibrate_folded).
        None reads conf.int8_calib_percentile (0/absent = exact maxabs;
        "auto" = per-channel measured-MSE choice, the default — fixed
        percentiles are checkpoint-dependent: maxabs collapsed one trained
        artifact AP50 0.80→0.21 while p99.99 collapsed another 0.86→0.54;
        scripts/probe_precision_ap.py).
        """
        if percentile is None:
            percentile = getattr(self.conf, "int8_calib_percentile", 0.0) or None
        folded = self.model.fold(self.params, self.state)
        # Scale calibration stays at ≤16 images (8-image scales measured
        # BEST on the round-3 checkpoint; 32-image maxabs catches bigger
        # grid-stretching outliers and collapsed AP 0.73→0.26). The autotail
        # self-CHECK below scores on up to 32 — quantize_autotail decouples
        # the two sample sizes (n_scale_calib).
        x_calib = jnp.asarray(images[:16], jnp.float32)
        x_check = jnp.asarray(images[:32], jnp.float32)
        if self._hybrid_front:
            # bf16 serving with an int8 front guard (conf.bf16_front_mode —
            # EXPERIMENTAL, measured harmful; see the knob's docstring):
            # quantize ONLY the guard segments; everything after runs folded
            # bf16 via the mixed-tail mechanism. No QAT — the int8 region is
            # two-to-four convs at PTQ noise level.
            n_blocks = sum(1 for op in self.model.ops if op[0] == "save")
            front = max(1, self._bf16_front_depth() or 1)
            self._qparams = jax.device_put(
                self.model.quantize(
                    folded, x_calib,
                    percentile=percentile,
                    bf16_tail_blocks=n_blocks - (front - 1),
                )
            )
            self._invalidate_jits()
            return
        qat_steps = getattr(self.conf, "int8_qat_steps", 0)
        act_scales = None
        if qat_steps and getattr(self.conf, "int8_bf16_tail", 0):
            # The QAT student fake-quants EVERY position (models/qat.py has
            # no tail cut), so deploying its kernels under a bf16 tail would
            # ship a program that was never the one trained — the qat.py
            # invariant. The two knobs solve the same gap; pick one.
            raise ValueError(
                "int8_qat_steps and int8_bf16_tail are mutually exclusive: "
                "QAT trains against the full-int8 program, the bf16 tail "
                "deploys a different one"
            )
        if qat_steps:
            # Distillation QAT (models/qat.py): refine the folded kernels so
            # the int8 program matches the f32 teacher on the calibration
            # images, against FROZEN scales that then deploy unchanged.
            from face_vijnana_yolov3_tpu.models import qat, quant
            from face_vijnana_yolov3_tpu.models.detector import _head_conv

            act_scales = quant.calibrate_folded(
                folded, x_calib, self.model.ops, percentile=percentile)
            folded, _ = qat.distill_folded(
                folded, np.asarray(images, np.float32), self.model.ops,
                act_scales=act_scales,
                head_fn=lambda outs, prm: _head_conv(
                    outs["trunk"], prm["head"], jnp.float32),
                steps=qat_steps,
                lr=getattr(self.conf, "int8_qat_lr", 1e-5),
                tail_blocks=getattr(self.conf, "int8_qat_tail", 4),
            )
        tail_cfg = getattr(self.conf, "int8_bf16_tail", 0)
        bf16_ops = tuple(getattr(self.conf, "int8_bf16_ops", ()) or ())
        if (not qat_steps and not tail_cfg and not bf16_ops
                and getattr(self.conf, "int8_tail_auto", True)):
            # Self-checking calibration: escalate the bf16 tail only when
            # the int8 head demonstrably diverges from the folded-f32 head
            # on the calibration batch (quantize_autotail docstring).
            from face_vijnana_yolov3_tpu.models import quant

            # Serving-tail choice, strongest evidence first:
            # 1. A MEASURED pin in the trainmeta sidecar (`int8_tail`,
            #    written by scripts/select_serving_tail.py from held-out AP
            #    at release time) — authoritative, because the label-free
            #    self-check below CANNOT resolve the frontier on QAT
            #    checkpoints: measured round 5, errs sit flat at 0.03-0.05
            #    across tails whose held-out AP50 spans 0.346 (tail1) to
            #    0.9114 (tail5), a frontier that is also non-monotonic
            #    (tail0 0.776 > tail1 0.346 < tail5 0.911 vs f32 0.873).
            # 2. No pin + QAT checkpoint: full int8 (the configuration the
            #    training optimized; shallow tails measurably damage it).
            # 3. No pin + plain checkpoint: the r4 escalation ladder.
            # The self-check still runs to record err at the served config.
            pin = getattr(self, "_ckpt_int8_tail", None)
            if pin is not None:
                tails = (int(pin),)
            elif getattr(self, "_ckpt_qat", False):
                tails = (0,)
            else:
                tails = (0, 2, 4, 5, 6, 8)
            q, tail, err = quant.quantize_autotail(
                self.model, folded, x_check,
                percentile=percentile,
                tails=tails,
                bias_correct=bool(
                    getattr(self.conf, "int8_bias_correct", False)),
                # detection-level verdict (1 − box F1 through the real
                # postprocess): raw head NRMSE misjudges tail configs whose
                # residual error sits at cells AP never sees.
                scorer=quant.detection_box_f1_scorer(self._pp_cfg),
            )
            self._qparams = jax.device_put(q)
            self.int8_tail_chosen = tail
            self.int8_calib_err = err
            if tail:
                print(f"[calibrate_int8] self-check 1-boxF1 {err:.4f} over "
                      f"threshold — serving with bf16 tail {tail}")
            self._invalidate_jits()
            return
        self._qparams = jax.device_put(
            self.model.quantize(
                folded, x_calib,
                percentile=percentile,
                bf16_tail_blocks=tail_cfg,
                act_scales=act_scales,
                # off after QAT (the refined kernels were trained against
                # the uncorrected biases) and with bf16 islands (the
                # correction walk models an all-int8 program)
                bias_correct=(not qat_steps) and not bf16_ops and bool(
                    getattr(self.conf, "int8_bias_correct", False)),
                bf16_ops=bf16_ops,
            )
        )
        self.int8_tail_chosen = tail_cfg
        self._invalidate_jits()

    def _invalidate_jits(self):
        """Drop compiled detect programs after params/qparams change — the
        fused closures capture the inner detect, so a stale cache would keep
        serving old weights/scales."""
        self._jit_detect = None
        self._detect_fn = None
        self._fused_cache = {}

    def _bf16_front_depth(self) -> int:
        """Resolve conf.bf16_f32_front: an int is used as-is; "auto" reads
        the depth autoselect_bf16_front measured (2 — the conservative
        default — until the probe has run)."""
        front = getattr(self.conf, "bf16_f32_front", 2)
        if front == "auto":
            return int(getattr(self, "bf16_front_chosen", 2))
        return int(front)

    def autoselect_bf16_front(self, images: np.ndarray,
                              threshold: float = 0.05):
        """Pick the SHALLOWEST f32-front guard depth in {0, 1, 2} whose bf16
        head reproduces the f32 detections on a representative batch.

        The always-2 guard costs ~26% throughput (2664 → 1971 img/s,
        PROFILE.md guard table) against a failure mode that is checkpoint-
        dependent: bf16 input rounding amplifies through conv_0/1 (depth 1)
        or the first residual block (depth 2) only on SOME trained trunks
        and SOME rare inputs (scripts/probe_bf16_bisect.py). This probe
        bisects on the actual loaded checkpoint with the same detection-
        level self-check as int8 calibration (models/quant.
        detection_box_f1_scorer): depths escalate 0 → 1 → 2 until the
        box-F1 error on `images` passes `threshold`; depth 2 is kept as the
        accuracy-safe fallback when nothing shallower passes.

        `images` is a (N, S, S, 3) letterboxed float batch (16-32 images).
        Returns (depth, err) and pins the choice for every subsequent
        detect program (conf.bf16_f32_front == "auto" consumers).

        Deferral rules (ADVICE r4): narrowing an accuracy guard needs real
        detection-level evidence, so the probe DEFERS — serves the
        conservative depth 2 without pinning, letting a later batch re-probe
        — when (a) the batch has fewer than 16 images (a single-image
        detect() call is not a representative probe; the probe is skipped
        outright, costing nothing), or (b) the scorer fell back to head
        NRMSE because the f32 reference found zero detections (bf16 rounding
        passes NRMSE trivially — a vacuous pass must not remove the guard;
        it is exactly what the documented depth-0 failure mode, boxes lost
        on 21/151 val images, looks like). After 3 inconclusive probes the
        choice pins to depth 2 so pathological streams don't re-pay the
        probe forever.
        """
        from face_vijnana_yolov3_tpu.models.quant import (
            detection_box_f1_scorer,
        )

        x_np = np.asarray(images)
        if x_np.shape[0] < 16:
            # too small to certify a guard removal — serve depth 2, unpinned
            return 2, None
        folded = self.model.fold(self.params, self.state)
        x = jnp.asarray(x_np[:32], jnp.float32)
        # Candidates MUST run JITTED: under jit XLA elides f32<->bf16
        # convert pairs into the surrounding fusions, so an eager probe is
        # a DIFFERENT numeric program than the served one — measured on the
        # bench checkpoint, eager guard-0 scored box-F1 err 0.0000 while
        # the jitted serving program lost boxes on 21/151 val images
        # (AP50 0.8201 -> 0.7173). Verify-notes bf16 gotcha.
        ref = np.asarray(jax.jit(
            lambda w, xi: self.model.apply_folded(
                w, xi, compute_dtype=jnp.float32))(folded, x))
        scorer = detection_box_f1_scorer(self._pp_cfg)
        depth, err = 2, None
        inconclusive = False
        for cand in (0, 1, 2):
            head = np.asarray(jax.jit(
                lambda w, xi, c=cand: self.model.apply_folded(
                    w, xi, compute_dtype=jnp.bfloat16, f32_front_blocks=c)
            )(folded, x))
            err = scorer(ref, head)
            inconclusive = bool(getattr(scorer, "inconclusive", False))
            if inconclusive:
                break  # no detection-level evidence on this batch at all
            if err <= threshold:
                depth = cand
                break
        else:
            depth = 2
        if inconclusive:
            self._bf16_probe_attempts = getattr(
                self, "_bf16_probe_attempts", 0) + 1
            if self._bf16_probe_attempts < 3:
                return 2, None  # defer: serve depth 2 unpinned, re-probe later
            depth = 2  # give up narrowing; pin the conservative guard
        self.bf16_front_chosen = depth
        self.bf16_front_err = err
        if depth != 2:
            print(f"[autoselect_bf16_front] guard narrowed to depth {depth} "
                  f"(1-boxF1 {err:.4f} on {x.shape[0]} images)")
        self._invalidate_jits()
        return depth, err

    def _bf16_front_auto_pending(self) -> bool:
        return (self.precision == "bfloat16" and not self._hybrid_front
                and getattr(self.conf, "bf16_f32_front", 2) == "auto"
                and not hasattr(self, "bf16_front_chosen"))

    def _build_detect(self):
        cfg = self._pp_cfg
        if self.precision == "int8":
            if getattr(self, "_qparams", None) is None:
                raise RuntimeError(
                    "int8 precision requires calibrate_int8() before detect"
                )
            qparams = self._qparams
            pallas_blocks = bool(
                getattr(self.conf, "int8_pallas_blocks", False))

            def detect(images):
                head = self.model.apply_quant(
                    qparams, images, pallas_blocks=pallas_blocks)
                return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

            self._detect_fn = detect
            self._jit_detect = jax.jit(
                detect, compiler_options=tpu_compiler_options("serving"))
        elif self.precision == "bfloat16":
            if self._hybrid_front:
                if getattr(self, "_qparams", None) is None:
                    raise RuntimeError(
                        "bf16_front_mode='int8' requires calibrate_int8() "
                        "before detect"
                    )
                qparams = self._qparams  # int8 guard + folded-bf16 tail

                def detect(images):
                    head = self.model.apply_quant(qparams, images)
                    return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

                self._detect_fn = detect
                self._jit_detect = jax.jit(
                    detect,
                    compiler_options=tpu_compiler_options("serving"))
                return
            folded = self.model.fold(self.params, self.state)
            front = self._bf16_front_depth()

            def detect(images):
                head = self.model.apply_folded(
                    folded, images, compute_dtype=jnp.bfloat16,
                    f32_front_blocks=front,
                )
                return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

            self._detect_fn = detect
            self._jit_detect = jax.jit(
                detect, compiler_options=tpu_compiler_options("serving"))
        else:
            params, state = self.params, self.state

            def detect(images):
                head, _ = self.model.apply(params, state, images, train=False)
                return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

            self._detect_fn = detect
            self._jit_detect = jax.jit(
                detect, compiler_options=tpu_compiler_options("serving"))

    def detect_batch(self, images: np.ndarray):
        """(B,S,S,3) letterboxed float images → (cands (B,num_cands,6), counts (B,)).

        Fuses the reference's detect() chain (face_detection.py:885-949) into one
        device program: forward, sigmoid/threshold decode, NMS, ascending-score
        candidate selection.
        """
        if ((self.precision == "int8" or self._hybrid_front)
                and getattr(self, "_qparams", None) is None):
            self.calibrate_int8(np.asarray(images))
        if self._bf16_front_auto_pending():
            self.autoselect_bf16_front(np.asarray(images))
        if self._jit_detect is None:
            self._build_detect()
        cands, counts = self._jit_detect(jnp.asarray(images, jnp.float32))
        return np.asarray(cands), np.asarray(counts)

    def detect(self, image: np.ndarray):
        """Single-image detect returning box dict rows (reference API shape)."""
        cands, counts = self.detect_batch(image[None] if image.ndim == 3 else image)
        out = []
        for k in range(int(counts[0])):
            x0, y0, x1, y1, obj, score = cands[0, k]
            out.append(
                {"xmin": float(x0), "ymin": float(y0), "xmax": float(x1),
                 "ymax": float(y1), "objness": float(obj), "score": float(score)}
            )
        return out

    # -------------------------------------------------------------- train

    def train(self):
        from face_vijnana_yolov3_tpu.data.uccs import DetectionDataset
        from face_vijnana_yolov3_tpu.train.trainer import train_detector

        dataset = DetectionDataset(
            self.conf.raw_data_path,
            image_size=self.image_size,
            grid=self.grid,
            channels=self.nn_arch["bb_info_c_size"],
            cache=getattr(self.conf, "dataset_cache", "none"),
        )
        import jax.numpy as jnp

        # A Keras-style model_path (face_detector.h5 — the reference's train
        # artifact, face_detection.py:630) trains against a sibling Orbax dir
        # and exports the h5 at the end, so the reference's filesystem
        # contract holds: train produces the same file evaluate/test load.
        keras_h5 = self.conf.model_path.endswith((".h5", ".hd5"))
        ckpt_path = (self.conf.model_path + ".orbax" if keras_h5
                     else self.conf.model_path)

        self.params, self.state, losses = train_detector(
            self.model,
            self.params,
            self.state,
            dataset,
            self.hps,
            checkpoint_path=ckpt_path,
            init_opt_state=self.opt_state,
            history_path=ckpt_path + "_history.jsonl",
            # pipeline precision knob: bfloat16 = mixed-precision training
            # (f32 master params, bf16 fwd/bwd — 3.4x step throughput);
            # int8 is a serving-only mode, train falls back to strict f32.
            compute_dtype=(
                jnp.bfloat16 if self.precision == "bfloat16" else None
            ),
            checkpoint_every=getattr(self.conf, "checkpoint_every", 0),
            fakequant=getattr(self.conf, "train_qat", False),
        )
        print("Save the model.")
        if keras_h5:
            from face_vijnana_yolov3_tpu.core.keras_import import (
                save_detector_keras_h5,
            )

            save_detector_keras_h5(self.params, self.state,
                                   self.conf.model_path)
        # Trained params invalidate every compiled detect program and any int8
        # calibration (detect_batch re-calibrates on its next int8 call).
        self._invalidate_jits()
        self._qparams = None
        return losses

    # -------------------------------------------------------------- evaluate/test

    def detect_batch_fused(self, staged: np.ndarray, geoms: list,
                           pad_batch_to: int | None = None,
                           dec_dims: np.ndarray | None = None,
                           return_staged: bool = False):
        """Fused strict letterbox + detect, entirely on device.

        `staged` is (B, maxH, maxW, 3) images packed top-left — uint8 raw
        pixels (preferred: 4x less host->device traffic, and the /255
        normalize fuses into the on-device resize matmul) or float32 already
        /255. `geoms` the per-image LetterboxGeometry list. The cv2-faithful
        cubic resize (ops/resize.py, a=-0.75 + replicate border) runs as two
        matmul passes feeding the trunk directly — no 416² batch ever exists
        on the host (which has one CPU core).

        Letterbox matrices are cached per geometry, and a batch of identical
        geometries (the common camera/video case) uploads ONE matrix pair and
        broadcasts on device instead of B stacked copies.

        The jitted program is keyed on the staging shape, so the staging dims
        are bucketed up to multiples of 128 and (with pad_batch_to) the batch
        padded to a fixed size: mixed-resolution test sets then reuse a few
        programs instead of recompiling per chunk (cold axon compiles are
        60-90s each). The pad area is zeros; the letterbox matrices read only
        each image's own src rows/cols, so results are unchanged.

        dec_dims: (B, 2) actual staged pixel dims when the JPEGs were decoded
        at a reduced DCT scale (native_loader.decode_batch_staged_scaled) —
        geoms stay in ORIGINAL coords (box un-mapping unchanged), only the
        resize matrices read the scaled source. Not bit-exact vs full decode.

        return_staged: also return the padded device staging buffer the
        program read, so downstream device consumers (the FI ROI path,
        ops/roi.py) reuse it instead of re-uploading the originals.
        """
        from face_vijnana_yolov3_tpu.ops.resize import (
            letterbox_matrices,
            letterbox_device_matmul,
        )

        n_real = staged.shape[0]
        if n_real == 0:
            # empty staged chunk: nothing to pad against (geoms[-1] below
            # would raise); return matching empty (cands, counts)
            empty = (np.zeros((0, self.hps["num_cands"], 6), np.float32),
                     np.zeros((0,), np.int32))
            return empty + (None,) if return_staged else empty
        bucket = _stage_bucket()
        bucket_h = -(-staged.shape[1] // bucket) * bucket
        bucket_w = -(-staged.shape[2] // bucket) * bucket
        pad_b = max(pad_batch_to or 0, n_real)
        if (bucket_h, bucket_w) != staged.shape[1:3] or pad_b != n_real:
            padded = np.zeros(
                (pad_b, bucket_h, bucket_w, 3), staged.dtype
            )
            padded[:n_real, : staged.shape[1], : staged.shape[2]] = staged
            staged = padded
            geoms = list(geoms) + [geoms[-1]] * (pad_b - n_real)
            if dec_dims is not None:
                dec_dims = np.concatenate(
                    [dec_dims, np.repeat(dec_dims[-1:], pad_b - n_real, 0)]
                )

        max_h, max_w = staged.shape[1], staged.shape[2]
        if not hasattr(self, "_mat_cache"):
            self._mat_cache = {}

        def mats_for(g, dec=None):
            dh = int(dec[0]) if dec is not None else None
            dw = int(dec[1]) if dec is not None else None
            k = (g.src_h, g.src_w, max_h, max_w, dh, dw)
            if k not in self._mat_cache:
                self._mat_cache[k] = letterbox_matrices(
                    g, max_h, max_w, self.image_size, "cubic",
                    dec_h=dh, dec_w=dw,
                )
            return self._mat_cache[k]

        if dec_dims is None:
            mats = [mats_for(g) for g in geoms]
        else:
            mats = [mats_for(g, d) for g, d in zip(geoms, dec_dims)]
        uniform = all(m is mats[0] for m in mats)
        if uniform:
            row_ms = mats[0][0][None]
            col_ms = mats[0][1][None]
        else:
            row_ms = np.stack([m[0] for m in mats])
            col_ms = np.stack([m[1] for m in mats])

        def to_unit_f32(s):
            if s.dtype == jnp.uint8:
                return s.astype(jnp.float32) * (1.0 / 255.0)
            return s.astype(jnp.float32)

        need_calib = ((self.precision == "int8" or self._hybrid_front)
                      and getattr(self, "_qparams", None) is None)
        need_front = self._bf16_front_auto_pending()
        if need_calib or need_front:
            # 32 images: the box-F1 self-check needs ≥16 to resolve tail
            # improvements (8-image F1 granularity ~0.05 masked the tail-8
            # recovery on the round-3 bench checkpoint; PROFILE.md).
            k = min(32, n_real)
            lb = jax.jit(
                lambda s, r, c: letterbox_device_matmul(
                    to_unit_f32(s), jnp.broadcast_to(r, (k,) + r.shape[1:]),
                    jnp.broadcast_to(c, (k,) + c.shape[1:]),
                    precision="highest",
                )
            )(jnp.asarray(staged[:k]),
              jnp.asarray(row_ms[:1] if uniform else row_ms[:k]),
              jnp.asarray(col_ms[:1] if uniform else col_ms[:k]))
            if need_calib:
                self.calibrate_int8(np.asarray(lb))
            if need_front:
                self.autoselect_bf16_front(np.asarray(lb))
        if self._jit_detect is None:
            self._build_detect()
        key = ("fused", staged.shape, staged.dtype.str, uniform)
        if not hasattr(self, "_fused_cache") or self._fused_cache is None:
            self._fused_cache = {}
        if key not in self._fused_cache:
            # Close over the RAW detect fn: tracing a compiler_options-carrying
            # jit inside another jit is a JAX error (options are top-level-only).
            inner = self._detect_fn
            batch = staged.shape[0]

            def fused(staged, row_ms, col_ms):
                # 'highest' keeps the resize f32-exact vs the host cv2 path
                # (the TPU default would round the matmuls to bf16).
                lb = letterbox_device_matmul(
                    to_unit_f32(staged),
                    jnp.broadcast_to(row_ms, (batch,) + row_ms.shape[1:]),
                    jnp.broadcast_to(col_ms, (batch,) + col_ms.shape[1:]),
                    precision="highest",
                )
                return inner(lb)

            fused = jax.jit(
                fused, compiler_options=tpu_compiler_options("serving"))
            self._fused_cache[key] = fused
        staged_dev = jnp.asarray(staged)
        cands, counts = self._fused_cache[key](
            staged_dev, jnp.asarray(row_ms), jnp.asarray(col_ms)
        )
        out = (np.asarray(cands)[:n_real], np.asarray(counts)[:n_real])
        return out + (staged_dev,) if return_staged else out

    def _iter_detection_chunks(self, file_names: list[str], batch_size: int,
                               device_letterbox: bool | None = None,
                               scaled_decode: bool | None = None,
                               yield_staged: bool = False):
        """Letterbox + detect in device batches; yields per-CHUNK results.

        Yields (chunk_files, originals, geoms, boxes_list, staged_dev) where
        boxes_list[k] rows are [xmin,ymin,xmax,ymax,score] floats in original
        coords. device_letterbox=True routes preprocessing through the fused
        on-device strict letterbox (default: env FVY_DEVICE_LETTERBOX=1).

        yield_staged=True makes staged_dev the (B,maxH,maxW,3) device staging
        buffer the fused detect read (full-resolution pixels at each row's
        top-left), for downstream device consumers (the FI ROI embed) to
        reuse without a second host->device upload — or None on the paths
        that have no full-res staged buffer (host letterbox; scaled decode,
        whose staged pixels are NOT original-coordinate).

        scaled_decode=True additionally decodes JPEGs at a reduced DCT scale
        (libjpeg scale_num/8, native loader) — ~4x less host decode work for
        720p→416 targets. The yielded `original_image` is then the SCALED
        pixels (callers that draw overlays must not enable this); box coords
        remain in true original coords. Default: env FVY_JPEG_SCALED_DECODE=1,
        and only effective on the native device-letterbox path.
        """
        if device_letterbox is None:
            device_letterbox = os.environ.get("FVY_DEVICE_LETTERBOX") == "1"
        if scaled_decode is None:
            scaled_decode = os.environ.get("FVY_JPEG_SCALED_DECODE") == "1"
        from face_vijnana_yolov3_tpu.data.pipeline import prefetch_batches
        from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_geometry

        native = None
        if device_letterbox:
            from face_vijnana_yolov3_tpu.data import native_loader

            if native_loader.native_available() and all(
                fn.lower().endswith((".jpg", ".jpeg")) for fn in file_names
            ):
                native = native_loader

        chunks = [
            file_names[s : s + batch_size]
            for s in range(0, len(file_names), batch_size)
        ]

        def stage_upload(staged_u8):
            """Pre-pad a FULL chunk to the bucketed program shape and start
            its h2d here on the prefetch thread: jax.device_put is async, so
            the transfer overlaps both the next chunk's decode and the
            device's current detect — the consumer-side detect_batch_fused
            sees the already-bucketed device array and skips its own pad +
            upload. Short (last) chunks stay on the host: their padded shape
            is built by detect_batch_fused's pad_batch_to path."""
            n = staged_u8.shape[0]
            if n != batch_size:
                return staged_u8
            bucket = _stage_bucket()
            bh = -(-staged_u8.shape[1] // bucket) * bucket
            bw = -(-staged_u8.shape[2] // bucket) * bucket
            if (bh, bw) != staged_u8.shape[1:3]:
                padded = np.zeros((n, bh, bw, 3), staged_u8.dtype)
                padded[:, : staged_u8.shape[1], : staged_u8.shape[2]] = (
                    staged_u8
                )
                staged_u8 = padded
            return jax.device_put(staged_u8)

        def load_chunk(i):
            """Host side of one batch (decode + stage/letterbox) — runs on the
            prefetch thread so JPEG decode overlaps device compute."""
            chunk = chunks[i]
            if native is not None and scaled_decode:
                staged_u8, dec_dims, orig_dims = (
                    native.decode_batch_staged_scaled(chunk, self.image_size)
                )
                # "originals" are the scaled pixels (no drawing on this path);
                # geometry — and therefore box un-mapping — uses TRUE dims
                originals = [
                    staged_u8[k, : dec_dims[k, 0], : dec_dims[k, 1]]
                    for k in range(len(chunk))
                ]
                geoms = [
                    letterbox_geometry(int(d[0]), int(d[1]), self.image_size)
                    for d in orig_dims
                ]
                return ("staged_scaled", (stage_upload(staged_u8), dec_dims),
                        geoms, originals)
            if native is not None:
                staged_u8, dims = native.decode_batch_staged(chunk)
                originals = [
                    staged_u8[k, : dims[k, 0], : dims[k, 1]]
                    for k in range(len(chunk))
                ]
                geoms = [
                    letterbox_geometry(int(d[0]), int(d[1]), self.image_size)
                    for d in dims
                ]
                # raw uint8 straight to the device: the /255 normalize fuses
                # into the on-device letterbox, and the host->device transfer
                # is 4x smaller than a f32 batch.
                return ("staged", stage_upload(staged_u8), geoms, originals)
            originals = [imread(fn) for fn in chunk]
            geoms = [
                letterbox_geometry(im.shape[0], im.shape[1], self.image_size)
                for im in originals
            ]
            if device_letterbox:
                max_h = max(im.shape[0] for im in originals)
                max_w = max(im.shape[1] for im in originals)
                staged = np.zeros((len(chunk), max_h, max_w, 3), np.uint8)
                for k, im in enumerate(originals):
                    staged[k, : im.shape[0], : im.shape[1]] = im
                return ("staged", staged, geoms, originals)
            images = np.asarray(
                [letterbox_host(im / 255, self.image_size, "cubic")[0]
                 for im in originals],
                np.float32,
            )
            return ("letterboxed", images, geoms, originals)

        loaded = prefetch_batches(
            load_chunk, len(chunks), prefetch=2, device_put=False
        )
        for chunk, (kind, batch, geoms, originals) in zip(chunks, loaded):
            staged_dev = None
            if kind == "staged_scaled":
                staged_u8, dec_dims = batch
                cands, counts = self.detect_batch_fused(
                    staged_u8, geoms, pad_batch_to=batch_size,
                    dec_dims=dec_dims,
                )
            elif kind == "staged":
                if yield_staged:
                    cands, counts, staged_dev = self.detect_batch_fused(
                        batch, geoms, pad_batch_to=batch_size,
                        return_staged=True,
                    )
                else:
                    cands, counts = self.detect_batch_fused(
                        batch, geoms, pad_batch_to=batch_size
                    )
            else:
                cands, counts = self.detect_batch(batch)
            # Chunk-vectorized un-letterbox (bitwise-identical to the
            # per-image f64 calls — ops/letterbox.unletterbox_boxes_chunk);
            # the remaining per-image work is O(counts[k]) slicing.
            ub = unletterbox_boxes_chunk(cands, geoms)
            scores = cands[..., 5].astype(np.float64)
            boxes_list = []
            for k in range(len(chunk)):
                n = int(counts[k])
                boxes = ub[k, :n]
                if self.conf.apply_face_region_ratio:
                    boxes = self._correct_aspect_ratio(boxes)
                boxes_list.append(
                    np.concatenate([boxes, scores[k, :n, None]], axis=1)
                )
            yield chunk, originals, geoms, boxes_list, staged_dev

    def _iter_detections(self, file_names: list[str], batch_size: int,
                         device_letterbox: bool | None = None,
                         scaled_decode: bool | None = None,
                         yield_staged: bool = False):
        """Per-image view of `_iter_detection_chunks`: yields
        (file_name, original_image, geom, boxes) — plus the image's staging
        row when yield_staged=True (None where no staged buffer exists)."""
        for chunk, originals, geoms, boxes_list, staged_dev in (
            self._iter_detection_chunks(
                file_names, batch_size, device_letterbox=device_letterbox,
                scaled_decode=scaled_decode, yield_staged=yield_staged,
            )
        ):
            for k, fn in enumerate(chunk):
                if yield_staged:
                    row_dev = (staged_dev[k]
                               if staged_dev is not None else None)
                    yield fn, originals[k], geoms[k], boxes_list[k], row_dev
                else:
                    yield fn, originals[k], geoms[k], boxes_list[k]

    def _correct_aspect_ratio(self, boxes: np.ndarray) -> np.ndarray:
        """Docker-variant aspect correction (docker/code/face_detection.py:
        415-422): widen the short axis up to face_region_ratio_th."""
        th = self.hps["face_region_ratio_th"]
        out = boxes.copy()
        for r in out:
            w = r[2] - r[0]
            h = r[3] - r[1]
            if h <= 0 or w <= 0:
                continue
            if w / h < th:
                r[2] = th * h + r[0]
            elif h / w < th:
                r[3] = th * w + r[1]
        return out

    def _write_rows(self, f, file_name: str, boxes: np.ndarray):
        """≤60 CSV rows `file,x,y,w,h,score` (face_detection.py:726-738)."""
        count = 1
        base = file_name.split(os.sep)[-1]
        for row in boxes:
            if count > 60:
                break
            xmin, ymin, xmax, ymax, score = row
            f.write(
                f"{base},{xmin},{ymin},{xmax - xmin},{ymax - ymin},{score}\n"
            )
            count += 1

    def evaluate(self):
        import pandas as pd

        test_path = self.conf.test_path
        output_file_path = self.conf.output_file_path
        results_dir = os.path.join(test_path, "results")
        if os.path.isdir(results_dir):
            shutil.rmtree(results_dir)
        os.mkdir(results_dir)

        gt_df = pd.read_csv(os.path.join(test_path, "validation.csv"))
        gt_groups = gt_df.groupby("FILE")
        file_names = glob.glob(os.path.join(test_path, "*.jpg"))
        ratios = []

        count1 = 1
        with open(output_file_path, "w") as f:
            # scaled_decode=False: evaluate draws GT/pred overlays on the
            # decoded pixels, which must be full-resolution
            for fn, image_o, geom, boxes in self._iter_detections(
                file_names, int(self.hps["batch_size"]), scaled_decode=False
            ):
                if DEBUG:
                    print(count1, "/", len(file_names), fn)
                count1 += 1
                self._write_rows(f, fn, boxes)
                if boxes.shape[0] == 0:
                    continue

                base = fn.split(os.sep)[-1]
                try:
                    df = gt_groups.get_group(base)
                except KeyError:
                    # Deliberate divergence: the reference's evaluate calls
                    # get_group unguarded (face_detection.py:741-745) and
                    # CRASHES with KeyError on a test image absent from
                    # validation.csv; here the image still gets its CSV rows
                    # (written above) and only the GT overlay is skipped.
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
                        {"xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax}
                    )
                    ratios.append((xmax - xmin) / (ymax - ymin))

                from face_vijnana_yolov3_tpu.utils.drawing import draw_boxes

                image1 = draw_boxes(image_o, gt_boxes, color=(255, 0, 0))
                pred_boxes = [
                    {"xmin": r[0], "ymin": r[1], "xmax": r[2], "ymax": r[3],
                     "score": r[4]}
                    for r in boxes
                ]
                image2 = draw_boxes(image1, pred_boxes, color=(0, 255, 0))
                out_name = base[:-4] + "_detected" + base[-4:]
                imsave(os.path.join(results_dir, out_name), image2)

        pd.DataFrame({"ratio": ratios}).to_csv("ratios.csv")

    def test(self):
        test_path = self.conf.test_path
        output_file_path = self.conf.output_file_path
        file_names = glob.glob(os.path.join(test_path, "*.jpg"))
        count1 = 1
        with open(output_file_path, "w") as f:
            for fn, _image_o, _geom, boxes in self._iter_detections(
                file_names, int(self.hps["batch_size"])
            ):
                if DEBUG:
                    print(count1, "/", len(file_names), fn)
                count1 += 1
                self._write_rows(f, fn, boxes)


def _parse_cli(argv: list[str]) -> tuple[str | None, list[str]]:
    """(conf_path, overrides) from CLI args. `--set key=value` works in all
    shell forms: two tokens (`--set k=v`), `--set=k=v`, or one quoted token."""
    conf_path = None
    overrides: list[str] = []
    it = iter(argv)
    for a in it:
        if a.startswith("--conf="):
            conf_path = a.split("=", 1)[1]
        elif a == "--conf":
            nxt = next(it, None)
            if nxt is None:
                raise SystemExit("--conf requires a path argument")
            conf_path = nxt
        elif a == "--set":
            nxt = next(it, None)
            if nxt is None:
                raise SystemExit("--set requires a key=value argument")
            overrides.append(nxt)
        elif a.startswith("--set="):
            overrides.append(a.split("=", 1)[1])
        elif a.startswith("--set "):
            overrides.append(a.split(" ", 1)[1])
        else:
            overrides.append(a)
    return conf_path, overrides


def legacy_main(argv: list[str]):
    """Docker-variant argparse surface, flag for flag
    (reference docker/code/face_detection.py:1135-1155).

    Maps the one-flag-per-hp spelling onto FdConf: `--num_filters` is the
    head channel count (docker face_detection.py:76), `--step_per_epoch`
    derives the batch size as n_files // step_per_epoch (the docker
    TrainingSequence's inverted batching, :608), `--model_loading` is the
    0/1 int, and the model artifact is the legacy `face_detector.hd5`
    (docker :42). The docker build's RATIO_TH aspect correction (:415-422)
    is on, as there. Engaged by `main` whenever `--mode` is passed — the
    config-JSON surface uses `--conf` + dotted overrides instead.
    """
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--mode")
    parser.add_argument("--raw_data_path")
    parser.add_argument("--output_file_path")
    parser.add_argument("--image_size")
    parser.add_argument("--num_filters")
    parser.add_argument("--lr")
    parser.add_argument("--beta_1")
    parser.add_argument("--beta_2")
    parser.add_argument("--decay")
    parser.add_argument("--step_per_epoch")
    parser.add_argument("--epochs")
    parser.add_argument("--face_conf_th")
    parser.add_argument("--nms_iou_th")
    parser.add_argument("--num_cands")
    parser.add_argument("--model_loading")
    args = parser.parse_args(argv)
    conf = legacy_args_to_conf(args)

    fd = FaceDetectorPipeline(conf)
    ts = time.time()
    if conf.mode == "train":
        fd.train()
    elif conf.mode == "evaluate":
        fd.evaluate()
    elif conf.mode == "test":
        fd.test()
    te = time.time()
    print("Elasped time: {0:f}s".format(te - ts))


def legacy_args_to_conf(args) -> FdConf:
    """Docker argparse namespace → FdConf (see legacy_main)."""
    conf = FdConf(
        mode=args.mode,
        raw_data_path=args.raw_data_path or "",
        test_path=args.raw_data_path or "",
        output_file_path=args.output_file_path or "solution_fd.csv",
        model_path="face_detector.hd5",
        apply_face_region_ratio=True,
    )
    conf.nn_arch.image_size = int(args.image_size)
    conf.nn_arch.bb_info_c_size = int(args.num_filters)
    conf.hps.lr = float(args.lr)
    conf.hps.beta_1 = float(args.beta_1)
    conf.hps.beta_2 = float(args.beta_2)
    conf.hps.decay = float(args.decay)
    conf.hps.step = int(args.step_per_epoch)
    conf.hps.epochs = int(args.epochs)
    conf.hps.face_conf_th = float(args.face_conf_th)
    conf.hps.nms_iou_th = float(args.nms_iou_th)
    conf.hps.num_cands = int(args.num_cands)
    # evaluate/test force model_loading=True exactly like the docker main
    # (docker face_detection.py:1100,:1124 pass True unconditionally).
    conf.model_loading = (
        int(args.model_loading) != 0 if conf.mode == "train" else True
    )
    if conf.mode == "train" and os.path.exists(
        os.path.join(conf.raw_data_path, "training.csv")
    ):
        # batch_size = n_files // step_per_epoch (docker :608).
        import pandas as pd

        n_files = pd.read_csv(
            os.path.join(conf.raw_data_path, "training.csv")
        )["FILE"].nunique()
        conf.hps.batch_size = max(1, n_files // max(1, conf.hps.step))
    return conf


def main(argv: list[str] | None = None):
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    argv = sys.argv[1:] if argv is None else argv
    if any(a == "--mode" or a.startswith("--mode=") for a in argv):
        return legacy_main(argv)
    conf_path, overrides = _parse_cli(argv)
    conf = load_conf(conf_path)
    apply_overrides(conf, overrides)
    fd_conf = conf.fd_conf

    fd = FaceDetectorPipeline(fd_conf)
    ts = time.time()
    if fd_conf.mode == "train":
        fd.train()
    elif fd_conf.mode == "evaluate":
        fd.evaluate()
    elif fd_conf.mode == "test":
        fd.test()
    te = time.time()
    print("Elasped time: {0:f}s".format(te - ts))  # reference output parity


if __name__ == "__main__":
    main()
