#!/usr/bin/env python
"""Full-scale cross-engine parity gauntlet: TensorFlow reference twin vs JAX.

The missing round-1 evidence (VERDICT.md #1): every numeric contract was
oracle/unit-tested, but never at REAL scale against an independently built
engine with identical weights flowing through BOTH importer formats. This
script closes that, end to end, in one command:

  Stage A  write a synthetic `yolov3.weights` fixture BYTE-FOR-BYTE in the
           darknet format the reference's WeightReader parses
           (reference src/space/yolov3_detect.py:67-124)
  Stage B  build the reference's exact 106-layer graph in tf.keras
           (make_yolov3_model twin, yolov3_detect.py:196-311) and load the
           fixture with an independent WeightReader-semantics loader
  Stage C  416x416 full-graph forward on a real photograph: TF vs JAX
           (core/weights.py + models/darknet.py), NRMSE on all 3 heads
  Stage D  box-level parity THROUGH decode+NMS: reference loop semantics
           (tests/oracles.py COCO oracles) executed on the TF heads vs the
           fused device `ops/postprocess.coco_postprocess` on the JAX heads
  Stage E  face detector: TF trunk+head twin (face_detection.py:339-382),
           .h5 saved BY TENSORFLOW -> core/keras_import.detector_from_keras_h5,
           head NRMSE + detect-level box parity (oracle_face_detect vs
           ops/postprocess.face_postprocess)
  Stage F  identifier: TF trunk+dense1+l2norm twin
           (face_identification.py:316-346) .h5 -> identifier_from_keras_h5,
           embedding parity
  Stage G  yolov3_model.h5 roundtrip: TF-saved h5 of the darknet-loaded twin
           -> yolov3_from_keras_h5 == load_darknet_weights EXACTLY
  Stage H  FI END-TO-END chain parity: a 3-image test set + 4-subject
           registry; reference evaluate semantics (letterbox -> detect ->
           un-pad -> (t-1):(b-1) crop -> letterbox crop -> embed -> L2
           registry match -> sim_th gate -> solution_fi.csv row, reference
           face_identification.py:772-1153) executed with TF as the engine
           vs FaceIdentifierPipeline.test() end to end — per-file row sets,
           subject assignments, coords and scores compared

Run:  python scripts/parity_gauntlet.py            (JAX on CPU, deterministic)
      python scripts/parity_gauntlet.py --tpu      (JAX side on the live chip)
      python scripts/parity_gauntlet.py --image X  (your own photograph)

Exit code 0 = every stage passed. See PARITY.md for the runbook that swaps
these synthetic fixtures for the real `yolov3.weights` / UCCS artifacts.
"""

from __future__ import annotations

import argparse
import os
import struct
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests")
)

DEFAULT_IMAGE = "/root/reference/pics/01c2ee2fdfddb91abd41e8b31033d40a_detected.jpg"


# --------------------------------------------------------------------------
# Stage A — darknet-format fixture writer
# --------------------------------------------------------------------------

def write_darknet_fixture(path: str, seed: int = 7) -> int:
    """Write a synthetic yolov3.weights byte-for-byte per the darknet format:
    int32 major/minor/revision, 8-byte seen counter (major*10+minor >= 2),
    then per conv in ascending index: [beta, gamma, mean, var] for BN convs
    (bias for the three head convs), then the kernel as [out,in,k,k] row-major
    (WeightReader reads exactly this stream, yolov3_detect.py:85-124)."""
    from face_vijnana_yolov3_tpu.models.darknet import yolov3_graph, conv_layout

    rng = np.random.default_rng(seed)
    parts = [
        struct.pack("iii", 0, 2, 0),       # major=0 minor=2 -> 8-byte counter
        struct.pack("q", 32013312),        # seen-images counter
    ]
    n_floats = 0
    for idx, in_c, out_c, k, _stride, bn in conv_layout(yolov3_graph()):
        if bn:
            beta = rng.normal(0.0, 0.1, out_c)
            gamma = rng.uniform(0.8, 1.2, out_c)
            mean = rng.normal(0.0, 0.3, out_c)
            var = rng.uniform(0.5, 1.5, out_c)
            for v in (beta, gamma, mean, var):
                parts.append(v.astype("<f4").tobytes())
            n_floats += 4 * out_c
        else:
            # Head convs (81/93/105). Keep objectness logits in a workable
            # band: channel 85b+4 biased negative so only a tail of cells
            # passes realistic thresholds (the fused path's top-k prefilter
            # then covers the full candidate set, as on real checkpoints).
            bias = rng.normal(0.0, 0.3, out_c)
            bias[4::85] = -3.0
            parts.append(bias.astype("<f4").tobytes())
            n_floats += out_c
        fan_in = k * k * in_c
        scale = np.sqrt(2.0 / fan_in)
        if not bn:
            scale *= 0.25  # temper head logit spread
        kern = rng.normal(0.0, scale, (out_c, in_c, k, k))
        parts.append(kern.astype("<f4").tobytes())
        n_floats += out_c * in_c * k * k
    with open(path, "wb") as f:
        f.write(b"".join(parts))
    return n_floats


def patch_fixture_head_scales(path: str, head_stats: dict[int, np.ndarray]):
    """Rescale the three head convs' kernel rows in the fixture IN PLACE so
    pre-activation logit stds land in a workable band (wh feeds exp() in
    decode — a random trunk amplifies logits enough to overflow it, which
    would crash the reference's int() exactly the same way; this keeps the
    fixture exercising decode with finite, threshold-interesting values).

    head_stats: {conv_idx: (255,) std of each output channel's logits}.
    """
    # target std per channel role (channel % 85): xy 1.0, wh 0.4, obj 2.0,
    # classes 2.0
    targets = np.full(85, 2.0)
    targets[0:2] = 1.0
    targets[2:4] = 0.4

    from face_vijnana_yolov3_tpu.models.darknet import yolov3_graph, conv_layout

    data = np.memmap(path, dtype="<f4", mode="r+", offset=20)
    off = 0
    for idx, in_c, out_c, k, _stride, bn in conv_layout(yolov3_graph()):
        off += 4 * out_c if bn else out_c
        n_k = out_c * in_c * k * k
        if not bn and idx in head_stats:
            std = np.maximum(head_stats[idx].astype(np.float64), 1e-6)
            factor = (np.tile(targets, 3) / std).astype(np.float32)
            kern = np.array(data[off : off + n_k]).reshape(out_c, in_c, k, k)
            kern *= factor[:, None, None, None]
            data[off : off + n_k] = kern.ravel()
        off += n_k
    data.flush()
    del data


# --------------------------------------------------------------------------
# Stage B — TensorFlow reference twin
# --------------------------------------------------------------------------

def _C(idx, filt, k=3, s=1, bn=True, leaky=True):
    return (idx, filt, k, s, bn, leaky)


def _tf_conv_block(x, convs, skip=True):
    """_conv_block twin (yolov3_detect.py:196-215): ZeroPadding2D(1)+valid for
    every k>1 conv regardless of stride; BN eps 1e-3; leaky 0.1; skip saved
    before the last two convs."""
    from tensorflow.keras.layers import (
        Conv2D, BatchNormalization, LeakyReLU, ZeroPadding2D, add,
    )

    skip_connection = None
    for count, (idx, filt, k, s, bn, leaky) in enumerate(convs):
        if count == len(convs) - 2 and skip:
            skip_connection = x
        if k > 1:
            x = ZeroPadding2D(1)(x)
        x = Conv2D(filt, k, strides=s, padding="valid",
                   name=f"conv_{idx}", use_bias=not bn)(x)
        if bn:
            x = BatchNormalization(epsilon=1e-3, name=f"bnorm_{idx}")(x)
        if leaky:
            x = LeakyReLU(0.1, name=f"leaky_{idx}")(x)
    return add([skip_connection, x]) if skip else x


def _tf_trunk(x):
    """Darknet-53 trunk conv_0..conv_73 (make_yolov3_model layers 0..74 /
    the YOLOV3Base rebuild, face_detection.py:384-600)."""
    x = _tf_conv_block(x, [_C(0, 32), _C(1, 64, 3, 2), _C(2, 32, 1), _C(3, 64)])
    x = _tf_conv_block(x, [_C(5, 128, 3, 2), _C(6, 64, 1), _C(7, 128)])
    x = _tf_conv_block(x, [_C(9, 64, 1), _C(10, 128)])
    x = _tf_conv_block(x, [_C(12, 256, 3, 2), _C(13, 128, 1), _C(14, 256)])
    for i in range(7):
        x = _tf_conv_block(x, [_C(16 + i * 3, 128, 1), _C(17 + i * 3, 256)])
    skip_36 = x
    x = _tf_conv_block(x, [_C(37, 512, 3, 2), _C(38, 256, 1), _C(39, 512)])
    for i in range(7):
        x = _tf_conv_block(x, [_C(41 + i * 3, 256, 1), _C(42 + i * 3, 512)])
    skip_61 = x
    x = _tf_conv_block(x, [_C(62, 1024, 3, 2), _C(63, 512, 1), _C(64, 1024)])
    for i in range(3):
        x = _tf_conv_block(x, [_C(66 + i * 3, 512, 1), _C(67 + i * 3, 1024)])
    return x, skip_36, skip_61


def build_tf_yolov3(image_size: int = 416):
    """make_yolov3_model twin (yolov3_detect.py:217-311), fixed input size."""
    from tensorflow.keras.layers import Input, UpSampling2D, concatenate
    from tensorflow.keras.models import Model

    inp = Input(shape=(image_size, image_size, 3))
    x, skip_36, skip_61 = _tf_trunk(inp)
    x = _tf_conv_block(
        x, [_C(75, 512, 1), _C(76, 1024), _C(77, 512, 1), _C(78, 1024),
            _C(79, 512, 1)], skip=False)
    yolo_82 = _tf_conv_block(
        x, [_C(80, 1024), _C(81, 255, 1, 1, False, False)], skip=False)
    x = _tf_conv_block(x, [_C(84, 256, 1)], skip=False)
    x = UpSampling2D(2)(x)
    x = concatenate([x, skip_61])
    x = _tf_conv_block(
        x, [_C(87, 256, 1), _C(88, 512), _C(89, 256, 1), _C(90, 512),
            _C(91, 256, 1)], skip=False)
    yolo_94 = _tf_conv_block(
        x, [_C(92, 512), _C(93, 255, 1, 1, False, False)], skip=False)
    x = _tf_conv_block(x, [_C(96, 128, 1)], skip=False)
    x = UpSampling2D(2)(x)
    x = concatenate([x, skip_36])
    yolo_106 = _tf_conv_block(
        x, [_C(99, 128, 1), _C(100, 256), _C(101, 128, 1), _C(102, 256),
            _C(103, 128, 1), _C(104, 256), _C(105, 255, 1, 1, False, False)],
        skip=False)
    return Model(inp, [yolo_82, yolo_94, yolo_106])


def build_tf_face_detector(image_size: int = 416):
    """FaceDetector model twin: trunk + Conv2D(6,3,'same',linear,'output')
    (face_detection.py:339-352)."""
    from tensorflow.keras.layers import Input, Conv2D
    from tensorflow.keras.models import Model

    inp = Input(shape=(image_size, image_size, 3), name="input1")
    x, _, _ = _tf_trunk(inp)
    out = Conv2D(6, (3, 3), activation="linear", padding="same",
                 name="output")(x)
    return Model(inp, out)


def build_tf_embedder(image_size: int = 416, dense1_dim: int = 64):
    """fid-extractor twin: trunk -> Flatten -> Dense(64, relu, 'dense1')
    (face_identification.py:316-346, :378-395). The trailing K.l2_normalize
    Lambda carries no weights and Keras 3 refuses to h5-serialize closures,
    so the caller applies it numerically (same epsilon semantics)."""
    from tensorflow.keras.layers import Input, Flatten, Dense
    from tensorflow.keras.models import Model

    inp = Input(shape=(image_size, image_size, 3), name="input_a")
    x, _, _ = _tf_trunk(inp)
    x = Flatten()(x)
    x = Dense(dense1_dim, activation="relu", name="dense1")(x)
    return Model(inp, x)


class TFWeightLoader:
    """Independent WeightReader-semantics loader for the TF twin
    (yolov3_detect.py:67-124): same header skip, same per-layer read order,
    same set_weights([gamma, beta, mean, var]) and reversed-shape kernel
    transpose [2,3,1,0]."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            major = struct.unpack("i", f.read(4))[0]
            minor = struct.unpack("i", f.read(4))[0]
            struct.unpack("i", f.read(4))[0]
            f.read(8 if (major * 10 + minor) >= 2 and major < 1000
                   and minor < 1000 else 4)
            self.all_weights = np.frombuffer(f.read(), dtype="float32")
        self.offset = 0

    def read(self, n):
        self.offset += n
        return self.all_weights[self.offset - n : self.offset]

    def load(self, model, max_layer: int = 106):
        for i in range(max_layer):
            try:
                conv = model.get_layer(f"conv_{i}")
            except ValueError:
                continue
            if i not in (81, 93, 105):
                bn = model.get_layer(f"bnorm_{i}")
                size = int(np.prod(bn.get_weights()[0].shape))
                beta = self.read(size)
                gamma = self.read(size)
                mean = self.read(size)
                var = self.read(size)
                bn.set_weights([gamma, beta, mean, var])
            ws = conv.get_weights()
            if len(ws) > 1:
                bias = self.read(int(np.prod(ws[1].shape)))
                kernel = self.read(int(np.prod(ws[0].shape)))
                kernel = kernel.reshape(list(reversed(ws[0].shape)))
                conv.set_weights([kernel.transpose([2, 3, 1, 0]), bias])
            else:
                kernel = self.read(int(np.prod(ws[0].shape)))
                kernel = kernel.reshape(list(reversed(ws[0].shape)))
                conv.set_weights([kernel.transpose([2, 3, 1, 0])])


# --------------------------------------------------------------------------
# comparison helpers
# --------------------------------------------------------------------------

def nrmse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)) / max(np.sqrt(np.mean(a**2)),
                                                      1e-30))


def split_threshold(values: np.ndarray, target_n: int,
                    min_gap: float = 1e-4) -> float:
    """Threshold keeping ~target_n of `values`, placed mid-gap where the gap
    is wide enough that f32-vs-f64 engine drift cannot flip a membership."""
    v = np.sort(np.asarray(values, np.float64))[::-1]
    for n in range(target_n, min(len(v) - 1, target_n * 4)):
        if v[n - 1] - v[n] > min_gap:
            return float((v[n - 1] + v[n]) / 2.0)
    return float((v[target_n - 1] + v[target_n]) / 2.0)


class Report:
    def __init__(self):
        self.failures = []

    def check(self, stage, name, ok, detail=""):
        tag = "PASS" if ok else "FAIL"
        print(f"[{stage}] {tag}  {name}  {detail}", flush=True)
        if not ok:
            self.failures.append(f"{stage}: {name} {detail}")


# --------------------------------------------------------------------------
# stages
# --------------------------------------------------------------------------

def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--image", default=DEFAULT_IMAGE,
                   help="real photograph to run both engines on")
    p.add_argument("--workdir", default="/tmp/parity_gauntlet")
    p.add_argument("--tpu", action="store_true",
                   help="run the JAX side on the default backend (TPU if "
                        "live) instead of pinning CPU")
    p.add_argument("--image-size", type=int, default=416)
    ns = p.parse_args(argv)

    if not ns.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(ns.workdir, exist_ok=True)

    # Entry-point rule (CLAUDE.md): the gauntlet jits ~10 distinct programs;
    # without the persistent cache every --tpu re-run pays 60-90 s cold
    # compiles per program over the axon tunnel.
    from face_vijnana_yolov3_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from face_vijnana_yolov3_tpu.models import darknet
    from face_vijnana_yolov3_tpu.core.weights import load_darknet_weights
    from face_vijnana_yolov3_tpu.utils.io import imread

    from oracles import (
        oracle_coco_decode, oracle_correct_coco_boxes, oracle_nms_multi,
        oracle_face_detect,
    )

    S = ns.image_size
    rep = Report()
    t0 = time.time()
    print(f"JAX backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)

    # ---------------- Stage A: fixture
    fixture = os.path.join(ns.workdir, "yolov3_fixture.weights")
    n_floats = write_darknet_fixture(fixture)
    size = os.path.getsize(fixture)
    rep.check("A", "darknet fixture written",
              size == 20 + 4 * n_floats,
              f"{n_floats} floats, {size} bytes")
    # the real yolov3.weights float count, for the record
    rep.check("A", "fixture float count == real yolov3.weights",
              n_floats == 62001757, f"{n_floats}")

    # ---------------- Stage B: TF twin + independent load
    import tensorflow as tf  # noqa: F401

    tf_model = build_tf_yolov3(S)
    loader = TFWeightLoader(fixture)
    loader.load(tf_model)
    rep.check("B", "TF twin consumed the whole stream",
              loader.offset == len(loader.all_weights),
              f"offset {loader.offset} / {len(loader.all_weights)}")

    # ---------------- Stage C: full-scale forward parity on a real photo
    from face_vijnana_yolov3_tpu.api.yolov3_detect import preprocess_coco

    photo = imread(ns.image)
    image_h, image_w = photo.shape[:2]
    x = preprocess_coco(photo, S, S)  # (1,S,S,3) f32, BGR-flip + gray letterbox

    # calibration pass: measure head logit stds, rescale the fixture's head
    # kernels in place, reload — keeps decode inputs finite (see
    # patch_fixture_head_scales) while both engines still read ONE file
    tf_heads = tf_model.predict(x, verbose=0)
    head_stats = {
        idx: np.asarray(h[0], np.float64).reshape(-1, 255).std(axis=0)
        for idx, h in zip((81, 93, 105), tf_heads)
    }
    patch_fixture_head_scales(fixture, head_stats)
    loader = TFWeightLoader(fixture)
    loader.load(tf_model)

    tf_heads = tf_model.predict(x, verbose=0)
    tf_heads = [np.asarray(h[0], np.float32) for h in tf_heads]

    ops = darknet.yolov3_graph()
    params, state = load_darknet_weights(fixture, ops)
    jx = jnp.asarray(x)
    outs, _ = jax.jit(
        lambda p, s, v: darknet.apply_graph(p, s, v, ops)
    )(params, state, jx)
    jax_heads = [np.asarray(outs[k][0]) for k in
                 ("yolo_82", "yolo_94", "yolo_106")]

    for name, th, jh in zip(("yolo_82", "yolo_94", "yolo_106"),
                            tf_heads, jax_heads):
        e = nrmse(th, jh)
        rep.check("C", f"{name} forward NRMSE < 1e-4", e < 1e-4, f"{e:.3g}")

    # ---------------- Stage D: box-level parity through decode+NMS
    from face_vijnana_yolov3_tpu.ops.postprocess import coco_postprocess
    from face_vijnana_yolov3_tpu.ops.decode import KEPT_ANCHOR_IDS

    # choose an objectness threshold with a wide decision margin
    all_obj = []
    for s_idx, th in enumerate(tf_heads):
        t = th.reshape(th.shape[0], th.shape[1], 3, 85)
        obj = 1.0 / (1.0 + np.exp(-t[..., 4].astype(np.float64)))
        all_obj.append(obj[:, :, list(KEPT_ANCHOR_IDS[s_idx])].ravel())
    obj_th = split_threshold(np.concatenate(all_obj), target_n=120)
    nms_th = 0.45

    boxes_o = []
    for s_idx, th in enumerate(tf_heads):
        boxes_o += oracle_coco_decode(th, s_idx, obj_th, S, S)
    oracle_correct_coco_boxes(boxes_o, image_h, image_w, S, S)
    oracle_nms_multi(boxes_o, nms_th)
    jb, jo, jc, jv = jax.jit(
        lambda h0, h1, h2: coco_postprocess(
            (h0, h1, h2), image_h, image_w, obj_th, nms_th,
            net_h=S, net_w=S,
        )
    )(*[jnp.asarray(h) for h in jax_heads])
    jb, jo, jc, jv = (np.asarray(jb), np.asarray(jo), np.asarray(jc),
                      np.asarray(jv))
    keep = np.where(jv)[0]
    jb, jo, jc = jb[keep], jo[keep], jc[keep]
    n_f = len(keep)

    rep.check("D", "candidate count (TF-oracle vs fused device)",
              len(boxes_o) == n_f, f"{len(boxes_o)} vs {n_f}")
    # The reference returns an UNORDERED box list (decode order); the fused
    # path returns top-k-by-objectness rows. Ordering is not part of the
    # contract, so compare as sets: greedy nearest-match on (coords, obj).
    n = min(len(boxes_o), n_f)
    used = np.zeros(n_f, bool)
    coord_exact = coord_off1 = coord_bad = 0
    cls_pattern_bad = 0
    max_obj_err = max_cls_err = 0.0
    for ob in boxes_o:
        want = np.array([ob["xmin"], ob["ymin"], ob["xmax"], ob["ymax"]],
                        np.float64)
        cost = (np.abs(jb.astype(np.float64) - want).sum(1)
                + 1e3 * np.abs(jo.astype(np.float64) - ob["obj"]))
        cost[used] = np.inf
        k = int(np.argmin(cost))
        used[k] = True
        d = np.abs(want - jb[k].astype(np.float64))
        if d.max() == 0:
            coord_exact += 1
        elif d.max() <= 1:
            coord_off1 += 1
        else:
            coord_bad += 1
        max_obj_err = max(max_obj_err, abs(float(jo[k]) - ob["obj"]))
        want_cls = np.asarray(ob["classes"], np.float64)
        got_cls = jc[k].astype(np.float64)
        if not np.array_equal(want_cls == 0, got_cls == 0):
            cls_pattern_bad += 1
        max_cls_err = max(max_cls_err,
                          float(np.abs(want_cls - got_cls).max()))
    # off-by-1 budget: int() truncation sits on a knife edge between the
    # oracle's f64 and the device's f32 arithmetic — on a 5184-px-wide
    # photo 1 px is ~2e-4 of the value range, pure float-representation
    # noise. Anything >1 px would be a semantic bug: zero tolerance.
    rep.check("D", "box coords exact (int-truncation parity)",
              coord_bad == 0 and coord_off1 <= max(1, n // 20),
              f"{coord_exact}/{n} exact, {coord_off1} off-by-1, "
              f"{coord_bad} worse")
    rep.check("D", "NMS class-zeroing pattern identical",
              cls_pattern_bad == 0, f"{cls_pattern_bad}/{n} mismatched")
    rep.check("D", "objness/class scores match",
              max_obj_err < 1e-4 and max_cls_err < 1e-3,
              f"max obj err {max_obj_err:.2g}, max cls err {max_cls_err:.2g}")

    # ---------------- Stage E: face detector via TF-saved .h5
    from face_vijnana_yolov3_tpu.core.keras_import import (
        detector_from_keras_h5, identifier_from_keras_h5, yolov3_from_keras_h5,
    )
    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_host
    from face_vijnana_yolov3_tpu.ops.postprocess import (
        FacePostprocessConfig, face_postprocess,
    )

    face_tf = build_tf_face_detector(S)
    # trunk weights from the SAME darknet fixture (via the loaded full twin),
    # fresh seeded head — exactly the reference's pretrained-base+new-head init
    for i in range(74):
        for prefix in ("conv", "bnorm"):
            try:
                src = tf_model.get_layer(f"{prefix}_{i}")
            except ValueError:
                continue
            face_tf.get_layer(f"{prefix}_{i}").set_weights(src.get_weights())
    rng = np.random.default_rng(11)
    head_kernel = rng.normal(0, 0.01, (3, 3, 1024, 6)).astype(np.float32)
    head_bias = np.array([0.0, 0.3, 0.3, -1.5, -1.5, 0.0], np.float32)
    face_tf.get_layer("output").set_weights([head_kernel, head_bias])

    lb, _geom = letterbox_host(photo / 255.0, S, "cubic")
    lb = lb.astype(np.float32)[None]

    # calibration pass (as for the COCO heads): random trunks saturate the
    # head sigmoids; normalize per-channel logit std so decode+NMS sees a
    # threshold-interesting score field
    tf_face_head = np.asarray(face_tf.predict(lb, verbose=0)[0], np.float64)
    std6 = np.maximum(tf_face_head.reshape(-1, 6).std(axis=0), 1e-6)
    targets6 = np.array([2.0, 1.0, 1.0, 0.6, 0.6, 2.0])
    head_kernel = head_kernel * (targets6 / std6).astype(np.float32)
    face_tf.get_layer("output").set_weights([head_kernel, head_bias])

    face_h5 = os.path.join(ns.workdir, "face_detector.h5")
    face_tf.save(face_h5)

    tf_face_head = np.asarray(face_tf.predict(lb, verbose=0)[0], np.float32)

    fd_model = FaceDetectorModel(image_size=S)
    fd_params, fd_state = detector_from_keras_h5(face_h5)
    jax_face_head = np.asarray(
        jax.jit(lambda p, s, v: fd_model.apply(p, s, v)[0])(
            fd_params, fd_state, jnp.asarray(lb)
        )[0]
    )
    e = nrmse(tf_face_head, jax_face_head)
    rep.check("E", "face head forward NRMSE < 1e-4 (h5 import path)",
              e < 1e-4, f"{e:.3g}")

    obj64 = 1.0 / (1.0 + np.exp(-tf_face_head[..., 0].astype(np.float64)))
    sc64 = obj64 / (1.0 + np.exp(-tf_face_head[..., 5].astype(np.float64)))
    face_th = split_threshold(sc64.ravel(), target_n=25, min_gap=1e-5)
    grid = S // 32
    want_face = oracle_face_detect(tf_face_head, S, grid, face_th, 0.5, 60)
    cfg = FacePostprocessConfig(image_size=S, grid=grid, conf_th=face_th,
                                nms_iou_th=0.5, num_cands=60)
    cands, count = jax.jit(
        lambda h: face_postprocess(h, cfg)
    )(jnp.asarray(jax_face_head))
    cands, count = np.asarray(cands), int(count)
    rep.check("E", "face candidate count", len(want_face) == count,
              f"{len(want_face)} vs {count}")
    ok_rows = True
    max_err = 0.0
    for k in range(min(len(want_face), count)):
        (bx, sc) = want_face[k]
        if not np.array_equal(np.asarray(bx, np.float64), cands[k, :4]):
            ok_rows = False
        max_err = max(max_err, abs(float(cands[k, 5]) - sc))
    rep.check("E", "face boxes exact + scores match (ascending order quirk)",
              ok_rows and max_err < 1e-5, f"max score err {max_err:.2g}")

    # ---------------- Stage F: identifier via TF-saved .h5
    from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel

    emb_tf = build_tf_embedder(S)
    for i in range(74):
        for prefix in ("conv", "bnorm"):
            try:
                src = tf_model.get_layer(f"{prefix}_{i}")
            except ValueError:
                continue
            emb_tf.get_layer(f"{prefix}_{i}").set_weights(src.get_weights())
    flat_dim = (S // 32) ** 2 * 1024
    d_kernel = rng.normal(0, 1.0 / np.sqrt(flat_dim),
                          (flat_dim, 64)).astype(np.float32)
    d_bias = rng.normal(0, 0.01, 64).astype(np.float32)
    emb_tf.get_layer("dense1").set_weights([d_kernel, d_bias])
    emb_h5 = os.path.join(ns.workdir, "face_identifier.h5")
    emb_tf.save(emb_h5)

    # two different letterboxed crops of the photo
    crops = np.stack([
        lb[0],
        letterbox_host(photo[: image_h // 2, : image_w // 2] / 255.0,
                       S, "cubic")[0].astype(np.float32),
    ])
    tf_dense = np.asarray(emb_tf.predict(crops, verbose=0), np.float64)
    # K.l2_normalize semantics: x / sqrt(max(sum(x^2), 1e-12))
    tf_emb = (tf_dense / np.sqrt(
        np.maximum((tf_dense ** 2).sum(-1, keepdims=True), 1e-12)
    )).astype(np.float32)

    fi_model = FaceIdentifierModel(image_size=S)
    fi_params, fi_state = identifier_from_keras_h5(emb_h5)
    jax_emb = np.asarray(
        jax.jit(lambda p, s, v: fi_model.embed(p, s, v)[0])(
            fi_params, fi_state, jnp.asarray(crops)
        )
    )
    e = nrmse(tf_emb, jax_emb)
    cos = float(np.min(np.sum(tf_emb * jax_emb, axis=-1)))
    rep.check("F", "embedding NRMSE < 1e-4 and cos > 1-1e-6",
              e < 1e-4 and cos > 1 - 1e-6, f"nrmse {e:.3g}, min cos {cos:.9f}")

    # ---------------- Stage G: yolov3_model.h5 roundtrip, exact
    full_h5 = os.path.join(ns.workdir, "yolov3_model.h5")
    tf_model.save(full_h5)
    h5_params, h5_state = yolov3_from_keras_h5(full_h5)
    exact = True
    for key, entry in params.items():
        for wname, arr in entry.items():
            if not np.array_equal(np.asarray(arr),
                                  np.asarray(h5_params[key][wname])):
                exact = False
                print(f"    mismatch: {key}/{wname}")
    for key, entry in state.items():
        for wname, arr in entry.items():
            if not np.array_equal(np.asarray(arr),
                                  np.asarray(h5_state[key][wname])):
                exact = False
                print(f"    mismatch: {key}/{wname}")
    rep.check("G", "yolov3_model.h5 roundtrip == darknet import (bit-exact)",
              exact)

    # ---------------- Stage H: FI end-to-end chain parity
    # The chain under test is the COMPOSITION (detect boxes -> un-letterbox
    # -> crop quirks -> crop letterbox -> embed -> registry match -> CSV),
    # so the oracle reuses the repo's host geometry helpers (letterbox_host /
    # unletterbox_boxes — independently unit-tested against handcrafted
    # reference cases) but runs every NETWORK forward in TensorFlow and every
    # decision loop in plain numpy per the reference semantics
    # (face_identification.py:772-1153).
    import pickle

    from face_vijnana_yolov3_tpu.api.config import Conf
    from face_vijnana_yolov3_tpu.api.face_identification import (
        FaceIdentifierPipeline,
    )
    from face_vijnana_yolov3_tpu.ops.letterbox import unletterbox_boxes
    from face_vijnana_yolov3_tpu.utils.io import imsave

    testdir = os.path.join(ns.workdir, "fi_testset")
    os.makedirs(testdir, exist_ok=True)
    variants = {
        "t0.jpg": photo,
        "t1.jpg": photo[: image_h // 2, : image_w // 2],
        "t2.jpg": photo[image_h // 3 :, image_w // 4 :],
    }
    for name, im in variants.items():
        imsave(os.path.join(testdir, name), im)

    def tf_embed(imgs):
        d = np.asarray(emb_tf.predict(np.asarray(imgs, np.float32),
                                      verbose=0), np.float64)
        return d / np.sqrt(np.maximum((d ** 2).sum(-1, keepdims=True), 1e-12))

    # 4-subject registry from distinct sub-crops (mean-of-one embedding each,
    # the reference registry's degenerate case) — shared by BOTH engines, so
    # the parity question is purely the query embeddings + the match loop
    h3, w3 = image_h // 3, image_w // 3
    reg_crops = [photo[: h3, : w3], photo[: h3, w3 : 2 * w3],
                 photo[h3 : 2 * h3, : w3], photo[h3 : 2 * h3, w3 : 2 * w3]]
    reg_lbs = np.stack([
        letterbox_host(c / 255, S, "cubic")[0] for c in reg_crops
    ]).astype(np.float32)
    reg_embs64 = tf_embed(reg_lbs)
    registry = {100 + i: reg_embs64[i].astype(np.float32) for i in range(4)}
    reg_pickle = os.path.join(ns.workdir, "ref_facial_id_db.pickle")
    with open(reg_pickle, "wb") as fh:
        pickle.dump(registry, fh)

    # Stage E's head biases the wh channels negative (threshold-interesting
    # scores but zero-size boxes — the random-weight degenerate-box quirk).
    # The FI chain needs croppable boxes, so stage H gets its own detector
    # head with positive wh biases, calibrated on the 3 test images, saved
    # as its own .h5 consumed by BOTH engines.
    test_files = sorted(os.listdir(testdir))
    test_imgs = {fn: imread(os.path.join(testdir, fn)) for fn in test_files}
    test_lbs = {
        fn: letterbox_host(im / 255, S, "cubic")[0].astype(np.float32)[None]
        for fn, im in test_imgs.items()
    }
    rng_h = np.random.default_rng(23)
    head_kernel_h = rng_h.normal(0, 0.01, (3, 3, 1024, 6)).astype(np.float32)
    face_tf.get_layer("output").set_weights(
        [head_kernel_h, np.zeros(6, np.float32)]
    )
    cal = np.concatenate([
        np.asarray(face_tf.predict(lbi, verbose=0)[0], np.float64)
        .reshape(-1, 6)
        for lbi in test_lbs.values()
    ])
    # match per-channel mean AND std: a std-only rescale leaves the means
    # where the random kernel x trunk content puts them — the wh channels
    # landed negative, and decode's max(.,0) clamp turned every box
    # zero-width (the degenerate-box quirk this stage must avoid)
    std6_h = np.maximum(cal.std(axis=0), 1e-6)
    # wh mean 0.15/std 0.05 -> ~60px boxes (2 grid cells) in the 416 grid:
    # big enough to crop, small enough that NMS keeps several boxes/image
    target_std_h = np.array([2.0, 1.0, 1.0, 0.05, 0.05, 2.0])
    target_mean_h = np.array([0.0, 0.5, 0.5, 0.15, 0.15, 0.0])
    scale_h = (target_std_h / std6_h)
    head_kernel_h = head_kernel_h * scale_h.astype(np.float32)
    head_bias_h = (target_mean_h - cal.mean(axis=0) * scale_h).astype(
        np.float32)
    face_tf.get_layer("output").set_weights([head_kernel_h, head_bias_h])
    face_h5_fi = os.path.join(ns.workdir, "face_detector_fi.h5")
    face_tf.save(face_h5_fi)

    tf_face_heads = {}
    all_scores = []
    for fn, lbi in test_lbs.items():
        hd = np.asarray(face_tf.predict(lbi, verbose=0)[0], np.float64)
        tf_face_heads[fn] = hd
        obj = 1.0 / (1.0 + np.exp(-hd[..., 0]))
        all_scores.append((obj / (1.0 + np.exp(-hd[..., 5]))).ravel())
    # margins sized for CROSS-BACKEND reruns too: TPU HIGHEST-f32 drifts
    # ~1e-5 on head logits and ~3e-4 on embedding L2 distances vs CPU, so
    # decision gaps must dominate BOTH engine drift and backend drift
    face_th_h = split_threshold(np.concatenate(all_scores), target_n=60,
                                min_gap=3e-4)

    # oracle pass 1: boxes + crops + embeddings + distances (TF engine)
    oracle = {}
    all_dists = []
    for fn, im in test_imgs.items():
        cands_h = oracle_face_detect(tf_face_heads[fn], S, S // 32,
                                     face_th_h, 0.5, 60)
        if not cands_h:
            oracle[fn] = []
            continue
        from face_vijnana_yolov3_tpu.ops.letterbox import letterbox_geometry

        geom = letterbox_geometry(im.shape[0], im.shape[1], S)
        lb_boxes = np.asarray([list(b) for b, _s in cands_h], np.float64)
        ub = unletterbox_boxes(lb_boxes, geom)
        entries = []
        for k, (_b, sc) in enumerate(cands_h):
            l, t, r, b = (int(ub[k, 0]), int(ub[k, 1]),
                          int(ub[k, 2]), int(ub[k, 3]))
            crop = im[(t - 1):(b - 1), (l - 1):(r - 1), :]
            if crop.shape[0] == 0 or crop.shape[1] == 0:
                continue
            lbc = letterbox_host(crop / 255, S, "cubic")[0]
            entries.append((k, ub[k], sc, lbc))
        if not entries:
            oracle[fn] = []
            continue
        embs = tf_embed(np.stack([e[3] for e in entries]))
        d = np.sqrt(((embs[:, None, :] - reg_embs64[None, :, :]) ** 2)
                    .sum(-1))
        rows = []
        for (k, box, sc, _), drow in zip(entries, d):
            srt = np.sort(drow)
            j = int(np.argmin(drow))
            rows.append({"sid": 100 + j, "box": box, "score": sc,
                         "dist": float(drow[j]),
                         # argmin margin: engine+backend drift reaches
                         # ~3e-4 in embedding-distance space, so a near-tie
                         # could legally flip the assignment — those rows are
                         # excluded from the sid equality check below
                         "margin": float(srt[1] - srt[0])})
            all_dists.append(float(drow[j]))
        oracle[fn] = rows

    rep.check("H", "oracle produced matchable boxes",
              len(all_dists) >= 6, f"{len(all_dists)} candidate matches")
    # sim_th with an engine-drift-proof margin: keep ~2/3 of matches
    sim_th = -split_threshold(-np.asarray(all_dists),
                              target_n=max(2, 2 * len(all_dists) // 3),
                              min_gap=2e-3)
    for fn in oracle:
        oracle[fn] = [r for r in oracle[fn] if r["dist"] <= sim_th]

    # pipeline side: same h5 weights through the real CLI-level path
    os.environ["FVY_DEVICE_LETTERBOX"] = "0"  # host letterbox = oracle's path
    conf = Conf()
    conf.fd_conf.model_loading = True
    conf.fd_conf.model_path = face_h5_fi
    conf.fd_conf.weights_path = "missing.weights"
    conf.fd_conf.hps.face_conf_th = face_th_h
    conf.fd_conf.hps.nms_iou_th = 0.5
    conf.fd_conf.hps.num_cands = 60
    conf.fi_conf.model_loading = True
    conf.fi_conf.model_path = emb_h5
    conf.fi_conf.weights_path = "missing.weights"
    conf.fi_conf.test_path = testdir
    conf.fi_conf.hps.sim_th = float(sim_th)
    sol_fi = os.path.join(ns.workdir, "solution_fi.csv")
    conf.fi_conf.output_file_path = sol_fi
    prev_cwd = os.getcwd()
    os.chdir(ns.workdir)  # registry pickle is CWD-relative (reference quirk)
    try:
        pipe = FaceIdentifierPipeline(conf)
        pipe.test()
    finally:
        os.chdir(prev_cwd)

    got = {fn: [] for fn in test_files}
    with open(sol_fi) as fh:
        for line in fh:
            parts = line.strip().split(",")
            got[parts[0]].append(
                (int(parts[1]), *[float(v) for v in parts[2:]])
            )
    n_want = sum(len(v) for v in oracle.values())
    n_got = sum(len(v) for v in got.values())
    rep.check("H", "identified row count (TF-oracle vs pipeline)",
              n_want == n_got, f"{n_want} vs {n_got}")
    sid_bad = coord_bad = sid_checked = 0
    max_sc_err = 0.0
    for fn in test_files:
        want_rows = oracle.get(fn, [])
        got_rows = got[fn]
        for w_r, g_r in zip(want_rows, got_rows):
            if w_r["margin"] > 3e-3:
                sid_checked += 1
                if w_r["sid"] != g_r[0]:
                    sid_bad += 1
            wb = w_r["box"]
            want_csv = (wb[0], wb[1], wb[2] - wb[0], wb[3] - wb[1])
            if not np.allclose(want_csv, g_r[1:5], atol=1e-6):
                coord_bad += 1
            max_sc_err = max(max_sc_err, abs(w_r["score"] - g_r[5]))
    rep.check("H", "subject assignments identical (margin>3e-3 rows)",
              sid_bad == 0 and sid_checked >= max(1, n_want - 2),
              f"{sid_bad}/{sid_checked} mismatched "
              f"({n_want - sid_checked} near-tie rows excluded)")
    rep.check("H", "box coords exact through the full chain", coord_bad == 0,
              f"{coord_bad}/{n_want} off")
    rep.check("H", "scores match", max_sc_err < 1e-4,
              f"max err {max_sc_err:.2g}")

    # ---------------- summary
    dt = time.time() - t0
    print(f"\n{'=' * 60}")
    if rep.failures:
        print(f"GAUNTLET FAILED ({len(rep.failures)} failures, {dt:.0f}s):")
        for f in rep.failures:
            print(f"  - {f}")
        return 1
    print(f"GAUNTLET PASSED — all stages, {dt:.0f}s "
          f"(backend: {jax.default_backend()}, image {image_w}x{image_h})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
