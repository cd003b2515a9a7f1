"""Importers for the reference's Keras HDF5 checkpoints.

The reference persists whole Keras models — `face_detector.h5`
(src/space/face_detection.py:630), `face_identifier.h5`
(face_identification.py:643), the cached trunk `yolov3_base.h5`
(face_detection.py:598) and the demo's `yolov3_model.h5`
(yolov3_detect.py:585). These carry layer-named weight tensors
(`conv_i/kernel:0`, `bnorm_i/{gamma,beta,moving_mean,moving_variance}:0`,
`output/...`, `dense1/...`) under `model_weights`, possibly nested inside a
`base` sub-model group. The importer is layout-agnostic: it walks the h5 tree
collecting datasets by their weight names, then maps them onto our pytrees —
so published reference checkpoints load directly into the TPU framework.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def collect_keras_weights(h5_path: str) -> dict[str, np.ndarray]:
    """{'conv_0/kernel:0': array, ...} from any Keras-2.x-style h5."""
    import h5py

    out: dict[str, np.ndarray] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            # Keep the trailing 'layer/weight:0' identity regardless of nesting.
            # Keras 2.2.4 (the reference) names datasets 'kernel:0'; Keras 3
            # h5 saves drop the ':0' — normalize so both layouts import.
            parts = name.split("/")
            leaf = parts[-1] if ":" in parts[-1] else parts[-1] + ":0"
            # Keras 3 renamed Dense/Conv 'bias' storage unchanged; BN names
            # moving_mean/moving_variance are identical in both generations.
            key = parts[-2] + "/" + leaf
            out[key] = np.asarray(obj)

    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        root.visititems(visit)
    return out


def _conv_entry(weights: dict, name: str, bn: bool):
    entry = {"kernel": jnp.asarray(weights[f"{name}/kernel:0"])}
    if not bn:
        entry["bias"] = jnp.asarray(weights[f"{name}/bias:0"])
    return entry


def _bn_entries(weights: dict, name: str):
    params = {
        "gamma": jnp.asarray(weights[f"{name}/gamma:0"]),
        "beta": jnp.asarray(weights[f"{name}/beta:0"]),
    }
    state = {
        "mean": jnp.asarray(weights[f"{name}/moving_mean:0"]),
        "var": jnp.asarray(weights[f"{name}/moving_variance:0"]),
    }
    return params, state


def trunk_from_keras(weights: dict):
    """conv_0..73 (+bnorms) → (params, state) for the trunk graph."""
    from face_vijnana_yolov3_tpu.models.darknet import trunk_graph, conv_layout

    params: dict = {}
    state: dict = {}
    for idx, _i, _o, _k, _s, bn in conv_layout(trunk_graph()):
        params[f"conv_{idx}"] = _conv_entry(weights, f"conv_{idx}", bn)
        if bn:
            bp, bs = _bn_entries(weights, f"bnorm_{idx}")
            params[f"bnorm_{idx}"] = bp
            state[f"bnorm_{idx}"] = bs
    return params, state


def detector_from_keras_h5(h5_path: str):
    """face_detector.h5 → (params, state) incl. the 6-ch 'output' head."""
    weights = collect_keras_weights(h5_path)
    params, state = trunk_from_keras(weights)
    params["head"] = {
        "kernel": jnp.asarray(weights["output/kernel:0"]),
        "bias": jnp.asarray(weights["output/bias:0"]),
    }
    return params, state


def identifier_from_keras_h5(h5_path: str):
    """face_identifier.h5 → (params, state) incl. dense1."""
    weights = collect_keras_weights(h5_path)
    params, state = trunk_from_keras(weights)
    params["dense1"] = {
        "kernel": jnp.asarray(weights["dense1/kernel:0"]),
        "bias": jnp.asarray(weights["dense1/bias:0"]),
    }
    return params, state


def yolov3_from_keras_h5(h5_path: str):
    """yolov3_model.h5 (full 3-head COCO graph) → (params, state)."""
    from face_vijnana_yolov3_tpu.models.darknet import yolov3_graph, conv_layout

    weights = collect_keras_weights(h5_path)
    params: dict = {}
    state: dict = {}
    for idx, _i, _o, _k, _s, bn in conv_layout(yolov3_graph()):
        params[f"conv_{idx}"] = _conv_entry(weights, f"conv_{idx}", bn)
        if bn:
            bp, bs = _bn_entries(weights, f"bnorm_{idx}")
            params[f"bnorm_{idx}"] = bp
            state[f"bnorm_{idx}"] = bs
    return params, state


def _write_keras_h5(h5_path: str, layout, params, state,
                    extra_layers: list[tuple[str, str]] = ()):
    """Write a Keras-2.2.4-layout weights h5
    (`model_weights/<layer>/<layer>/<weight>:0`) from our pytrees.

    layout: `conv_layout(...)` rows for the graph's conv/bnorm layers.
    extra_layers: [(h5_layer_name, params_key)] kernel+bias pairs appended
    after the graph layers (the detector's `output` head, the identifier's
    `dense1`). Weights only — there is no Keras graph/optimizer object here
    to serialize (the reference's whole-model `model.save` also pickles the
    compiled optimizer; resuming from our h5 restarts the optimizer, exactly
    like the reference's `model_loading` path does after a config change).
    """
    import h5py
    import jax

    # ONE bulk device->host pull — per-tensor np.asarray would be ~150
    # separate transfers over the tunneled TPU (quant.py documents the same
    # hazard for quantize_folded).
    params, state = jax.device_get((params, state))
    with h5py.File(h5_path, "w") as f:
        root = f.create_group("model_weights")

        def put(layer, wname, arr):
            root.require_group(layer).create_dataset(
                f"{layer}/{wname}:0", data=np.asarray(arr, np.float32)
            )

        for idx, _i, _o, _k, _s, bn in layout:
            entry = params[f"conv_{idx}"]
            put(f"conv_{idx}", "kernel", entry["kernel"])
            if not bn:
                put(f"conv_{idx}", "bias", entry["bias"])
            else:
                bp, bs = params[f"bnorm_{idx}"], state[f"bnorm_{idx}"]
                put(f"bnorm_{idx}", "gamma", bp["gamma"])
                put(f"bnorm_{idx}", "beta", bp["beta"])
                put(f"bnorm_{idx}", "moving_mean", bs["mean"])
                put(f"bnorm_{idx}", "moving_variance", bs["var"])
        for layer, key in extra_layers:
            put(layer, "kernel", params[key]["kernel"])
            put(layer, "bias", params[key]["bias"])


def save_yolov3_keras_h5(params, state, h5_path: str):
    """Save full-graph YOLOv3 params as a Keras-layout weights h5.

    Counterpart of the demo CLI's `yolov3.save('yolov3_model.h5')` fast path
    (reference src/space/yolov3_detect.py:584-585): reloading skips the 248 MB
    darknet binary parse. `yolov3_from_keras_h5` (and any h5py reader of
    reference checkpoints) reads it back.
    """
    from face_vijnana_yolov3_tpu.models.darknet import yolov3_graph, conv_layout

    _write_keras_h5(h5_path, conv_layout(yolov3_graph()), params, state)


def save_trunk_keras_h5(params, state, h5_path: str):
    """Cache the truncated trunk as the reference's `yolov3_base.h5` artifact
    (producer: reference face_detection.py:598 `base.save`, duplicated at
    face_identification.py:612): after a darknet-binary build, later runs
    with `yolov3_base_model_load` skip the 248 MB parse. Reads back through
    `trunk_from_keras(collect_keras_weights(...))`. Extra non-trunk entries
    in `params` (detector head, identifier dense1) are not written — the
    reference's base has neither."""
    from face_vijnana_yolov3_tpu.models.darknet import trunk_graph, conv_layout

    _write_keras_h5(h5_path, conv_layout(trunk_graph()), params, state)


def save_detector_keras_h5(params, state, h5_path: str):
    """Export detector params as the reference's `face_detector.h5` artifact
    (producer: reference face_detection.py:630 `model.save`). Round-trips
    through `detector_from_keras_h5`; the trunk block also loads under any
    reference-style reader."""
    from face_vijnana_yolov3_tpu.models.darknet import trunk_graph, conv_layout

    _write_keras_h5(h5_path, conv_layout(trunk_graph()), params, state,
                    extra_layers=[("output", "head")])


def save_identifier_keras_h5(params, state, h5_path: str):
    """Export identifier params as the reference's `face_identifier.h5`
    artifact (producer: reference face_identification.py:643). Round-trips
    through `identifier_from_keras_h5`."""
    from face_vijnana_yolov3_tpu.models.darknet import trunk_graph, conv_layout

    _write_keras_h5(h5_path, conv_layout(trunk_graph()), params, state,
                    extra_layers=[("dense1", "dense1")])
