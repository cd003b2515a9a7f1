"""Training loops (the reference's fit_generator replacement).

Epoch/step structure mirrors the reference (steps = ceil(N/batch), remainder in
the final batch — reference src/space/face_detection.py:87-90,:103), with the
keras Sequence multiprocessing replaced by the threaded device-prefetch pipeline
and the Keras multi-GPU wrapper replaced by the SPMD mesh step.
"""

from __future__ import annotations

import json
import os
import time

import jax
import ml_dtypes
import numpy as np

from face_vijnana_yolov3_tpu.data.pipeline import prefetch_batches
from face_vijnana_yolov3_tpu.parallel import mesh as mesh_lib
from face_vijnana_yolov3_tpu.train.optimizer import keras_adam, coerce_adam_state
from face_vijnana_yolov3_tpu.utils.runtime import tpu_compiler_options


def _pad_batch(arrays: tuple, batch_size: int, n_dev: int):
    """Pad a remainder batch up to a shardable size with zero-weight rows.

    The reference feeds the true remainder (its towers just get fewer rows);
    SPMD needs the batch divisible by the data axis. Padding rows replicate row 0
    and a weight vector marks them so the loss ignores them. Takes a tuple of
    batch-leading arrays (images+gts, triplet a/p/n, ...); returns
    (*padded_arrays, weights).
    """
    n = arrays[0].shape[0]
    target = max(batch_size, n_dev)
    if target % n_dev:
        target += n_dev - target % n_dev
    if n == target:
        return (*arrays, np.ones(n, np.float32))
    pad = target - n
    padded = tuple(
        np.concatenate([x, np.repeat(x[:1], pad, axis=0)]) for x in arrays
    )
    weights = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return (*padded, weights)


def train_detector(
    model,
    params,
    state,
    dataset,
    hps: dict,
    *,
    mesh=None,
    log_every: int = 1,
    checkpoint_path: str | None = None,
    init_opt_state=None,
    history_path: str | None = None,
    finalize_bn: bool = True,
    compute_dtype=None,
    checkpoint_every: int = 0,
    device_data: bool | None = None,
    fakequant: bool = False,
):
    """Train the face detector; returns (params, state, losses).

    fakequant: quantization-aware training — the forward carries int8
    fake-quant noise at the serving requant positions (STE gradients,
    darknet.apply_graph fakequant). Produces checkpoints whose PTQ int8
    serving path needs little or no bf16 tail (models/quant.quantize_autotail
    picks the tail by measurement either way). Off by default: reference
    parity trains plain f32 (reference src/space/face_detection.py:381).

    device_data: keep the WHOLE training set resident in device HBM, stacked
    (steps, batch, ...), and run each epoch as ONE jitted lax.scan over steps —
    zero per-step host->device traffic and one dispatch per epoch instead of
    per step. Numerically identical to the streaming path (same batch order,
    same update). None (default) auto-enables when the stacked set fits the
    FVY_DEVICE_DATA_BUDGET (bytes, default 4e9). The streaming path remains
    for datasets that don't fit. Besides speed, this sidesteps a host-memory
    leak in the tunneled axon TPU client (~batch bytes leak per h2d transfer,
    scripts/probe_h2d_leak.py) that OOMs multi-thousand-step streaming runs.

    checkpoint_every: save an Orbax checkpoint (params + BN state + optimizer
    state) every N epochs in addition to the end-of-training save, so a killed
    run resumes from the last interval via model_loading instead of restarting
    (the reference only saves at the end — SURVEY §5 checkpoint/resume).
    0 = end-of-training only (reference behavior).

    hps: lr/beta_1/beta_2/decay/epochs/batch_size (reference hps schema). Writes
    hps['step'] back like the reference's Sequence does.

    compute_dtype: None/f32 = strict f32 (reference-faithful; Precision.HIGHEST
    convs). jnp.bfloat16 = mixed precision — fwd/bwd convs in bf16, master
    params/grads/Adam state stay f32, loss in f32 — measured 515 vs 150 img/s
    at batch 128 on one v5e chip. BN recalibration (finalize_bn) always runs
    f32 regardless.
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    batch_size = int(hps["batch_size"])
    steps = dataset.steps(batch_size)
    hps["step"] = steps  # reference runtime-overwrite quirk (face_detection.py:87-90)

    tx = keras_adam(hps["lr"], hps["beta_1"], hps["beta_2"], hps["decay"])
    opt_state = (
        coerce_adam_state(init_opt_state)
        if init_opt_state is not None
        else tx.init(params)
    )

    n_dev = mesh.devices.size
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharded(mesh)

    dtype = compute_dtype if compute_dtype is not None else jax.numpy.float32

    def step_fn(params, state, opt_state, images, gts, weights):
        def loss_fn(p):
            pred, new_state = model.apply(
                p, state, images, train=True, compute_dtype=dtype,
                fakequant=fakequant,
            )
            # Weighted MSE so shard-padding rows are inert; with all-ones weights
            # this is exactly Keras loss='mse'.
            per = jax.numpy.mean(
                jax.numpy.square(pred - gts), axis=(1, 2, 3)
            )
            loss = jax.numpy.sum(per * weights) / jax.numpy.sum(weights)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return new_params, new_state, new_opt_state, loss

    def make_batch(i):
        images, gts, weights = _pad_batch(
            dataset.batch(i, batch_size), batch_size, n_dev
        )
        # Mixed-precision: upload images as bf16 — the forward casts them
        # to compute_dtype anyway, so this is numerically identical and
        # halves the host->device batch bytes (an upload-bound step over a
        # tunneled chip is ~2x faster; GTs/weights stay f32 for the loss).
        if dtype == jax.numpy.bfloat16:
            images = images.astype(ml_dtypes.bfloat16)
        return images, gts, weights

    if device_data is None:
        im0, gt0, _ = make_batch(0)
        budget = float(os.environ.get("FVY_DEVICE_DATA_BUDGET", 4e9))
        device_data = steps * (im0.nbytes + gt0.nbytes) <= budget

    params = jax.device_put(params, repl)
    state = jax.device_put(state, repl)
    opt_state = jax.device_put(opt_state, repl)

    losses = []
    if device_data:
        # (steps, batch, ...) stacked set, batch dim sharded over 'data';
        # lax.scan slices the leading dim per step entirely on device.
        stacked = [make_batch(i) for i in range(steps)]
        data_stacked = mesh_lib.stacked_batch_sharded(mesh)
        imgs_d = jax.device_put(np.stack([s[0] for s in stacked]), data_stacked)
        gts_d = jax.device_put(np.stack([s[1] for s in stacked]), data_stacked)
        ws_d = jax.device_put(np.stack([s[2] for s in stacked]), data_stacked)
        del stacked

        def epoch_fn(params, state, opt_state, imgs, gts, ws):
            def body(carry, xs):
                params, state, opt_state = carry
                images, gts_b, w = xs
                params, state, opt_state, loss = step_fn(
                    params, state, opt_state, images, gts_b, w
                )
                return (params, state, opt_state), loss

            (params, state, opt_state), ep_losses = jax.lax.scan(
                body, (params, state, opt_state), (imgs, gts, ws)
            )
            return params, state, opt_state, ep_losses

        jit_epoch = jax.jit(
            epoch_fn,
            in_shardings=(repl, repl, repl, data_stacked, data_stacked,
                          data_stacked),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1, 2),
            compiler_options=tpu_compiler_options("train"),
        )
    else:
        jit_step = jax.jit(
            step_fn,
            in_shardings=(repl, repl, repl, data, data, data),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1, 2),
            compiler_options=tpu_compiler_options("train"),
        )

    for epoch in range(int(hps["epochs"])):
        t0 = time.time()
        if device_data:
            params, state, opt_state, ep_losses = jit_epoch(
                params, state, opt_state, imgs_d, gts_d, ws_d
            )
            losses.extend(np.asarray(ep_losses))
        else:
            for bi, (images, gts, weights) in enumerate(
                prefetch_batches(make_batch, steps)
            ):
                params, state, opt_state, loss = jit_step(
                    params, state, opt_state, images, gts, weights
                )
                losses.append(loss)
        if log_every and (epoch % log_every == 0):
            print(
                f"epoch {epoch + 1}/{hps['epochs']}  "
                f"loss {float(losses[-1]):.6f}  {time.time() - t0:.1f}s"
            )
        if (checkpoint_every and checkpoint_path
                and (epoch + 1) % checkpoint_every == 0
                and (epoch + 1) < int(hps["epochs"])):
            from face_vijnana_yolov3_tpu.core.checkpoints import save_checkpoint

            save_checkpoint(
                checkpoint_path,
                {"params": params, "state": state, "opt_state": opt_state},
                meta={"qat": bool(fakequant)},
            )
            _write_history(history_path, [float(l) for l in losses])

    losses = [float(l) for l in losses]
    _write_history(history_path, losses)
    if finalize_bn:
        recal = jax.jit(
            lambda p, s, x: model.apply(p, s, x, train=True, bn_momentum=0.0)
        )
        state = finalize_bn_stats(recal, params, state, dataset, batch_size)
        state = jax.device_put(state, repl)
    if checkpoint_path:
        from face_vijnana_yolov3_tpu.core.checkpoints import save_checkpoint

        save_checkpoint(
            checkpoint_path,
            {"params": params, "state": state, "opt_state": opt_state},
            meta={"qat": bool(fakequant)},
        )
    return params, state, losses


def finalize_bn_stats(apply_fn, params, state, dataset, batch_size, *,
                      max_batches: int | None = None):
    """Re-estimate BN moving stats over the training set with frozen params.

    Keras-momentum-0.99 moving averages lag the drifting batch statistics by
    ~100 steps; stacked over 52 BN layers that lag makes eval-mode outputs
    diverge badly from train-mode fit (measured 50x worse MSE on a fully
    overfit set). The reference inherits this silently from Keras; here one
    pass over the data with momentum=0 collects exact batch statistics and
    averages them — standard BN recalibration. Returns the corrected state.

    apply_fn(params, state, images) must run the model in train mode with
    bn_momentum=0 and return (_, batch_stats_state).
    """
    steps = dataset.steps(batch_size)
    if max_batches is not None:
        steps = min(steps, max_batches)
    sums = None
    for i in range(steps):
        images = dataset.batch(i, batch_size)[0]
        _, bstats = apply_fn(params, state, images)
        if sums is None:
            sums = jax.tree.map(lambda x: np.asarray(x, np.float64), bstats)
        else:
            sums = jax.tree.map(
                lambda a, b: a + np.asarray(b, np.float64), sums, bstats
            )
    if sums is None:
        return state
    return jax.tree.map(lambda a: (a / steps).astype(np.float32), sums)


def _write_history(history_path, losses):
    """Structured per-step loss log (the reference's only training telemetry is
    the Keras progress bar; this leaves an analyzable artifact instead)."""
    if not history_path:
        return
    with open(history_path, "w") as f:
        for i, loss in enumerate(losses):
            f.write(json.dumps({"step": i, "loss": loss}) + "\n")


def train_identifier(
    model,
    params,
    state,
    triplet_dataset,
    hps: dict,
    *,
    mesh=None,
    checkpoint_path: str | None = None,
    init_opt_state=None,
    history_path: str | None = None,
    finalize_bn: bool = True,
    compute_dtype=None,
    checkpoint_every: int = 0,
    device_data: bool | None = None,
    mining: str = "random",
    remat: bool | int = False,
    epoch_times: list | None = None,
    fakequant: bool = False,
):
    """Train the triplet embedder; returns (params, state, losses).

    fakequant: quantization-aware training of the shared trunk (see
    train_detector) — the lever for serving the FI embed path int8 (the
    round-4 flip-rate gate rejected PTQ int8 on a plain-trained checkpoint,
    scripts/probe_fi_int8_acc.py).

    compute_dtype: as in train_detector — None/f32 strict, jnp.bfloat16 mixed
    precision (f32 master params, bf16 fwd/bwd), composes with the per-block
    remat the triplet step always uses.

    checkpoint_every / device_data: as in train_detector (device_data stacks
    the a/p/n crop arrays in HBM and scans epochs; auto-on under
    FVY_DEVICE_DATA_BUDGET — triplet sets are 3x image bytes).

    mining: "random" (default) keeps the reference's uniform-random negative
    exactly as sampled by TripletDataset (face_identification.py:1546).
    remat: darknet.apply_graph granularity — False (default) none: the
    3x-stacked 416² batch fits v5e HBM without remat through b64 and runs
    ~24% faster than per-block checkpointing (measured sweep, PROFILE.md
    identifier section). An int N checkpoints only the first N segments,
    True every residual block (lowest HBM — for batches/resolutions that
    OOM). FiConf.train_remat plumbs it from config.

    "semi_hard" re-selects each anchor's negative INSIDE the jitted step from
    the whole 3B-embedding in-batch pool (FaceNet semi-hard rule:
    d_ap < d_an < d_ap + α, deterministic closest-such; falls back to the
    closest harder-than-positive, then the globally closest valid) — a
    fixed-shape masked argmin over the batch distance matrix, so it costs
    one (B, 3B) matrix on device and no host work.
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    batch_size = int(hps["batch_size"])
    steps = triplet_dataset.steps(batch_size)
    hps["step"] = steps

    tx = keras_adam(hps["lr"], hps["beta_1"], hps["beta_2"], hps["decay"])
    opt_state = (
        coerce_adam_state(init_opt_state)
        if init_opt_state is not None
        else tx.init(params)
    )

    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharded(mesh)
    n_dev = mesh.devices.size

    # Tensor parallelism for dense1 (the reference's biggest single tensor,
    # 173056xdense1_dim): kernel input-dim sharded over 'model', Adam moments
    # sharded the same way; with model_axis == 1 the specs degenerate to
    # replicated, so the dryrun and real training share this one code path.
    pspec = mesh_lib.shard_identifier_params(mesh, params)
    opt_spec = type(opt_state)(
        count=repl,
        mu=mesh_lib.shard_identifier_params(mesh, opt_state.mu),
        nu=mesh_lib.shard_identifier_params(mesh, opt_state.nu),
    )

    dtype = compute_dtype if compute_dtype is not None else jax.numpy.float32

    jnp = jax.numpy

    def step_fn(params, state, opt_state, a, p, n, weights,
                sid_a=None, sid_n=None):
        def loss_fn(prm):
            # remat: triplet batches stack 3x images through the 40M-param
            # trunk — checkpointing residual blocks keeps HBM flat.
            out, new_state = model.triplet_forward(
                prm, state, a, p, n, train=True, remat=remat,
                compute_dtype=dtype, fakequant=fakequant,
            )
            d = model.dense1_dim
            ea, ep, en = out[:, :d], out[:, d : 2 * d], out[:, 2 * d :]
            d_ap = jnp.sqrt(jnp.sum((ea - ep) ** 2, axis=-1))
            if mining == "semi_hard":
                b = ea.shape[0]
                pool = jnp.concatenate([ea, ep, en], axis=0)        # (3B, D)
                pool_sid = jnp.concatenate([sid_a, sid_a, sid_n])   # (3B,)
                pool_w = jnp.concatenate([weights] * 3)
                d_all = jnp.sqrt(jnp.maximum(
                    jnp.sum((ea[:, None] - pool[None]) ** 2, axis=-1), 1e-12
                ))                                                  # (B, 3B)
                valid = (pool_sid[None, :] != sid_a[:, None]) & (
                    pool_w[None, :] > 0.0
                )
                inf = jnp.float32(1e9)
                harder = valid & (d_all > d_ap[:, None])
                semi = harder & (d_all < d_ap[:, None] + 0.2)
                cand = jnp.where(
                    semi.any(-1)[:, None],
                    jnp.where(semi, d_all, inf),
                    jnp.where(
                        harder.any(-1)[:, None],
                        jnp.where(harder, d_all, inf),
                        jnp.where(valid, d_all, inf),
                    ),
                )
                j = jnp.argmin(cand, axis=-1)
                en_sel = pool[j]
                d_an = jnp.sqrt(jnp.sum((ea - en_sel) ** 2, axis=-1))
            else:
                d_an = jnp.sqrt(jnp.sum((ea - en) ** 2, axis=-1))
            per = jnp.maximum(d_ap - d_an + 0.2, 0.0)
            loss = jnp.sum(per * weights) / jnp.sum(weights)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda x, u: x + u, params, updates)
        return new_params, new_state, new_opt_state, loss

    def make_batch(i):
        arrays = triplet_dataset.batch(i, batch_size)
        if mining == "semi_hard":
            sa, sn = triplet_dataset.batch_subject_codes(i, batch_size)
            a, p, n, sa, sn, w = _pad_batch(
                (*arrays, sa, sn), batch_size, n_dev
            )
        else:
            a, p, n, w = _pad_batch(arrays, batch_size, n_dev)
        if dtype == jax.numpy.bfloat16:
            # See train_detector: bf16 upload is transparent to the bf16
            # forward and halves the (3x-stacked) host->device bytes.
            a, p, n = (x.astype(ml_dtypes.bfloat16) for x in (a, p, n))
        if mining == "semi_hard":
            return a, p, n, w, sa, sn
        return a, p, n, w

    if device_data is None:
        b0 = make_batch(0)
        budget = float(os.environ.get("FVY_DEVICE_DATA_BUDGET", 4e9))
        device_data = steps * sum(x.nbytes for x in b0) <= budget

    params = mesh_lib.put_tree(params, pspec)
    state = jax.device_put(state, repl)
    opt_state = type(opt_state)(
        count=jax.device_put(opt_state.count, repl),
        mu=mesh_lib.put_tree(opt_state.mu, opt_spec.mu),
        nu=mesh_lib.put_tree(opt_state.nu, opt_spec.nu),
    )

    n_feeds = 6 if mining == "semi_hard" else 4
    losses = []
    if device_data:
        stacked = [make_batch(i) for i in range(steps)]
        data_stacked = mesh_lib.stacked_batch_sharded(mesh)
        dev = tuple(
            jax.device_put(np.stack([s[j] for s in stacked]), data_stacked)
            for j in range(n_feeds)
        )
        del stacked

        def epoch_fn(params, state, opt_state, *feeds):
            def body(carry, xs):
                params, state, opt_state = carry
                params, state, opt_state, loss = step_fn(
                    params, state, opt_state, *xs
                )
                return (params, state, opt_state), loss

            (params, state, opt_state), ep_losses = jax.lax.scan(
                body, (params, state, opt_state), feeds
            )
            return params, state, opt_state, ep_losses

        jit_epoch = jax.jit(
            epoch_fn,
            in_shardings=(pspec, repl, opt_spec) + (data_stacked,) * n_feeds,
            out_shardings=(pspec, repl, opt_spec, repl),
            donate_argnums=(0, 1, 2),
            compiler_options=tpu_compiler_options("train"),
        )
    else:
        jit_step = jax.jit(
            step_fn,
            in_shardings=(pspec, repl, opt_spec) + (data,) * n_feeds,
            out_shardings=(pspec, repl, opt_spec, repl),
            donate_argnums=(0, 1, 2),
            compiler_options=tpu_compiler_options("train"),
        )

    for epoch in range(int(hps["epochs"])):
        t0 = time.time()
        if device_data:
            params, state, opt_state, ep_losses = jit_epoch(
                params, state, opt_state, *dev
            )
            losses.extend(np.asarray(ep_losses))  # np. forces a d2h sync
        else:
            for feeds in prefetch_batches(make_batch, steps):
                params, state, opt_state, loss = jit_step(
                    params, state, opt_state, *feeds
                )
                losses.append(loss)
        if epoch_times is not None:
            epoch_times.append(time.time() - t0)
        print(f"identifier epoch {epoch + 1}: loss {float(losses[-1]):.6f}")
        if (checkpoint_every and checkpoint_path
                and (epoch + 1) % checkpoint_every == 0
                and (epoch + 1) < int(hps["epochs"])):
            from face_vijnana_yolov3_tpu.core.checkpoints import save_checkpoint

            save_checkpoint(
                checkpoint_path,
                {"params": params, "state": state, "opt_state": opt_state},
                meta={"qat": bool(fakequant)},
            )
            _write_history(history_path, [float(l) for l in losses])

    losses = [float(l) for l in losses]
    _write_history(history_path, losses)
    if finalize_bn:
        recal = jax.jit(
            lambda p, s, x: model.embed(p, s, x, train=True, bn_momentum=0.0)
        )

        class _Stacked:
            """Adapt triplet batches to (images,) for BN recalibration."""

            def steps(self, bs):
                return triplet_dataset.steps(bs)

            def batch(self, i, bs):
                a, pp, nn = triplet_dataset.batch(i, bs)
                return (np.concatenate([a, pp, nn]),)

        state = finalize_bn_stats(recal, params, state, _Stacked(), batch_size)
        state = jax.device_put(state, repl)
    if checkpoint_path:
        from face_vijnana_yolov3_tpu.core.checkpoints import save_checkpoint

        save_checkpoint(
            checkpoint_path,
            {"params": params, "state": state, "opt_state": opt_state},
            meta={"qat": bool(fakequant)},
        )
    return params, state, losses
