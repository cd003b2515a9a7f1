"""Multi-host DP worker: one detector train step over a process-spanning mesh.

Backs the framework's multi-host claim (COMPONENTS.md P3 — the reference has
no multi-node capability at all, SURVEY §2 P3): tests/test_multiprocess.py
launches TWO of these processes, each owning 4 virtual CPU devices, joined by
`jax.distributed.initialize` over a local TCP coordinator. Both run ONE
data-parallel detector train step on the same deterministic global batch; the
jitted program's loss reduction and gradient all-reduce cross the process
boundary, and the printed loss/param-checksum must match the single-process
8-device run of the exact same function (the parent test computes it).

Run directly:  python scripts/multiproc_worker.py <pid> <nproc> <port>
Prints one line: RESULT <loss> <param_checksum>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGE_SIZE = 64   # grid 2: small enough for a fast CPU fwd+bwd compile
BATCH = 8         # one image per device on the 8-device global mesh


def dp_step_result(mesh):
    """One detector DP train step on `mesh`; returns (loss, param_checksum).

    Mirrors train/trainer.train_detector's step (weighted-MSE loss,
    keras_adam update) on a deterministic model init + batch, with the batch
    laid out over the mesh's 'data' axis via make_array_from_callback — the
    only construction that works identically on single- and multi-process
    meshes (device_put cannot target non-addressable shards).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.parallel import mesh as mesh_lib
    from face_vijnana_yolov3_tpu.train.optimizer import keras_adam

    model = FaceDetectorModel(image_size=IMAGE_SIZE)
    params, state = model.init(jax.random.PRNGKey(0))  # host-side numpy init
    tx = keras_adam(1e-3, 0.99, 0.99, 0.0)
    opt_state = tx.init(params)

    grid = IMAGE_SIZE // 32
    rng = np.random.default_rng(0)
    imgs_np = rng.uniform(0, 1, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(
        np.float32
    )
    gts_np = rng.uniform(0, 1, (BATCH, grid, grid, 6)).astype(np.float32)
    ws_np = np.ones((BATCH,), np.float32)

    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharded(mesh)

    def put(arr, sharding):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    imgs, gts, ws = put(imgs_np, data), put(gts_np, data), put(ws_np, data)
    params = jax.tree.map(lambda x: put(np.asarray(x), repl), params)
    state = jax.tree.map(lambda x: put(np.asarray(x), repl), state)
    opt_state = jax.tree.map(lambda x: put(np.asarray(x), repl), opt_state)

    def step_fn(params, state, opt_state, images, gts, weights):
        def loss_fn(p):
            pred, new_state = model.apply(p, state, images, train=True)
            per = jnp.mean(jnp.square(pred - gts), axis=(1, 2, 3))
            return jnp.sum(per * weights) / jnp.sum(weights), new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        checksum = sum(
            jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(new_params)
        )
        return loss, checksum

    jit_step = jax.jit(
        step_fn,
        in_shardings=(
            jax.tree.map(lambda _: repl, params),
            jax.tree.map(lambda _: repl, state),
            jax.tree.map(lambda _: repl, opt_state),
            data, data, data,
        ),
        out_shardings=(repl, repl),
    )
    loss, checksum = jit_step(params, state, opt_state, imgs, gts, ws)
    return float(loss), float(checksum)


def fi_step_result(mesh):
    """One identifier DP x TP train step on `mesh`; returns (loss, checksum).

    Mirrors train/trainer.train_identifier's sharded step at the same
    standard as dp_step_result: the triplet [a;p;n] stack forwards through
    the shared trunk (DP over 'data'), dense1's 4096-wide kernel input dim
    shards over 'model' (TP — the partial products all-reduce inside the
    jitted program), Adam moments shard like their params. On a 2-process
    mesh the gradient psum AND the TP reduction cross the process boundary.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel
    from face_vijnana_yolov3_tpu.parallel import mesh as mesh_lib
    from face_vijnana_yolov3_tpu.train.optimizer import keras_adam

    model = FaceIdentifierModel(image_size=IMAGE_SIZE, dense1_dim=16)
    params, state = model.init(jax.random.PRNGKey(0))
    tx = keras_adam(1e-3, 0.99, 0.99, 0.0)
    opt_state = tx.init(params)

    rng = np.random.default_rng(1)
    shape = (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)
    a_np, p_np, n_np = (
        rng.uniform(0, 1, shape).astype(np.float32) for _ in range(3)
    )
    w_np = np.ones((BATCH,), np.float32)

    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.batch_sharded(mesh)
    pspec = mesh_lib.shard_identifier_params(mesh, params)
    opt_spec = type(opt_state)(
        count=repl,
        mu=mesh_lib.shard_identifier_params(mesh, opt_state.mu),
        nu=mesh_lib.shard_identifier_params(mesh, opt_state.nu),
    )

    def put(arr, sharding):
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    a, p, n = put(a_np, data), put(p_np, data), put(n_np, data)
    w = put(w_np, data)
    params = jax.tree.map(lambda x, s: put(np.asarray(x), s), params, pspec)
    state = jax.tree.map(lambda x: put(np.asarray(x), repl), state)
    opt_state = type(opt_state)(
        count=put(np.asarray(opt_state.count), repl),
        mu=jax.tree.map(lambda x, s: put(np.asarray(x), s),
                        opt_state.mu, opt_spec.mu),
        nu=jax.tree.map(lambda x, s: put(np.asarray(x), s),
                        opt_state.nu, opt_spec.nu),
    )

    d = model.dense1_dim

    def step_fn(params, state, opt_state, a, p, n, weights):
        def loss_fn(prm):
            out, new_state = model.triplet_forward(
                prm, state, a, p, n, train=True
            )
            ea, ep, en = out[:, :d], out[:, d:2 * d], out[:, 2 * d:]
            d_ap = jnp.sqrt(jnp.sum((ea - ep) ** 2, axis=-1))
            d_an = jnp.sqrt(jnp.sum((ea - en) ** 2, axis=-1))
            per = jnp.maximum(d_ap - d_an + 0.2, 0.0)
            return jnp.sum(per * weights) / jnp.sum(weights), new_state

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, _ = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda x, u: x + u, params, updates)
        checksum = sum(
            jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(new_params)
        )
        return loss, checksum

    jit_step = jax.jit(
        step_fn,
        in_shardings=(pspec, jax.tree.map(lambda _: repl, state), opt_spec,
                      data, data, data, data),
        out_shardings=(repl, repl),
    )
    loss, checksum = jit_step(params, state, opt_state, a, p, n, w)
    return float(loss), float(checksum)


def int8_serve_result(mesh):
    """The calibrated int8 DP serving program on `mesh`; returns
    (count_sum, cand_checksum).

    Same program parallel/serving's detect DP path runs: calibrate on a
    deterministic batch (bit-deterministic cross-process —
    scripts/probe_calib_determinism.py), close the qparams over a jitted
    batch-sharded detect+postprocess, and checksum the outputs. The int8
    arithmetic is integer-exact, so the multi-process result must match the
    single-process mesh's bitwise on counts.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from face_vijnana_yolov3_tpu.models.detector import FaceDetectorModel
    from face_vijnana_yolov3_tpu.ops.postprocess import (
        FacePostprocessConfig,
        face_postprocess,
    )
    from face_vijnana_yolov3_tpu.parallel import mesh as mesh_lib

    model = FaceDetectorModel(image_size=IMAGE_SIZE)
    params, state = model.init(jax.random.PRNGKey(2))
    folded = model.fold(params, state)
    rng = np.random.default_rng(3)
    x_calib = jnp.asarray(
        rng.uniform(0, 1, (4, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)
    )
    qparams = jax.device_get(model.quantize(folded, x_calib))

    cfg = FacePostprocessConfig(image_size=IMAGE_SIZE, grid=IMAGE_SIZE // 32,
                                conf_th=0.1)
    data = mesh_lib.batch_sharded(mesh)
    repl = mesh_lib.replicated(mesh)

    def serve(images):
        head = model.apply_quant(qparams, images)
        return jax.vmap(lambda h: face_postprocess(h, cfg))(head)

    jit_serve = jax.jit(serve, in_shardings=(data,),
                        out_shardings=(repl, repl))
    imgs_np = rng.uniform(
        0, 1, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.float32)
    imgs = jax.make_array_from_callback(
        imgs_np.shape, data, lambda idx: imgs_np[idx]
    )
    cands, counts = jit_serve(imgs)
    return float(jnp.sum(counts)), float(jnp.sum(jnp.abs(cands)))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from face_vijnana_yolov3_tpu.parallel import init_distributed, make_mesh

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    print(f"# process {pid}/{nproc}: {n_local} local / {n_global} global "
          "devices", flush=True)
    assert n_global == 4 * nproc, f"expected {4 * nproc} global devices"
    mesh = make_mesh()
    loss, checksum = dp_step_result(mesh)
    print(f"RESULT {loss!r} {checksum!r}", flush=True)
    # Identifier DP x TP (data 4 x model 2): the 'model' pairs sit inside
    # one process, the 'data' axis spans both — TP reduction AND grad psum
    # cross topology kinds in one program.
    fi_loss, fi_ck = fi_step_result(make_mesh(model_axis=2))
    print(f"RESULT_FI {fi_loss!r} {fi_ck!r}", flush=True)
    i8_counts, i8_ck = int8_serve_result(make_mesh())
    print(f"RESULT_INT8 {i8_counts!r} {i8_ck!r}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
