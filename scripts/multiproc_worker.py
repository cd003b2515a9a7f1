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
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
