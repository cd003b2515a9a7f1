"""Embedding-space + reconstruction analysis (reference C32 parity).

Runnable equivalent of the reference's exploratory notebook
/root/reference/analysis/face_recog_analysis.ipynb, operating on this
framework's own artifacts:

1. Registry distance study (notebook cells 3-8): load
   `ref_facial_id_db.pickle` (the C22 registry, same pickle format), print
   min/max/mean L2 distances from each subject's mean embedding to every
   other, and save a distance histogram PNG.
2. Model summary parity (cells 13-17, facial_idetity_analysis.txt:26-40):
   per-component parameter counts of the identifier — the reference reports
   base (truncated trunk) = 40,620,640 params and dense1 = 11,075,648
   (173056*64 + 64); the generated graph must reproduce both numbers exactly.
3. dense1 inversion + face reconstruction (cells 14-25, 42-50): build the
   reconstruction decoder (models/recon.py = the notebook's
   `create_face_reconst_model` surgery, dense1^T + random-bias quirk),
   decode a registry embedding to image space, and save the notebook's
   normalized visualizations — full depth plus two truncated depths
   (the notebook probes `leaky_re_lu_1/2` and `conv_62`).

Usage: python analysis/face_recog_analysis.py [workdir] [out_dir]
  workdir: directory holding ref_facial_id_db.pickle + an identifier
  checkpoint dir `fi_ckpt` (e.g. a scripts/synthetic_fi_e2e.py workdir).
  Without one, the study runs on a freshly initialized identifier and a
  random registry — same mechanics, untrained weights.
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _param_count(tree) -> int:
    import jax

    return sum(int(np.prod(np.asarray(v).shape))
               for v in jax.tree_util.tree_leaves(tree))


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else None
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "analysis_out"
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # pure-analysis script

    from face_vijnana_yolov3_tpu.models.identifier import FaceIdentifierModel
    from face_vijnana_yolov3_tpu.models.recon import FaceReconstructionModel

    model = FaceIdentifierModel()
    rng = jax.random.PRNGKey(0)

    # ---- artifacts --------------------------------------------------------
    registry = None
    params = state = None
    if workdir:
        reg_path = os.path.join(workdir, "ref_facial_id_db.pickle")
        if os.path.exists(reg_path):
            with open(reg_path, "rb") as f:
                registry = pickle.load(f)
            print(f"registry: {len(registry)} subjects from {reg_path}")
        ckpt = os.path.join(workdir, "fi_ckpt")
        if os.path.isdir(ckpt):
            from face_vijnana_yolov3_tpu.core.checkpoints import load_checkpoint

            loaded = load_checkpoint(ckpt)
            params, state = loaded["params"], loaded["state"]
            print(f"identifier checkpoint loaded from {ckpt}")
    if params is None:
        params, state = model.init(rng)
        print("identifier: fresh random init (no checkpoint given)")
    if registry is None:
        ids = jax.random.normal(jax.random.PRNGKey(1), (64, model.dense1_dim))
        ids = ids / jnp.linalg.norm(ids, axis=-1, keepdims=True)
        registry = {i + 1: np.asarray(v) for i, v in enumerate(ids)}
        print("registry: 64 random unit embeddings (no pickle given)")

    # ---- 1. registry distance study (notebook cells 3-8) ------------------
    subjects = sorted(registry)
    E = np.stack([np.asarray(registry[s], np.float64) for s in subjects])
    d = np.linalg.norm(E[:, None, :] - E[None, :, :], axis=-1)
    probe = subjects[0]
    row = d[0][1:]  # distances from the first subject to every other
    print(f"subject {probe}: min {row.min():.4f} max {row.max():.4f} "
          f"mean {row.mean():.4f}  (cells 4-7 equivalent)")
    off = d[np.triu_indices(len(subjects), k=1)]
    print(f"all pairs:  min {off.min():.4f} max {off.max():.4f} "
          f"mean {off.mean():.4f}  n={off.size}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.hist(off, bins=100)
    ax.set_xlabel("L2 distance between subject mean embeddings")
    ax.set_ylabel("pairs")
    fig.tight_layout()
    hist_png = os.path.join(out_dir, "registry_distances.png")
    fig.savefig(hist_png, dpi=100)
    print(f"wrote {hist_png}")

    # ---- 2. model summary parity (facial_idetity_analysis.txt:26-40) ------
    # the reference count is a Keras model summary TOTAL (trainable +
    # non-trainable), so BN moving stats — kept in `state` here — count too
    trunk_params = {k: v for k, v in params.items()
                    if k.startswith(("conv_", "bnorm_"))}
    trunk_state = {k: v for k, v in state.items()
                   if k.startswith(("conv_", "bnorm_"))}
    dense1 = params["dense1"]
    n_base = _param_count(trunk_params) + _param_count(trunk_state)
    n_dense1 = _param_count(dense1)
    print(f"base params   {n_base:,} (reference model summary: 40,620,640)")
    print(f"dense1 params {n_dense1:,} (reference: 11,075,648)")
    assert n_base == 40_620_640, n_base
    assert n_dense1 == 173056 * 64 + 64, n_dense1

    # dense1 inversion shape check (cells 14-22): W^T maps 64 -> 173056
    W = np.asarray(dense1["kernel"])
    print(f"dense1 kernel {W.shape} -> inverted {W.T.shape} (cells 16-22)")

    # ---- 3. reconstruction visualizations (cells 23-25, 42-50) ------------
    recon = FaceReconstructionModel(image_size=model.image_size,
                                    dense1_dim=model.dense1_dim)
    rparams, rstate = recon.init(jax.random.PRNGKey(2), params)
    print(f"recon decoder: {len(recon.ops)} ops, "
          f"{_param_count(rparams):,} params")

    z = jnp.asarray(E[:1], jnp.float32)

    def save_vis(img, name):
        """Notebook cell-42 normalization: res / ||res||_channel, then shift
        to [0,1] for imsave."""
        res = np.asarray(img[0], np.float64)
        n = np.sqrt(np.maximum((res ** 2).sum(-1, keepdims=True), 1e-12))
        res = res / n
        lo, hi = res.min(), res.max()
        vis = (res - lo) / max(hi - lo, 1e-12)
        path = os.path.join(out_dir, name)
        plt.imsave(path, vis)
        print(f"wrote {path}  (shape {res.shape}, raw min {lo:.3f} "
              f"max {hi:.3f})")

    full, _ = jax.jit(lambda z: recon.apply(rparams, rstate, z))(z)
    save_vis(full, "recon_full.png")

    # truncated depths: stop the decoder early and project the intermediate
    # feature's first 3 channels (the notebook's ad-hoc Conv2D(3,1) probes,
    # cells 42-50, use an untrained projection — channel slicing is the
    # deterministic equivalent)
    for n_ops in (len(recon.ops) // 4, len(recon.ops) // 2):
        trunc = FaceReconstructionModel(image_size=model.image_size,
                                        dense1_dim=model.dense1_dim)
        trunc.ops = recon.ops[:n_ops]
        mid, _ = jax.jit(lambda z: trunc.apply(rparams, rstate, z))(z)
        save_vis(mid[..., :3], f"recon_depth{n_ops}.png")


if __name__ == "__main__":
    main()
