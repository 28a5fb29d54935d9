"""Standalone geometry sandbox — the runnable equivalent of the reference's
Notebook/projection.py ProjectionNet (unproject -> fuse -> reproject alone,
outside the detector), for eyeballing the projective pipeline on synthetic
scenes.

  PYTHONPATH=.:$PYTHONPATH python examples/projection_playground.py

Renders a 2-view synthetic scene, lifts RGB images (as 3-channel "features")
into the voxel grid, mean-fuses, reprojects to the main view at several
depths, and writes a contact sheet to projection_playground.png.
"""

import numpy as np

from mulit_view_object_detection_tpu.config import Config
from mulit_view_object_detection_tpu.data.synthetic import SyntheticScene
from mulit_view_object_detection_tpu.ops.projection import (
    project_grid, unproject_features, voxel_grid_points)


class GeoCfg(Config):
    NAME = "geo"
    NUM_VIEWS = 2
    IMAGE_MIN_DIM = 64
    IMAGE_MAX_DIM = 64
    nvox = 32
    nvox_z = 32
    vmin, vmax = -2.0, 2.0
    vmin_z, vmax_z = 1.0, 7.0
    samples = 6


def main():
    import argparse

    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mulit_view_object_detection_tpu.ops.projection import (
        camera_anchored_grid_points, pose_inverse)

    ap = argparse.ArgumentParser()
    ap.add_argument("--camera-anchored", action="store_true",
                    help="center the voxel lattice GRID_DIST meters in "
                         "front of the main camera (the reference's "
                         "Notebook/projection.py:86-97 sandbox variant) "
                         "instead of the fixed main-view-frame lattice")
    args = ap.parse_args()

    cfg = GeoCfg()
    rng = np.random.RandomState(0)
    scene = SyntheticScene(rng, num_objects=3, num_views=2, image_size=64)

    images = np.stack([scene.render(v)[0] for v in range(2)])  # [2,64,64,3]
    feats = (images.astype(np.float32) / 255.0)[None]          # [1,2,...]
    Rcam = scene.poses[None].astype(np.float32)
    K = scene.K[None].astype(np.float32)

    if args.camera_anchored:
        # world-frame anchored lattice -> main-camera frame (the
        # projection pipeline expects main-view-frame points)
        pts_w = camera_anchored_grid_points(cfg, Rcam)         # [1, 4, N]
        w2c0 = np.asarray(pose_inverse(jnp.asarray(Rcam[:, 0])))
        cam = np.einsum("bij,bjn->bin", w2c0, pts_w)[0]        # [3, N]
        pts = np.concatenate([cam, np.ones((1, cam.shape[-1]))],
                             axis=0).astype(np.float32)
    else:
        pts = voxel_grid_points(cfg)
    vox = unproject_features(jnp.asarray(feats), jnp.asarray(Rcam),
                             jnp.asarray(K), (64, 64), jnp.asarray(pts),
                             (cfg.nvox, cfg.nvox, cfg.nvox_z))
    fused = jnp.mean(vox, axis=1)                              # mean fusion
    rays = project_grid(fused, jnp.asarray(K), (64, 64), 64, cfg.samples,
                        cfg)
    rays = np.asarray(rays)[0]                                 # [S_d,64,64,3]

    fig, axes = plt.subplots(2, max(cfg.samples, 2) // 2 + 1,
                             figsize=(14, 6))
    axes = axes.ravel()
    axes[0].imshow(images[0]); axes[0].set_title("view 0 (main)")
    axes[1].imshow(images[1]); axes[1].set_title("view 1")
    for s in range(cfg.samples):
        ax = axes[2 + s]
        ax.imshow(np.clip(rays[s], 0, 1))
        ax.set_title(f"reprojection depth {s}")
    for ax in axes:
        ax.axis("off")
    fig.savefig("projection_playground.png", bbox_inches="tight", dpi=80)
    print("wrote projection_playground.png")


if __name__ == "__main__":
    main()
