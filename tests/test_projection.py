import jax.numpy as jnp
import numpy as np

from mulit_view_object_detection_tpu.config import Config
from mulit_view_object_detection_tpu.ops.projection import (
    pose_inverse, project_grid, unproject_features, unproject_rays,
    voxel_grid_points)


class VoxCfg(Config):
    NAME = "vox"
    NUM_VIEWS = 2
    nvox = 8
    nvox_z = 8
    vmin, vmax = -2.0, 2.0
    vmin_z, vmax_z = 1.0, 5.0
    samples = 4
    IMAGE_MIN_DIM = 64
    IMAGE_MAX_DIM = 64


def identity_pose(b, v):
    return np.tile(np.eye(3, 4, dtype=np.float32), (b, v, 1, 1))


def simple_K(f=64.0, c=32.0):
    return np.array([[f, 0, c], [0, f, c], [0, 0, 1]], dtype=np.float32)


def test_pose_inverse_roundtrip(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    t = rng.randn(3)
    Rt = np.concatenate([q, t[:, None]], axis=1).astype(np.float32)[None]
    inv = np.asarray(pose_inverse(jnp.asarray(Rt)))[0]
    # compose: inv o Rt == identity on points
    pts = rng.randn(3, 10).astype(np.float32)
    world = Rt[0, :, :3] @ pts + Rt[0, :, 3:]
    back = inv[:, :3] @ world + inv[:, 3:]
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_voxel_grid_points():
    cfg = VoxCfg()
    pts = voxel_grid_points(cfg)
    assert pts.shape == (4, 8 * 8 * 8)
    # first point: (vmin + vsize/2) for x,y; (vmin_z + vsize_z/2) for z
    np.testing.assert_allclose(pts[:, 0], [-1.75, -1.75, 1.25, 1.0],
                               atol=1e-6)
    # z varies fastest
    np.testing.assert_allclose(pts[:, 1], [-1.75, -1.75, 1.75, 1.0],
                               atol=1e-6)
    # all homogeneous
    assert (pts[3] == 1).all()


def test_unproject_identity_camera(rng):
    """With an identity pose, a voxel center (X, Y, Z) must receive the
    bilinear feature sample at pixel (f*X/Z + c) scaled to the feature map."""
    cfg = VoxCfg()
    K = simple_K()
    fh = fw = 16  # feature map 16x16 for a 64x64 image -> rsz 0.25
    feats = rng.rand(1, 2, fh, fw, 3).astype(np.float32)
    Rcam = identity_pose(1, 2)
    pts = voxel_grid_points(cfg)
    out = np.asarray(unproject_features(
        jnp.asarray(feats), jnp.asarray(Rcam), jnp.asarray(K[None]),
        (64, 64), jnp.asarray(pts), (8, 8, 8)))
    assert out.shape == (1, 2, 8, 8, 8, 3)

    # voxel index (4, 4, 2): center x=0.25, y=0.25, z=2.25
    X, Y, Z = 0.25, 0.25, 2.25
    px = (64 * X / Z + 32) * (fw / 64.0)
    py = (64 * Y / Z + 32) * (fh / 64.0)
    x0, y0 = int(np.floor(px)), int(np.floor(py))
    lx, ly = px - x0, py - y0
    for view in range(2):
        f = feats[0, view]
        expect = (f[y0, x0] * (1 - ly) * (1 - lx) + f[y0, x0 + 1] * (1 - ly) * lx
                  + f[y0 + 1, x0] * ly * (1 - lx) + f[y0 + 1, x0 + 1] * ly * lx)
        np.testing.assert_allclose(out[0, view, 4, 4, 2], expect, atol=1e-5)


def test_unproject_out_of_frustum_zero():
    """The grid is anchored to VIEW 0's camera frame; a second view far off
    to the side can't see it and must contribute zeros, while view 0 (which
    always frames its own grid) stays nonzero."""
    cfg = VoxCfg()
    K = simple_K()
    feats = np.ones((1, 2, 16, 16, 2), dtype=np.float32)
    Rcam = identity_pose(1, 2)
    Rcam[0, 1, 0, 3] = 1000.0  # view-1 camera 1 km to the side
    pts = voxel_grid_points(cfg)
    out = np.asarray(unproject_features(
        jnp.asarray(feats), jnp.asarray(Rcam), jnp.asarray(K[None]),
        (64, 64), jnp.asarray(pts), (8, 8, 8)))
    assert np.all(out[0, 1] == 0)
    assert out[0, 0].max() > 0


def test_project_grid_ones_roundtrip():
    """Projecting an all-ones grid: rays whose samples land inside the grid
    read 1.0; z-samples span the grid depth so most are inside."""
    cfg = VoxCfg()
    K = simple_K()
    grid = np.ones((1, 8, 8, 8, 2), dtype=np.float32)
    out = np.asarray(project_grid(jnp.asarray(grid), jnp.asarray(K[None]),
                                  (64, 64), 16, cfg.samples, cfg))
    assert out.shape == (1, cfg.samples, 16, 16, 2)
    # center pixel rays point near the grid axis -> all depth samples inside
    assert np.all(out[0, :, 8, 8] == 1.0)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_project_grid_single_voxel():
    """A single hot voxel on the optical axis is seen by the center pixel at
    the right depth sample."""
    cfg = VoxCfg()
    K = simple_K()
    grid = np.zeros((1, 8, 8, 8, 1), dtype=np.float32)
    # voxel containing camera-frame point (0, 0, z) for each z sample:
    # z samples: linspace(1.25, 4.75, 4) = [1.25, 2.4167, 3.5833, 4.75]
    # voxel z index for 1.25: (1.25 - 1.25)/(5-1.25)*8 = 0 -> round 0
    # x,y index: (0 - (-2))/4*8 = 4 -> round 4
    grid[0, 4, 4, 0, 0] = 7.0
    out = np.asarray(project_grid(jnp.asarray(grid), jnp.asarray(K[None]),
                                  (64, 64), 16, cfg.samples, cfg))
    assert out[0, 0, 8, 8, 0] == 7.0       # first depth sample sees it
    assert out[0, -1, 8, 8, 0] == 0.0      # deepest sample does not


def test_project_grid_batched():
    """Batch entries are independent (guards the gather broadcasting)."""
    cfg = VoxCfg()
    K = np.stack([simple_K(), simple_K()])
    rng = np.random.RandomState(3)
    grid = rng.rand(2, 8, 8, 8, 2).astype(np.float32)
    out = np.asarray(project_grid(jnp.asarray(grid), jnp.asarray(K),
                                  (64, 64), 8, cfg.samples, cfg))
    for b in range(2):
        solo = np.asarray(project_grid(jnp.asarray(grid[b:b + 1]),
                                       jnp.asarray(K[b:b + 1]),
                                       (64, 64), 8, cfg.samples, cfg))
        np.testing.assert_allclose(out[b], solo[0], atol=1e-6)


def test_project_grid_trilinear_runs():
    cfg = VoxCfg()
    K = simple_K()
    grid = np.random.RandomState(0).rand(1, 8, 8, 8, 2).astype(np.float32)
    out = np.asarray(project_grid(jnp.asarray(grid), jnp.asarray(K[None]),
                                  (64, 64), 8, cfg.samples, cfg,
                                  method="trilinear"))
    assert out.shape == (1, cfg.samples, 8, 8, 2)
    assert np.isfinite(out).all()
    assert out.max() <= grid.max() + 1e-5  # interpolation can't overshoot


def test_project_grid_trilinear_z_centers_full_weight():
    """The z axis normalizes over [vmin_z + vsize_z/2, vmax_z] (faithful
    reference convention), so depth-sample points at z-cell centers map
    to INTEGER gz — the trilinear blend must put full weight on that
    slice. A spurious extra -0.5 z shift (the original trilinear code)
    half-blends into slice z-1 and returns HALF the stored value at the
    first depth sample."""
    cfg = VoxCfg()
    K = simple_K()
    # constant over x/y so x/y interpolation is neutral; only slice z=0 lit
    grid = np.zeros((1, 8, 8, 8, 1), dtype=np.float32)
    grid[:, :, :, 0, 0] = 7.0
    out = np.asarray(project_grid(jnp.asarray(grid), jnp.asarray(K[None]),
                                  (64, 64), 8, cfg.samples, cfg,
                                  method="trilinear"))
    # first depth sample (z = 1.25 = slice-0 center): full value, and
    # identical to the nearest path at this exact-center geometry
    assert abs(out[0, 0, 4, 4, 0] - 7.0) < 1e-5, out[0, 0, 4, 4, 0]
    near = np.asarray(project_grid(jnp.asarray(grid), jnp.asarray(K[None]),
                                   (64, 64), 8, cfg.samples, cfg,
                                   method="nearest"))
    np.testing.assert_allclose(out[0, 0, 4, 4], near[0, 0, 4, 4],
                               atol=1e-5)


def test_unproject_rays_identity(rng):
    """Identity pose, constant depth d: token world position for pixel
    (y, x) is K^-1 (x+.5, y+.5, 1) * d."""
    fh = fw = 4
    feats = rng.rand(1, 1, fh, fw, 6).astype(np.float32)
    depth = np.full((1, 1, fh, fw), 2.0, dtype=np.float32)
    K = simple_K(f=64.0, c=32.0)
    Rcam = identity_pose(1, 1)
    positions, tokens = unproject_rays(
        jnp.asarray(feats), jnp.asarray(Rcam), jnp.asarray(K[None]),
        jnp.asarray(depth), (64, 64), samples=1)
    positions, tokens = np.asarray(positions), np.asarray(tokens)
    assert positions.shape == (1, fh * fw, 3)
    assert tokens.shape == (1, fh * fw, 6)
    # token n corresponds to pixel (y = n // fw, x = n % fw)
    n = 5  # y=1, x=1
    # feature-plane K = K * (fh/64) -> f=4, c=2; pixel center (1.5, 1.5)
    expect = np.array([(1.5 - 2.0) / 4.0, (1.5 - 2.0) / 4.0, 1.0]) * 2.0
    np.testing.assert_allclose(positions[0, n], expect, atol=1e-5)
    np.testing.assert_allclose(tokens[0, n], feats[0, 0, 1, 1], atol=1e-6)


def test_camera_anchored_grid_points():
    """Camera-anchored lattice (Notebook/projection.py:86-97): centered at
    R0 . [0, 0, GRID_DIST, 1] in world frame, symmetric vsize spacing."""
    from mulit_view_object_detection_tpu.ops.projection import (
        camera_anchored_grid_points)

    cfg = VoxCfg()
    cfg.GRID_DIST = 4.0
    Rcam = identity_pose(1, 2)
    Rcam[0, 0, 1, 3] = 0.5      # main camera translated +y in world
    pts = camera_anchored_grid_points(cfg, Rcam)
    assert pts.shape == (1, 4, cfg.nvox * cfg.nvox * cfg.nvox_z)
    center = pts[0, :3].mean(axis=1)
    np.testing.assert_allclose(center, [0.0, 0.5, 4.0], atol=1e-5)
    # spacing along z (fastest axis)
    vsize_z = (cfg.vmax_z - cfg.vmin_z) / cfg.nvox_z
    np.testing.assert_allclose(pts[0, 2, 1] - pts[0, 2, 0], vsize_z,
                               atol=1e-6)
    np.testing.assert_allclose(pts[0, 3], 1.0)
