"""Projective multi-view geometry: lift 2D FPN features into a 3D voxel grid
anchored to the main view's camera frame, and render the fused grid back to
the image plane along pixel rays.

Re-derivation of the reference's core novel ops (all gather-bound in TF):

  unproject_features  <- unproj_feat   (model_multi.py:130-228)
  project_grid        <- proj_grid + nearest3 (model_multi.py:231-322, 357-369)
  unproject_rays      <- unproj_vector (model_transformer.py:372-424)

Conventions (verified against the reference):
  * `Rcam[b, v]` is a [3, 4] CAMERA->WORLD pose; the world->camera matrix is
    [R^T | -R^T t] (model_multi.py:137-143).
  * The voxel grid lives in the MAIN VIEW's camera frame: the reference
    composes K_v [R_v^T|-R_v^T t_v] with view-0's pose extended to 4x4
    (model_multi.py:174-180). x,y span [vmin, vmax], z (depth) spans
    [vmin_z, vmax_z]; cell centers at vmin + vsize/2 + i*vsize.
  * Grid tensor axes are [B, V, nx, ny, nz, C] — the reference builds (y, x,
    z) from tf.meshgrid and transposes to (x, y, z) (model_multi.py:223-227);
    we build (x, y, z) directly.
  * In `project_grid` the reference lifts pixels to world and immediately
    maps them back with the same view-0 pose (model_multi.py:278-290) — an
    exact no-op since the grid is in the view-0 frame; we skip the round
    trip, so only K is needed.
  * Out-of-frustum samples: the reference does no bounds handling; TF's GPU
    gather_nd silently yields zeros for OOB indices (CPU crashes). We
    implement the GPU behavior deliberately: per-tap validity masks zero OOB
    contributions.

TPU notes: the bilinear/nearest gathers are the hot loops (HOT LOOP #1/#3 in
SURVEY.md §3.1); this module is the XLA reference implementation, with fused
Pallas kernels in kernels/.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Grid construction (host-side, static)
# ---------------------------------------------------------------------------

def voxel_grid_points(config):
    """Homogeneous voxel-center coordinates [4, nx*ny*nz] in the main-view
    camera frame, index order (x, y, z) with z fastest."""
    gx = np.arange(config.vmin + config.vsize / 2.0, config.vmax,
                   config.vsize)[:config.nvox]
    gz = np.arange(config.vmin_z + config.vsize_z / 2.0, config.vmax_z,
                   config.vsize_z)[:config.nvox_z]
    xs, ys, zs = np.meshgrid(gx, gx, gz, indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel(), zs.ravel(),
                    np.ones(xs.size)], axis=0)
    return pts.astype(np.float32)


def camera_anchored_grid_points(config, Rcam):
    """Camera-anchored voxel lattice (Notebook/projection.py:80-99): the
    grid is centered at ``R0 · [0, 0, GRID_DIST, 1]`` — GRID_DIST meters
    along the main view's optical axis, expressed in WORLD coordinates —
    with symmetric ±(n-1)/2·vsize ranges per axis. The reference's main
    model files never consume GRID_DIST (it is a Notebook-sandbox
    variant); this is the equivalent sandbox utility here
    (examples/projection_playground.py --camera-anchored).

    Rcam: [B, V, 3, 4] cam->world poses. Returns [B, 4, N] homogeneous
    world-frame voxel centers, index order (x, y, z) with z fastest."""
    Rcam = np.asarray(Rcam, np.float64)
    b = Rcam.shape[0]
    vsize = (config.vmax - config.vmin) / config.nvox
    vsize_z = (config.vmax_z - config.vmin_z) / config.nvox_z
    grid_dist = getattr(config, "GRID_DIST", None)
    if grid_dist is None:  # Notebook fallback (projection.py:88-89)
        grid_dist = 600.0 / 320.0 * config.vmax
    r = (np.arange(config.nvox) - (config.nvox - 1) / 2.0) * vsize
    rz = (np.arange(config.nvox_z) - (config.nvox_z - 1) / 2.0) * vsize_z
    center = np.einsum(
        "bij,j->bi", Rcam[:, 0],
        np.array([0.0, 0.0, grid_dist, 1.0]))             # [B, 3]
    xs, ys, zs = np.meshgrid(r, r, rz, indexing="ij")
    lattice = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=0)
    pts = center[:, :, None] + lattice[None]              # [B, 3, N]
    ones = np.ones((b, 1, pts.shape[-1]))
    return np.concatenate([pts, ones], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Camera math (device)
# ---------------------------------------------------------------------------

def pose_inverse(Rt):
    """[..., 3, 4] cam->world pose -> world->cam [R^T | -R^T t]."""
    R = Rt[..., :, :3]
    t = Rt[..., :, 3:4]
    Rt_T = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate([Rt_T, -Rt_T @ t], axis=-1)


def _to_hom4(Rt):
    """[..., 3, 4] -> [..., 4, 4] by appending [0, 0, 0, 1]."""
    shape = Rt.shape[:-2] + (1, 4)
    last = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), shape)
    return jnp.concatenate([Rt, last], axis=-2)


# ---------------------------------------------------------------------------
# Unprojection: image features -> voxel grid
# ---------------------------------------------------------------------------

def unproject_features(feats, Rcam, Kmat, image_shape, grid_pts, grid_shape):
    """Lift per-view 2D features into the shared voxel grid (4-tap bilinear).

    feats: [B, V, fh, fw, C]; Rcam: [B, V, 3, 4] cam->world poses;
    Kmat: [B, 3, 3]; image_shape: (H, W) of the molded input;
    grid_pts: [4, N] from voxel_grid_points; grid_shape: (nx, ny, nz).

    Returns [B, V, nx, ny, nz, C].
    """
    b, v, fh, fw, c = feats.shape
    nx, ny, nz = grid_shape
    rsz_h = fh / float(image_shape[0])
    rsz_w = fw / float(image_shape[1])

    w2c = pose_inverse(Rcam)                     # [B, V, 3, 4]
    KR = jnp.einsum("bij,bvjk->bvik", Kmat, w2c)  # [B, V, 3, 4]
    pose0 = _to_hom4(Rcam[:, 0])                 # [B, 4, 4]
    M = jnp.einsum("bvij,bjk->bvik", KR, pose0)  # [B, V, 3, 4]

    uvw = jnp.einsum("bvij,jn->bvin", M, grid_pts)  # [B, V, 3, N]
    z = uvw[:, :, 2]
    x = uvw[:, :, 0] / z * rsz_w                 # feature-map pixel coords
    y = uvw[:, :, 1] / z * rsz_h

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    lx = x - x0f
    ly = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    flat = feats.reshape(b, v, fh * fw, c)
    bidx = jnp.arange(b)[:, None, None]
    vidx = jnp.arange(v)[None, :, None]

    def tap(yi, xi, wgt):
        valid = (yi >= 0) & (yi < fh) & (xi >= 0) & (xi < fw)
        idx = jnp.clip(yi, 0, fh - 1) * fw + jnp.clip(xi, 0, fw - 1)
        vals = flat[bidx, vidx, idx]             # [B, V, N, C]
        return vals * (wgt * valid)[..., None]

    out = (tap(y0, x0, (1 - ly) * (1 - lx))
           + tap(y0, x0 + 1, (1 - ly) * lx)
           + tap(y0 + 1, x0, ly * (1 - lx))
           + tap(y0 + 1, x0 + 1, ly * lx))
    return out.reshape(b, v, nx, ny, nz, c)


# ---------------------------------------------------------------------------
# Reprojection: voxel grid -> ray slices
# ---------------------------------------------------------------------------

def project_grid(grid, Kmat, image_shape, proj_size, samples, config,
                 method="nearest"):
    """Render the fused grid to the main view as depth-sampled ray slices.

    grid: [B, nx, ny, nz, C] (main-view camera frame); Kmat: [B, 3, 3];
    proj_size: S (output is SxS); samples: depth samples per ray.

    Returns [B, samples, S, S, C].

    method: 'nearest' (reference semantics, model_multi.py:357-369) or
    'trilinear' (numerically superior option, SURVEY.md §2.3).
    """
    b, nx, ny, nz, c = grid.shape
    s = proj_size
    npix = s * s
    rsz = float(proj_size) / float(image_shape[0])

    # pixel centers, homogeneous third coord = rsz so that
    # (rsz*K)^-1 (x, y, rsz) == K^-1 (x/rsz, y/rsz, 1)  (model_multi.py:252-264)
    r = np.arange(0.5, s, 1.0, dtype=np.float32)
    xs, ys = np.meshgrid(r, r)                   # [S, S]: xs[i,j]=j+.5
    pix = np.stack([xs.ravel(), ys.ravel(),
                    np.full(npix, rsz, np.float32)], axis=0)  # [3, npix]

    Kinv = jnp.linalg.inv(Kmat * rsz)            # [B, 3, 3]
    rays = jnp.einsum("bij,jn->bin", Kinv, pix)  # [B, 3, npix], z comp == 1

    z_samples = jnp.linspace(config.vmin_z + config.vsize_z / 2.0,
                             config.vmax_z - config.vsize_z / 2.0, samples)
    Xc = rays[:, None, :, :] * z_samples[None, :, None, None]  # [B,D,3,npix]

    # camera coords -> fractional grid indices (model_multi.py:292-298)
    vmin_v = jnp.array([config.vmin, config.vmin,
                        config.vmin_z + config.vsize_z / 2.0])
    vmax_v = jnp.array([config.vmax, config.vmax, config.vmax_z])
    nvox_v = jnp.array([nx, ny, nz], dtype=jnp.float32)
    g = (Xc - vmin_v[None, None, :, None]) \
        / (vmax_v - vmin_v)[None, None, :, None] * nvox_v[None, None, :, None]

    flat = grid.reshape(b, nx * ny * nz, c)
    bidx = jnp.arange(b)[:, None]

    def gather(ix, iy, iz, wgt=None):
        valid = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                 & (iz >= 0) & (iz < nz))
        idx = ((jnp.clip(ix, 0, nx - 1) * ny + jnp.clip(iy, 0, ny - 1)) * nz
               + jnp.clip(iz, 0, nz - 1))
        vals = flat[bidx, idx.reshape(b, -1)].reshape(b, samples, npix, c)
        w = valid.astype(vals.dtype) if wgt is None else wgt * valid
        return vals * w[..., None]

    gx, gy, gz = g[:, :, 0], g[:, :, 1], g[:, :, 2]
    if method == "nearest":
        # jnp.round == tf.round == round-half-to-even
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        iz = jnp.round(gz).astype(jnp.int32)
        out = gather(ix, iy, iz)
    elif method == "trilinear":
        # sample at voxel centers. The x/y axes normalize over
        # [vmin, vmax], so cell i's center maps to index i + 0.5 and
        # needs the -0.5 shift; the z axis (faithful reference
        # convention, model_multi.py:292-298) normalizes over
        # [vmin_z + vsize_z/2, vmax_z] — cell centers already land on
        # (approximately) integer indices, exactly like the nearest
        # path's rounding assumes, so z takes NO extra shift (an extra
        # -0.5 would depth-shift every sample by half a voxel and halve
        # the first z-slice's weight).
        fx, fy, fz = gx - 0.5, gy - 0.5, gz
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        z0 = jnp.floor(fz).astype(jnp.int32)
        lx, ly, lz = fx - x0, fy - y0, fz - z0
        out = 0.0
        for dx_, wx in ((0, 1 - lx), (1, lx)):
            for dy_, wy in ((0, 1 - ly), (1, ly)):
                for dz_, wz in ((0, 1 - lz), (1, lz)):
                    out = out + gather(x0 + dx_, y0 + dy_, z0 + dz_,
                                       wx * wy * wz)
    else:
        raise ValueError(method)
    return out.reshape(b, samples, s, s, c)


# ---------------------------------------------------------------------------
# Depth-conditioned ray lift (transformer fusion path)
# ---------------------------------------------------------------------------

def unproject_rays(feats, Rcam, Kmat, depth, image_shape, samples=1,
                   faithful_pairing=False):
    """Backproject each feature-map pixel along its ray to measured depth(s),
    producing world xyz per token (model_transformer.py:372-424).

    feats: [B, V, fh, fw, C]; Rcam: [B, V, 3, 4] cam->world; Kmat: [B, 3, 3];
    depth: [B, V, fh, fw] metric depth at feature resolution.

    Returns (positions [B, V*samples*fh*fw, 3] world xyz,
             tokens [B, V*samples*fh*fw, C]), token order (v, sample, y, x)
    row-major — each token paired with ITS OWN ray. The reference deviates
    from this twice (both reproduced under `faithful_pairing=True`, used
    only for executed-reference parity goldens):

      1. Ray scaling: it solves rsz*K against pixel vectors [x, y, 1]
         with x, y at FEATURE scale (model_transformer.py:396-404), so
         its rays carry z = 1/rsz and a feature-scale principal-point
         offset — not the true pinhole ray. We solve rsz*K against
         [x, y, rsz], the exact image-scale ray.
      2. Pairing: it flattens depth TRANSPOSED (:407, transpose
         [0,1,3,2]) and transposes features to x-major before
         vectorizing (:355-358 in transformer_encoder), while the ray
         grid stays row-major — every token's ray direction belongs to
         the TRANSPOSED pixel. We pair each token with its own ray.

    Neither bug is fatal in the reference (positions only tag tokens for
    the positional encoding, and training co-adapts), but they change
    numerics, so parity against the executed reference requires them.
    """
    b, v, fh, fw, c = feats.shape
    npix = fh * fw
    rsz = fh / float(image_shape[0])

    r_y = np.arange(0.5, fh, 1.0, dtype=np.float32)
    r_x = np.arange(0.5, fw, 1.0, dtype=np.float32)
    xs, ys = np.meshgrid(r_x, r_y)               # row-major (y, x)
    z = 1.0 if faithful_pairing else rsz
    pix = np.stack([xs.ravel(), ys.ravel(),
                    np.full(npix, z, np.float32)], axis=0)  # [3, npix]

    Kinv = jnp.linalg.inv(Kmat * rsz)
    rays = jnp.einsum("bij,jn->bin", Kinv, pix)  # [B, 3, npix], z == 1

    if samples != 1:
        # there is exactly one measured depth per ray: samples > 1 could
        # only replicate every token (Config.validate enforces samples=1
        # for TRANSFORMER; the reference transformer config agrees,
        # interior_transformer.py:378-407)
        raise ValueError(
            f"unproject_rays: samples must be 1 (got {samples}); the "
            f"depth-conditioned lift has one measured depth per ray")
    if faithful_pairing:
        assert fh == fw, "faithful pairing needs a square feature map"
        depth = depth.swapaxes(2, 3)             # transposed flatten (:407)
        feats = feats.swapaxes(2, 3)             # x-major tokens (:355-358)
    rho = depth.reshape(b, v, 1, 1, npix)        # [B, V, 1, 1, npix]
    Xc = rays[:, None, None, :, :] * rho         # [B, V, S=1, 3, npix]
    ones = jnp.ones((b, v, samples, 1, npix))
    Xc_h = jnp.concatenate([Xc, ones], axis=-2)  # [B, V, S, 4, npix]
    Xw = jnp.einsum("bvij,bvsjn->bvsin", Rcam, Xc_h)  # [B, V, S, 3, npix]

    positions = Xw.transpose(0, 1, 2, 4, 3).reshape(b, -1, 3)
    tokens = jnp.broadcast_to(
        feats[:, :, None], (b, v, samples) + feats.shape[2:])
    tokens = tokens.reshape(b, -1, c)
    return positions, tokens
