"""Pallas kernel parity vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mulit_view_object_detection_tpu.kernels.unproject_pallas import (
    bilinear_gather, unproject_features_pallas)
from mulit_view_object_detection_tpu.ops.projection import (
    unproject_features, voxel_grid_points)
from tests.test_projection import VoxCfg, identity_pose, simple_K


def test_bilinear_gather_matches_xla(rng):
    bv, fh, fw, c = 2, 8, 8, 4
    n = 37  # deliberately unaligned -> exercises padding
    feats = rng.rand(bv, fh * fw, c).astype(np.float32)
    x = rng.uniform(-1.0, fw + 0.5, (bv, n)).astype(np.float32)
    y = rng.uniform(-1.0, fh + 0.5, (bv, n)).astype(np.float32)

    out = np.asarray(bilinear_gather(jnp.asarray(feats), jnp.asarray(x),
                                     jnp.asarray(y), fh, fw, tile=128))
    # oracle: per-tap OOB-zero bilinear
    expect = np.zeros((bv, n, c), np.float32)
    fmap = feats.reshape(bv, fh, fw, c)
    for b in range(bv):
        for i in range(n):
            x0, y0 = int(np.floor(x[b, i])), int(np.floor(y[b, i]))
            lx, ly = x[b, i] - x0, y[b, i] - y0
            for dy, wy in ((0, 1 - ly), (1, ly)):
                for dx, wx in ((0, 1 - lx), (1, lx)):
                    xi, yi = x0 + dx, y0 + dy
                    if 0 <= xi < fw and 0 <= yi < fh:
                        expect[b, i] += wx * wy * fmap[b, yi, xi]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_bilinear_gather_width_one_plane(rng):
    """fw == 1 regression: the single-pass W-build's flat-column offsets
    collide there (the x0+1 and y0+1 taps are both at d == 1); the
    pre-fix nested-where chain silently dropped the y0+1 tap for
    in-bounds x0 == 0, losing the (1-lx)*ly row weight. A 1-wide plane
    is reachable in practice (P6 of a 64-px input). fw == 2 is included
    as the nearest non-colliding boundary."""
    for fh, fw in ((8, 1), (1, 1), (8, 2)):
        bv, c, n = 2, 3, 23
        feats = rng.rand(bv, fh * fw, c).astype(np.float32)
        x = rng.uniform(-1.5, fw + 0.5, (bv, n)).astype(np.float32)
        y = rng.uniform(-1.5, fh + 0.5, (bv, n)).astype(np.float32)
        # force fractional ly on in-bounds columns (the dropped-tap case)
        x[:, :8] = 0.25
        y[:, :8] = rng.uniform(0.1, fh - 1.1, (bv, 8)) + 0.5

        out = np.asarray(bilinear_gather(jnp.asarray(feats),
                                         jnp.asarray(x), jnp.asarray(y),
                                         fh, fw, tile=128))
        expect = np.zeros((bv, n, c), np.float32)
        fmap = feats.reshape(bv, fh, fw, c)
        for b in range(bv):
            for i in range(n):
                x0, y0 = int(np.floor(x[b, i])), int(np.floor(y[b, i]))
                lx, ly = x[b, i] - x0, y[b, i] - y0
                for dy, wy in ((0, 1 - ly), (1, ly)):
                    for dx, wx in ((0, 1 - lx), (1, lx)):
                        xi, yi = x0 + dx, y0 + dy
                        if 0 <= xi < fw and 0 <= yi < fh:
                            expect[b, i] += wx * wy * fmap[b, yi, xi]
        np.testing.assert_allclose(out, expect, atol=1e-5,
                                   err_msg=f"fh={fh} fw={fw}")


def test_bilinear_gather_grad_matches_xla(rng):
    bv, fh, fw, c = 1, 6, 6, 3
    n = 16
    feats = rng.rand(bv, fh * fw, c).astype(np.float32)
    x = rng.uniform(0, fw - 1, (bv, n)).astype(np.float32)
    y = rng.uniform(0, fh - 1, (bv, n)).astype(np.float32)

    def loss_pallas(f):
        return jnp.sum(bilinear_gather(f, jnp.asarray(x), jnp.asarray(y),
                                       fh, fw, tile=128) ** 2)

    def loss_xla(f):
        fmap = f.reshape(bv, fh, fw, c)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        lx, ly = x - x0, y - y0
        flat = f
        out = 0.0
        acc = jnp.zeros((bv, n, c))
        for dy, wy in ((0, 1 - ly), (1, ly)):
            for dx, wx in ((0, 1 - lx), (1, lx)):
                xi = jnp.clip(x0 + dx, 0, fw - 1)
                yi = jnp.clip(y0 + dy, 0, fh - 1)
                idx = yi * fw + xi
                vals = jnp.take_along_axis(
                    flat, idx[..., None].repeat(c, -1), axis=1)
                acc = acc + vals * (wx * wy)[..., None]
        return jnp.sum(acc ** 2)

    g_pallas = np.asarray(jax.grad(loss_pallas)(jnp.asarray(feats)))
    g_xla = np.asarray(jax.grad(loss_xla)(jnp.asarray(feats)))
    np.testing.assert_allclose(g_pallas, g_xla, atol=1e-4)


def test_project_grid_pallas_matches_reference(rng):
    from mulit_view_object_detection_tpu.kernels.reproject_pallas import (
        project_grid_pallas)
    from mulit_view_object_detection_tpu.ops.projection import project_grid

    cfg = VoxCfg()
    K = np.stack([simple_K(), simple_K(f=70.0, c=30.0)])
    grid = rng.rand(2, 8, 8, 8, 4).astype(np.float32)
    for s in (16, 8):
        ref = np.asarray(project_grid(jnp.asarray(grid), jnp.asarray(K),
                                      (64, 64), s, cfg.samples, cfg))
        got = np.asarray(project_grid_pallas(
            jnp.asarray(grid), jnp.asarray(K), (64, 64), s, cfg.samples,
            cfg, tile=128))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_project_grid_pallas_grad(rng):
    from mulit_view_object_detection_tpu.kernels.reproject_pallas import (
        project_grid_pallas)
    from mulit_view_object_detection_tpu.ops.projection import project_grid

    cfg = VoxCfg()
    K = simple_K()[None]
    grid = rng.rand(1, 8, 8, 8, 2).astype(np.float32)
    tgt = rng.rand(1, cfg.samples, 8, 8, 2).astype(np.float32)

    def loss_p(g):
        out = project_grid_pallas(g, jnp.asarray(K), (64, 64), 8,
                                  cfg.samples, cfg, tile=128)
        return jnp.sum((out - tgt) ** 2)

    def loss_x(g):
        out = project_grid(g, jnp.asarray(K), (64, 64), 8, cfg.samples, cfg)
        return jnp.sum((out - tgt) ** 2)

    gp = np.asarray(jax.grad(loss_p)(jnp.asarray(grid)))
    gx = np.asarray(jax.grad(loss_x)(jnp.asarray(grid)))
    np.testing.assert_allclose(gp, gx, atol=1e-4)


def test_zslice_gather_grad_with_trailing_invalid(rng):
    """The public zslice_gather contract allows iz entries of -1
    (out-of-grid samples). A -1 AFTER valid samples used to remap to
    block 0 in the backward out_spec and re-trigger the first-visit
    zeroing, silently erasing z-slice 0's accumulated gradient. The
    invalid samples contribute nothing, so the gradient must equal the
    same call without them."""
    from mulit_view_object_detection_tpu.kernels.reproject_pallas import (
        zslice_gather)

    b, nz, nx, ny, c = 1, 4, 8, 16, 2   # q = nx*ny = 128 (lane-aligned)
    npix = 128
    grid_z = rng.rand(b, nz, nx * ny, c).astype(np.float32)
    xg = (rng.rand(b, 3, npix) * nx).astype(np.float32)
    yg = (rng.rand(b, 3, npix) * ny).astype(np.float32)

    def loss(g, iz, s_d):
        out = zslice_gather(g, jnp.asarray(xg[:, :s_d]),
                            jnp.asarray(yg[:, :s_d]), iz, nx, ny, 128)
        return jnp.sum(out ** 2)

    g_with = np.asarray(jax.grad(loss)(jnp.asarray(grid_z), (0, 1, -1), 3))
    g_ref = np.asarray(jax.grad(loss)(jnp.asarray(grid_z), (0, 1), 2))
    assert np.abs(g_ref[0, 0]).max() > 0  # slice 0 really has signal
    np.testing.assert_allclose(g_with, g_ref, atol=1e-5)


def test_unproject_pallas_matches_reference(rng):
    cfg = VoxCfg()
    K = simple_K()
    feats = rng.rand(1, 2, 16, 16, 3).astype(np.float32)
    Rcam = identity_pose(1, 2)
    Rcam[0, 1, 0, 3] = 0.3  # slightly offset second view
    pts = voxel_grid_points(cfg)

    ref = np.asarray(unproject_features(
        jnp.asarray(feats), jnp.asarray(Rcam), jnp.asarray(K[None]),
        (64, 64), jnp.asarray(pts), (8, 8, 8)))
    got = np.asarray(unproject_features_pallas(
        jnp.asarray(feats), jnp.asarray(Rcam), jnp.asarray(K[None]),
        (64, 64), jnp.asarray(pts), (8, 8, 8), tile=128))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_bilinear_gather_fused_layout_and_relu(rng):
    """bilinear_gather_fused must equal the plain gather re-laid-out to
    [B, N, V, C] with relu applied (the epilogue/concat-layout contract),
    and its VJP must carry the relu mask."""
    from mulit_view_object_detection_tpu.kernels.unproject_pallas import (
        bilinear_gather_fused)

    b, v, fh, fw, c = 2, 2, 8, 8, 4
    bv = b * v
    n = 37
    feats = (rng.rand(bv, fh * fw, c) - 0.5).astype(np.float32)
    x = rng.uniform(-1.0, fw + 0.5, (bv, n)).astype(np.float32)
    y = rng.uniform(-1.0, fh + 0.5, (bv, n)).astype(np.float32)

    plain = np.asarray(bilinear_gather(
        jnp.asarray(feats), jnp.asarray(x), jnp.asarray(y), fh, fw,
        tile=128))                                 # [BV, N, C]
    expect = np.maximum(
        plain.reshape(b, v, n, c).transpose(0, 2, 1, 3), 0.0
    ).reshape(b, n, v * c)

    fused = np.asarray(bilinear_gather_fused(
        jnp.asarray(feats), jnp.asarray(x), jnp.asarray(y), fh, fw, v,
        128, True))                                # [B, N, V*C]
    np.testing.assert_allclose(fused, expect, atol=1e-5)

    # gradients: fused+relu vs explicit relu over the plain kernel
    def loss_fused(f):
        out = bilinear_gather_fused(f, jnp.asarray(x), jnp.asarray(y),
                                    fh, fw, v, 128, True)
        return jnp.sum(out * out)

    def loss_plain(f):
        out = bilinear_gather(f, jnp.asarray(x), jnp.asarray(y), fh, fw,
                              tile=128)
        out = jnp.maximum(out.reshape(b, v, n, c).transpose(0, 2, 1, 3),
                          0.0).reshape(b, n, v * c)
        return jnp.sum(out * out)

    g_fused = np.asarray(jax.grad(loss_fused)(jnp.asarray(feats)))
    g_plain = np.asarray(jax.grad(loss_plain)(jnp.asarray(feats)))
    np.testing.assert_allclose(g_fused, g_plain, atol=1e-4)


def test_unproject_fused_matches_plain(rng):
    """unproject_features_pallas_fused == relu(concat-on-channels(plain))
    at the wrapper level (geometry included)."""
    from mulit_view_object_detection_tpu.kernels.unproject_pallas import (
        unproject_features_pallas_fused)

    cfg = VoxCfg()
    b, v, fh, fw, c = 1, 2, 8, 8, 4
    feats = (rng.rand(b, v, fh, fw, c) - 0.5).astype(np.float32)
    Rcam = identity_pose(b, v)
    Rcam[:, 1, 0, 3] = 0.3                         # second view offset
    Kmat = simple_K()[None]
    grid_pts = voxel_grid_points(cfg)
    gs = (cfg.nvox, cfg.nvox, cfg.nvox_z)

    plain = np.asarray(unproject_features(
        jnp.asarray(feats), jnp.asarray(Rcam), jnp.asarray(Kmat),
        (64, 64), jnp.asarray(grid_pts), gs))      # [B,V,X,Y,Z,C]
    expect = np.maximum(
        plain.transpose(0, 2, 3, 4, 1, 5).reshape(
            b, gs[0], gs[1], gs[2], v * c), 0.0)

    fused = np.asarray(unproject_features_pallas_fused(
        jnp.asarray(feats), jnp.asarray(Rcam), jnp.asarray(Kmat),
        (64, 64), jnp.asarray(grid_pts), gs, relu=True))
    np.testing.assert_allclose(fused, expect, atol=1e-5)


def test_unproject_fused_three_views_auto_tile(rng):
    """V=3 with tile=None: the auto tile divides by v and must stay a
    multiple of 128 (4096//3 = 1365 used to trip the lane assertion) —
    and the result must still match the plain path."""
    from mulit_view_object_detection_tpu.kernels.unproject_pallas import (
        unproject_features_pallas_fused)

    cfg = VoxCfg()
    b, v, fh, fw, c = 1, 3, 8, 8, 4
    feats = (rng.rand(b, v, fh, fw, c) - 0.5).astype(np.float32)
    Rcam = identity_pose(b, v)
    Rcam[:, 1, 0, 3] = 0.3
    Rcam[:, 2, 1, 3] = -0.2
    Kmat = simple_K()[None]
    grid_pts = voxel_grid_points(cfg)
    gs = (cfg.nvox, cfg.nvox, cfg.nvox_z)

    plain = np.asarray(unproject_features(
        jnp.asarray(feats), jnp.asarray(Rcam), jnp.asarray(Kmat),
        (64, 64), jnp.asarray(grid_pts), gs))
    expect = plain.transpose(0, 2, 3, 4, 1, 5).reshape(
        b, gs[0], gs[1], gs[2], v * c)

    fused = np.asarray(unproject_features_pallas_fused(
        jnp.asarray(feats), jnp.asarray(Rcam), jnp.asarray(Kmat),
        (64, 64), jnp.asarray(grid_pts), gs, relu=False, tile=None))
    np.testing.assert_allclose(fused, expect, atol=1e-5)
