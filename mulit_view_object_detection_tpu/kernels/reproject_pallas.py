"""Pallas TPU kernel: voxel-grid -> ray-slice reprojection (hot loop #3).

The reference's proj_grid samples samples*S^2 ray points from the fused
grid with nearest-neighbor tf.gather_nd (model_multi.py:231-322, 357-369).
Key structural fact: along a ray, the DEPTH index iz depends only on the
depth-sample index s (z_samples are fixed camera-frame depths and the grid
is axis-aligned in the same frame), so sample s reads exclusively from the
single z-slice grid[:, :, :, iz(s)]. That turns the 3D gather into, per
depth sample, a 2D one-hot matmul against one (nx*ny, C) slice:

    out[s, p, c] = sum_q W[p, q] * slice_iz(s)[q, c]

with W built on the VPU and the contraction on the MXU. The z-slice for
each grid step is chosen by a scalar-prefetch index map (iz is data for the
pipeline, not for the kernel body).

Gradients flow into the grid (training): custom_vjp scatters W^T @ g into
the right z-slice, accumulated across pixel tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .unproject_pallas import _interpret, _pad_to


def _fwd_kernel(iz_ref, x_ref, y_ref, slice_ref, o_ref, *, nx, ny):
    q = slice_ref.shape[2]
    ix = jnp.round(x_ref[0].reshape(-1)).astype(jnp.int32)
    iy = jnp.round(y_ref[0].reshape(-1)).astype(jnp.int32)
    t = ix.shape[0]
    s = pl.program_id(1)
    z_ok = (iz_ref[s] >= 0)
    valid = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) & z_ok)
    idx = jnp.clip(ix, 0, nx - 1) * ny + jnp.clip(iy, 0, ny - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, q), 1)
    # Mosaic cannot reshape i1 vectors: lift the mask to f32 BEFORE the
    # minor-dim broadcast
    # one-hot weights are exactly representable in bf16 -> full-rate MXU
    mxu_dtype = (jnp.bfloat16 if slice_ref.dtype == jnp.bfloat16
                 else jnp.float32)
    # build in f32 (Mosaic minor-dim insertion is 32-bit only), cast once
    w = ((col == idx[:, None]).astype(jnp.float32)
         * valid.astype(jnp.float32)[:, None]).astype(mxu_dtype)
    o_ref[0, 0] = jnp.dot(w, slice_ref[0, 0].astype(mxu_dtype),
                          preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def _bwd_kernel(iz_ref, x_ref, y_ref, g_ref, dg_ref, *, nx, ny, n_s):
    """iz_ref is [2, S]: row 0 = block-map indices (invalid samples
    remapped to the previous valid slice so block visits stay
    consecutive), row 1 = the original indices (-1 = invalid) for the
    gradient mask. Splitting the two roles is what makes a trailing
    invalid sample harmless: with a single row, -1 maps to block 0 and
    the change-detect below would re-zero slice 0's already-accumulated
    gradient."""
    q = dg_ref.shape[2]
    s = pl.program_id(1)
    tile = pl.program_id(2)

    # Output revisiting: the block map is nondecreasing in s (sorted
    # z_samples; invalid samples inherit the previous valid slice), so
    # all visits to one z-slice block are consecutive. Zero the block on
    # its FIRST visit (s==0, or the slice index just changed).
    first_visit = jnp.logical_and(
        tile == 0,
        jnp.logical_or(s == 0,
                       iz_ref[0, s] != iz_ref[0, jnp.maximum(s - 1, 0)]))

    @pl.when(first_visit)
    def _():
        dg_ref[0, 0] = jnp.zeros_like(dg_ref[0, 0])

    ix = jnp.round(x_ref[0].reshape(-1)).astype(jnp.int32)
    iy = jnp.round(y_ref[0].reshape(-1)).astype(jnp.int32)
    t = ix.shape[0]
    z_ok = (iz_ref[1, s] >= 0)
    valid = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) & z_ok)
    idx = jnp.clip(ix, 0, nx - 1) * ny + jnp.clip(iy, 0, ny - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, q), 1)
    # Mosaic cannot reshape i1 vectors: lift the mask to f32 BEFORE the
    # minor-dim broadcast
    mxu_dtype = (jnp.bfloat16 if g_ref.dtype == jnp.bfloat16
                 else jnp.float32)
    w = ((col == idx[:, None]).astype(jnp.float32)
         * valid.astype(jnp.float32)[:, None]).astype(mxu_dtype)
    dg_ref[0, 0] += jnp.dot(w.T, g_ref[0, 0].astype(mxu_dtype),
                            preferred_element_type=jnp.float32
                            ).astype(dg_ref.dtype)


def _coords(Kmat, image_shape, proj_size, samples, config, nx, ny, nz):
    """Host/XLA precompute: fractional (x, y) grid coords [B, S_d, npix]
    and the per-sample z index [S_d] (negative = out of grid)."""
    s = proj_size
    npix = s * s
    rsz = float(proj_size) / float(image_shape[0])
    r = np.arange(0.5, s, 1.0, dtype=np.float32)
    xs, ys = np.meshgrid(r, r)
    pix = np.stack([xs.ravel(), ys.ravel(),
                    np.full(npix, rsz, np.float32)], axis=0)
    Kinv = jnp.linalg.inv(Kmat * rsz)
    rays = jnp.einsum("bij,jn->bin", Kinv, pix)      # [B, 3, npix], z == 1

    z_samples = np.linspace(config.vmin_z + config.vsize_z / 2.0,
                            config.vmax_z - config.vsize_z / 2.0,
                            samples).astype(np.float32)
    # voxel indices per the reference mapping (model_multi.py:292-298)
    vminv = np.array([config.vmin, config.vmin,
                      config.vmin_z + config.vsize_z / 2.0], np.float32)
    vmaxv = np.array([config.vmax, config.vmax, config.vmax_z], np.float32)
    nvoxv = np.array([nx, ny, nz], np.float32)

    xc = rays[:, 0, None, :] * z_samples[None, :, None]  # [B, S_d, npix]
    yc = rays[:, 1, None, :] * z_samples[None, :, None]
    xg = (xc - vminv[0]) / (vmaxv[0] - vminv[0]) * nvoxv[0]
    yg = (yc - vminv[1]) / (vmaxv[1] - vminv[1]) * nvoxv[1]

    zg = (z_samples - vminv[2]) / (vmaxv[2] - vminv[2]) * nvoxv[2]
    iz = np.rint(zg).astype(np.int32)
    iz = np.where((iz >= 0) & (iz < nz), iz, -1)
    return xg, yg, iz


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def zslice_gather(grid_z, xg, yg, iz, nx, ny, tile):
    """grid_z: [B, nz, nx*ny, C]; xg/yg: [B, S_d, npix] fractional coords;
    iz: tuple of per-sample z indices (-1 = invalid).
    Returns [B, S_d, npix, C] nearest samples (OOB -> 0)."""
    return _reproj_forward(grid_z, xg, yg, iz, nx, ny, tile)


def _reproj_forward(grid_z, xg, yg, iz, nx, ny, tile):
    b, nz, q, c = grid_z.shape
    s_d, npix = xg.shape[1], xg.shape[2]
    n_pad = _pad_to(npix, tile)
    if n_pad != npix:
        pad = ((0, 0), (0, 0), (0, n_pad - npix))
        xg = jnp.pad(xg, pad, constant_values=-10.0)
        yg = jnp.pad(yg, pad, constant_values=-10.0)
    tiles = n_pad // tile
    rows = tile // 128
    xg = xg.reshape(b, s_d, n_pad // 128, 128)
    yg = yg.reshape(b, s_d, n_pad // 128, 128)
    iz_arr = jnp.asarray(np.maximum(np.asarray(iz, np.int32), -1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, s_d, tiles),
        in_specs=[
            pl.BlockSpec((1, 1, rows, 128), lambda b_, s_, t_, iz_: (b_, s_, t_, 0)),
            pl.BlockSpec((1, 1, rows, 128), lambda b_, s_, t_, iz_: (b_, s_, t_, 0)),
            # the z-slice block: selected by the prefetched iz
            pl.BlockSpec((1, 1, q, c),
                         lambda b_, s_, t_, iz_: (b_, jnp.maximum(iz_[s_], 0), 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, c),
                               lambda b_, s_, t_, iz_: (b_, s_, t_, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, nx=nx, ny=ny),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s_d, n_pad, c), grid_z.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_d * n_pad * q * c,
            bytes_accessed=b * s_d * (q * c * 4 + n_pad * (8 + c * 4)),
            transcendentals=0),
        interpret=_interpret(),
    )(iz_arr, xg, yg, grid_z)
    # slice blocks come in as [1, 1, q, c]; kernel writes [1, 1, tile, c]
    return out[:, :, :npix]


def _reproj_fwd(grid_z, xg, yg, iz, nx, ny, tile):
    return _reproj_forward(grid_z, xg, yg, iz, nx, ny, tile), (
        xg, yg, grid_z.shape[1])


def _reproj_bwd(iz, nx, ny, tile, res, g):
    xg, yg, nz = res
    b, s_d, npix, c = g.shape
    q = nx * ny
    n_pad = _pad_to(npix, tile)
    if n_pad != npix:
        pad = ((0, 0), (0, 0), (0, n_pad - npix))
        xg = jnp.pad(xg, pad, constant_values=-10.0)
        yg = jnp.pad(yg, pad, constant_values=-10.0)
        g = jnp.pad(g, ((0, 0), (0, 0), (0, n_pad - npix), (0, 0)))
    tiles = n_pad // tile
    rows = tile // 128
    xg = xg.reshape(b, s_d, n_pad // 128, 128)
    yg = yg.reshape(b, s_d, n_pad // 128, 128)
    iz_np = np.maximum(np.asarray(iz, np.int32), -1)
    # block map (row 0): invalid samples inherit the previous valid slice
    # (leading invalids take the first valid one) so the out_spec never
    # jumps back to block 0 and re-triggers the first-visit zeroing; their
    # gradient rows are masked off via the original indices (row 1)
    filled = iz_np.copy()
    valid_vals = filled[filled >= 0]
    last = int(valid_vals[0]) if valid_vals.size else 0
    for i_, v_ in enumerate(filled):
        if v_ >= 0:
            last = int(v_)
        else:
            filled[i_] = last
    iz_arr = jnp.asarray(np.stack([filled, iz_np]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, s_d, tiles),
        in_specs=[
            pl.BlockSpec((1, 1, rows, 128), lambda b_, s_, t_, iz_: (b_, s_, t_, 0)),
            pl.BlockSpec((1, 1, rows, 128), lambda b_, s_, t_, iz_: (b_, s_, t_, 0)),
            pl.BlockSpec((1, 1, tile, c),
                         lambda b_, s_, t_, iz_: (b_, s_, t_, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, q, c),
                               lambda b_, s_, t_, iz_: (b_, iz_[0, s_], 0, 0)),
    )
    dg = pl.pallas_call(
        functools.partial(_bwd_kernel, nx=nx, ny=ny, n_s=s_d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nz, q, c), g.dtype),
        interpret=_interpret(),
    )(iz_arr, xg, yg, g)
    # z-slices never visited by any sample hold garbage (possibly NaN) —
    # replace them with zeros (where, not multiply: NaN * 0 == NaN)
    touched = np.zeros(nz, bool)
    for v in np.asarray(iz):
        if v >= 0:
            touched[int(v)] = True
    dg = jnp.where(jnp.asarray(touched)[None, :, None, None], dg, 0.0)
    return dg, None, None


zslice_gather.defvjp(_reproj_fwd, _reproj_bwd)


def project_grid_pallas(grid, Kmat, image_shape, proj_size, samples, config,
                        tile=1024):
    """Drop-in Pallas replacement for ops.projection.project_grid
    (nearest mode). grid: [B, nx, ny, nz, C] -> [B, samples, S, S, C]."""
    b, nx, ny, nz, c = grid.shape
    xg, yg, iz = _coords(Kmat, image_shape, proj_size, samples, config,
                         nx, ny, nz)
    # z-major slices: [B, nz, nx*ny, C]
    grid_z = grid.transpose(0, 3, 1, 2, 4).reshape(b, nz, nx * ny, c)
    out = zslice_gather(grid_z, xg, yg, tuple(int(v) for v in iz),
                        nx, ny, tile)
    return out.reshape(b, samples, proj_size, proj_size, c)
