"""Pallas TPU kernel: fused voxel-grid unprojection (bilinear gather).

The reference reaches this op through 4x `tf.gather_nd` over V views x
nvox^3 voxels (model_multi.py:204-220) — the #1 hot loop (SURVEY.md §3.1).
Dynamic gathers serialize badly on TPU; this kernel reformulates the 4-tap
bilinear gather as ONE one-hot matmul per voxel tile:

    out[t, c] = sum_p W[t, p] * F[p, c]

where W (built on the VPU from comparisons) carries the 4 bilinear weights
of voxel t in its row, and the contraction runs on the MXU. Per grid step
(one view, one voxel tile) the whole per-view feature map stays resident in
VMEM (P4 of a 640^2 input: 40*40*64 floats = 409 KB).

Backward (d feats) is the transposed matmul with the same W, accumulated
across voxel tiles — exact, via custom_vjp. Projection coordinates carry no
gradient (they are functions of camera inputs only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1024


def _interpret():
    # compiled Mosaic on TPU; interpreter elsewhere (tests on CPU)
    return jax.default_backend() not in ("tpu", "axon")


def _build_w(x, y, fh, fw, p, dtype):
    """Bilinear one-hot weight matrix W [T, P] for feature-plane coords
    (x, y) [T]; OOB taps contribute zero (GPU gather_nd semantics).

    Single-pass form: the four taps sit at flat-column offsets
    {0, 1, fw, fw+1} from idx00 = y0*fw + x0, so ONE [T, P] column-delta
    computation feeds a nested-where select chain — ~half the VPU
    element-ops of the original 4x (compare -> cast -> mul -> add)
    accumulation. Bit-identical to that form (the per-tap weights are the
    same products, each column receives exactly one tap): verified on the
    chip against the old build at every flagship level, maxerr 0.0, and
    ~2x faster (P4 0.951 -> 0.479 ms, P5 0.723 -> 0.362, P6 0.666 ->
    0.351; BENCH_NOTES round-4 kernel section). Tap validity is folded
    into the per-row weights; a false column match from a wrapped
    idx00+offset can only land where its weight is zero.

    fw == 1 is the one offset collision (d == 1 is both the x0+1 and the
    y0+1 tap): handled by a trace-time branch that sums the colliding
    taps' weights — at most one is non-zero per row (x0+1 needs x0 == -1,
    y0+1 needs x0 == 0), so the sum is exact. fw is a static kernel
    param, so the fw > 1 hot path is unchanged."""
    t = x.shape[0]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    lx = x - x0f
    ly = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    vx0 = (x0 >= 0) & (x0 < fw)
    vx1 = (x0 >= -1) & (x0 < fw - 1)
    vy0 = (y0 >= 0) & (y0 < fh)
    vy1 = (y0 >= -1) & (y0 < fh - 1)
    w00 = ((1 - lx) * (1 - ly) * (vx0 & vy0)).astype(jnp.float32)
    w10 = (lx * (1 - ly) * (vx1 & vy0)).astype(jnp.float32)
    w01 = ((1 - lx) * ly * (vx0 & vy1)).astype(jnp.float32)
    w11 = (lx * ly * (vx1 & vy1)).astype(jnp.float32)
    idx00 = y0 * fw + x0
    col = jax.lax.broadcasted_iota(jnp.int32, (t, p), 1)
    # Mosaic only supports minor-dim insertion ([:, None]) on 32-bit
    # types: the deltas/selects run in int32/f32, cast once at the end.
    d = col - idx00[:, None]
    if fw == 1:
        w = jnp.where(d == 0, w00[:, None],
                      jnp.where(d == 1, (w10 + w01)[:, None],
                                jnp.where(d == 2, w11[:, None], 0.0)))
    else:
        w = jnp.where(d == 0, w00[:, None],
                      jnp.where(d == 1, w10[:, None],
                                jnp.where(d == fw, w01[:, None],
                                          jnp.where(d == fw + 1,
                                                    w11[:, None],
                                                    0.0))))
    return w.astype(dtype)


def _fwd_kernel(x_ref, y_ref, f_ref, o_ref, *, fh, fw):
    # bf16 inputs ride the MXU at full rate; W in the feature dtype (weight
    # quantization ~= bf16 activation precision), accumulate in f32
    p = f_ref.shape[1]
    x = x_ref[0].reshape(-1)
    y = y_ref[0].reshape(-1)
    mxu_dtype = (jnp.bfloat16 if f_ref.dtype == jnp.bfloat16
                 else jnp.float32)
    w = _build_w(x, y, fh, fw, p, mxu_dtype)
    o_ref[0] = jnp.dot(w, f_ref[0].astype(mxu_dtype),
                       preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


def _bwd_kernel(x_ref, y_ref, g_ref, df_ref, *, fh, fw):
    p = df_ref.shape[1]
    tile = pl.program_id(1)

    @pl.when(tile == 0)
    def _():
        df_ref[0] = jnp.zeros_like(df_ref[0])

    x = x_ref[0].reshape(-1)
    y = y_ref[0].reshape(-1)
    mxu_dtype = (jnp.bfloat16 if g_ref.dtype == jnp.bfloat16
                 else jnp.float32)
    w = _build_w(x, y, fh, fw, p, mxu_dtype)
    df_ref[0] += jnp.dot(w.T, g_ref[0].astype(mxu_dtype),
                         preferred_element_type=jnp.float32
                         ).astype(df_ref.dtype)


def _pad_to(n, m):
    return (n + m - 1) // m * m


# ---------------------------------------------------------------------------
# Fused-layout variant: out[b, n, v, c] (view minor-adjacent to channels),
# so the caller's per-voxel cross-view channel concat
# (GridFusion conv3d/ident: transpose+reshape to [B, X, Y, Z, V*C],
# models/fusion.py) becomes a FREE reshape, and the pre-fusion relu runs in
# the kernel epilogue instead of as a separate HBM pass. Removes the
# measured reshape.183x (~0.43 ms) + convert_maximum (~0.25 ms/level)
# fusions from the flagship trace.
# ---------------------------------------------------------------------------


def _fwd_kernel_fused(x_ref, y_ref, f_ref, o_ref, *, fh, fw, relu, v):
    # One grid step computes ALL v views of a voxel tile (the per-view
    # feature maps are co-resident in VMEM) and writes the full
    # [tile, v*c] block in one lane-dim concat — Mosaic's last-two-dims
    # constraint is met because the trailing block dims equal the array's.
    p = f_ref.shape[1]
    mxu_dtype = (jnp.bfloat16 if f_ref.dtype == jnp.bfloat16
                 else jnp.float32)
    outs = []
    for wi in range(v):
        x = x_ref[wi].reshape(-1)
        y = y_ref[wi].reshape(-1)
        w = _build_w(x, y, fh, fw, p, mxu_dtype)
        out = jnp.dot(w, f_ref[wi].astype(mxu_dtype),
                      preferred_element_type=jnp.float32)
        if relu:
            out = jnp.maximum(out, 0.0)
        outs.append(out.astype(o_ref.dtype))
    o_ref[0] = (outs[0] if v == 1
                else jnp.concatenate(outs, axis=-1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def bilinear_gather_fused(feats, x, y, fh, fw, v, tile=DEFAULT_TILE,
                          relu=False):
    """feats: [B*V, P, C]; x, y: [B*V, N]. Returns [B, N, V*C] — the
    views' channels concatenated (view-major), optionally relu'd in the
    kernel epilogue."""
    return _forward_fused(feats, x, y, fh, fw, v, tile, relu)


def _forward_fused(feats, x, y, fh, fw, v, tile, relu):
    assert tile % 128 == 0, "tile must be a multiple of 128 (TPU lanes)"
    bv, p, c = feats.shape
    assert bv % v == 0
    b = bv // v
    n = x.shape[1]
    n_pad = _pad_to(n, tile)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)), constant_values=-10.0)
        y = jnp.pad(y, ((0, 0), (0, n_pad - n)), constant_values=-10.0)
    tiles = n_pad // tile
    rows = tile // 128
    x = x.reshape(bv, n_pad // 128, 128)
    y = y.reshape(bv, n_pad // 128, 128)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel_fused, fh=fh, fw=fw, relu=relu, v=v),
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec((v, rows, 128), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, rows, 128), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, p, c), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, v * c), lambda bb, t: (bb, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, v * c), feats.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bv * n_pad * p * c,
            bytes_accessed=bv * (p * c * 4 + n_pad * (8 + c * 4)),
            transcendentals=0),
        interpret=_interpret(),
    )(x, y, feats)
    return out[:, :n]


def _fwd_rule_fused(feats, x, y, fh, fw, v, tile, relu):
    out = _forward_fused(feats, x, y, fh, fw, v, tile, relu)
    res = (x, y, out if relu else None)
    return out, res


def _bwd_rule_fused(fh, fw, v, tile, relu, res, g):
    (x, y, out) = res
    if relu:
        g = jnp.where(out > 0, g, 0).astype(g.dtype)
    b, n, vc = g.shape
    c = vc // v
    # back to the per-view row layout the plain backward kernel expects
    g_bv = g.reshape(b, n, v, c).transpose(0, 2, 1, 3).reshape(b * v, n, c)
    df, _, _ = _bwd_rule(fh, fw, tile, (x, y), g_bv)
    return df, None, None


bilinear_gather_fused.defvjp(_fwd_rule_fused, _bwd_rule_fused)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bilinear_gather(feats, x, y, fh, fw, tile=DEFAULT_TILE):
    """feats: [BV, P, C] (P = fh*fw); x, y: [BV, N] feature-plane coords.
    Returns [BV, N, C] bilinear samples with OOB-zero semantics."""
    return _forward(feats, x, y, fh, fw, tile)


def _forward(feats, x, y, fh, fw, tile):
    assert tile % 128 == 0, "tile must be a multiple of 128 (TPU lanes)"
    bv, p, c = feats.shape
    n = x.shape[1]
    n_pad = _pad_to(n, tile)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)), constant_values=-10.0)
        y = jnp.pad(y, ((0, 0), (0, n_pad - n)), constant_values=-10.0)
    tiles = n_pad // tile
    rows = tile // 128
    x = x.reshape(bv, n_pad // 128, 128)
    y = y.reshape(bv, n_pad // 128, 128)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, fh=fh, fw=fw),
        grid=(bv, tiles),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, c), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bv, n_pad, c), feats.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bv * n_pad * p * c,
            bytes_accessed=bv * (p * c * 4 + n_pad * (8 + c * 4)),
            transcendentals=0),
        interpret=_interpret(),
    )(x, y, feats)
    return out[:, :n]


def _fwd_rule(feats, x, y, fh, fw, tile):
    return _forward(feats, x, y, fh, fw, tile), (x, y)


def _bwd_rule(fh, fw, tile, res, g):
    (x, y) = res
    bv, _, c = g.shape
    p = fh * fw
    f_dtype = g.dtype
    n = x.shape[1]
    n_pad = _pad_to(n, tile)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)), constant_values=-10.0)
        y = jnp.pad(y, ((0, 0), (0, n_pad - n)), constant_values=-10.0)
        g = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, 0)))
    tiles = n_pad // tile
    rows = tile // 128
    x = x.reshape(bv, n_pad // 128, 128)
    y = y.reshape(bv, n_pad // 128, 128)

    df = pl.pallas_call(
        functools.partial(_bwd_kernel, fh=fh, fw=fw),
        grid=(bv, tiles),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, c), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bv, p, c), f_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bv * n_pad * p * c,
            bytes_accessed=bv * (p * c * 4 + n_pad * (8 + c * 4)),
            transcendentals=0),
        interpret=_interpret(),
    )(x, y, g.astype(f_dtype))
    return df, None, None


bilinear_gather.defvjp(_fwd_rule, _bwd_rule)


def auto_tile(p, c=64, bv=None):
    """Voxel-tile size: as large as VMEM allows (fewer grid steps amortize
    per-tile DMA/sync overhead — measured to dominate for small-P levels).
    Three ceilings, all from the 16 MB scoped-vmem limit:
      * W temporaries (iota + compare + W) cost ~3x the W [tile, P] f32
        bytes -> tile*P <= ~1.6M elements (empirically fits at
        P=1600/tile=1024);
      * the double-buffered [tile, C] f32 output block -> tile*C <= 512K
        elements (a C=256 level at tile=4096 alone overflows the stack);
      * long grids (bv >= 8, i.e. batch x views serving shapes) pipeline
        deeper and overflow the stack by ~1.4% at tile=4096 — measured
        "16.22M > 16.00M limit" at bv=8/P=100 — so cap at 2048 there."""
    if p >= 1024:
        tile = 1024
    elif p >= 256:
        tile = 2048
    else:
        tile = 4096
    if bv is not None and bv >= 8:
        tile = min(tile, 2048)
    c_cap = max(128, (512 * 1024 // max(c, 1)) // 128 * 128)
    return min(tile, c_cap)


def _project_voxel_coords(feats, Rcam, Kmat, image_shape, grid_pts):
    """Shared projection geometry for both unproject wrappers: voxel grid
    points -> per-view feature-map pixel coords x, y [B*V, N] (the
    main-view re-anchoring composition, model_multi.py:174-188). One
    implementation so the plain train/eval path and the fused serving
    path can never drift numerically."""
    from ..ops.projection import _to_hom4, pose_inverse

    b, v, fh, fw, _ = feats.shape
    rsz_h = fh / float(image_shape[0])
    rsz_w = fw / float(image_shape[1])

    w2c = pose_inverse(Rcam)
    KR = jnp.einsum("bij,bvjk->bvik", Kmat, w2c)
    pose0 = _to_hom4(Rcam[:, 0])
    M = jnp.einsum("bvij,bjk->bvik", KR, pose0)
    uvw = jnp.einsum("bvij,jn->bvin", M, grid_pts)
    z = uvw[:, :, 2]
    x = (uvw[:, :, 0] / z * rsz_w).reshape(b * v, -1)
    y = (uvw[:, :, 1] / z * rsz_h).reshape(b * v, -1)
    return x, y


def unproject_features_pallas(feats, Rcam, Kmat, image_shape, grid_pts,
                              grid_shape, tile=None):
    """Drop-in Pallas replacement for ops.projection.unproject_features.

    feats: [B, V, fh, fw, C]; Rcam: [B, V, 3, 4]; Kmat: [B, 3, 3];
    grid_pts: [4, N]; grid_shape: (nx, ny, nz).
    Returns [B, V, nx, ny, nz, C].
    """
    b, v, fh, fw, c = feats.shape
    nx, ny, nz = grid_shape
    x, y = _project_voxel_coords(feats, Rcam, Kmat, image_shape, grid_pts)

    flat = feats.reshape(b * v, fh * fw, c)
    if tile is None:
        tile = auto_tile(fh * fw, c, bv=b * v)
    out = bilinear_gather(flat, x, y, fh, fw, tile)
    return out.reshape(b, v, nx, ny, nz, c)


def unproject_features_pallas_fused(feats, Rcam, Kmat, image_shape,
                                    grid_pts, grid_shape, relu=False,
                                    tile=None):
    """Like unproject_features_pallas, but emits the view-concat voxel
    layout [B, nx, ny, nz, V*C] directly (+ optional epilogue relu) — the
    exact input GridFusion conv3d/ident consume, with no transpose pass.
    relu(concat(views)) == concat(relu(view)) so the epilogue is exact."""
    b, v, fh, fw, c = feats.shape
    nx, ny, nz = grid_shape
    x, y = _project_voxel_coords(feats, Rcam, Kmat, image_shape, grid_pts)

    flat = feats.reshape(b * v, fh * fw, c)
    if tile is None:
        # one grid step holds ALL v views' W temporaries + features, so
        # the single-view auto tile overflows the 16 MB scoped-vmem stack
        # (measured: 17.96M at tile=4096/P=64/v=2) — scale it down by v,
        # keeping the 128-lane multiple the kernel requires (v=3 would
        # otherwise yield 4096//3 = 1365)
        tile = max(1024, auto_tile(fh * fw, c, bv=b * v) // v // 128 * 128)
    out = bilinear_gather_fused(flat, x, y, fh, fw, v, tile, relu)
    return out.reshape(b, nx, ny, nz, v * c)
