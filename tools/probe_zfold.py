"""Probe: are the conv3d U-Net's 3D convolutions (down1/down2 strided,
up1/up2 transposed — models/fusion.py::GridFusion, the analog of the
reference's MLF U-Net model_multi.py:406-441) beatable by a z-folded 2D
formulation?

Trace evidence (round 4, 142-fps build): the U-Net accounts for 2.83 ms
of the 7.2 ms frame — down1 3x249 us, up2 3x555 us — all through
XLA:TPU's weak 3D-conv emitters (EmitAllBatchInSublanes over tiny
spatial dims). The same arithmetic as a 2D conv: fold the kernel's z
taps into input channels (z-slab concat) and move Z into the batch dim,
where the 2D emitters tile well:

    y[b, zo, :, :, f] = conv2d( concat_dz x[b, s*zo+dz, :, :, :],
                                reshape(W, [kx, ky, kz*C, F]) )

Exactness: identical MACs, different summation order only (checked at
f32 against the direct 3D forms).

Timings are loop-differenced on-device (long/short fori_loop) with
blocked warmup; iters sized so each window is >100 ms — the relay's
RTT variance swamps shorter windows (see probe_downconv.py's caveat).
"""

import functools
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


# ---------------------------------------------------------------- down (s=2)

def down3d(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NXYZC", "XYZIO", "NXYZC"))
    return lax.conv_general_dilated(x, w, (2, 2, 2), "SAME",
                                    dimension_numbers=dn)


def down_zfold(xz, w):
    """xz: z-major [B, Z, X, Y, C]; w: [3,3,3,C,F].

    SAME at in=40,k=3,s=2 is pad=(0,1) per axis; z_i = 2*zo + dz.
    Returns z-major [B, Zo, Xo, Yo, F]."""
    b, z, X, Y, c = xz.shape
    f = w.shape[-1]
    zo = z // 2
    xp = jnp.pad(xz, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    slabs = [lax.slice_in_dim(xp, dz, dz + 2 * zo - 1, 2, axis=1)
             for dz in range(3)]
    x3 = jnp.concatenate(slabs, axis=-1).reshape(b * zo, X, Y, 3 * c)
    # [kx,ky,kz,C,F] -> [kx,ky,kz*C,F]; channel index kz*C+c matches the
    # slab concat order above
    wf = w.transpose(0, 1, 2, 3, 4).reshape(3, 3, 3 * c, f)
    dn = lax.conv_dimension_numbers(x3.shape, wf.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(x3, wf, (2, 2), [(0, 1), (0, 1)],
                                 dimension_numbers=dn)
    return y.reshape(b, zo, X // 2, Y // 2, f)


# ------------------------------------------------------- up (transposed s=2)

def up3d_phase(x, k):
    """The current PhaseConvTranspose3D math (models/fusion.py:179-205),
    parameter-free form. x: [B,X,Y,Z,C], k: [3,3,3,C,F]."""
    b, nx, ny, nz, cin = x.shape
    f = k.shape[-1]
    ax = {0: (slice(0, None, 2), (1, 0)), 1: (slice(1, 2), (0, 0))}
    outs = []
    for px in (0, 1):
        for py in (0, 1):
            for pz in (0, 1):
                (sx, padx), (sy, pady), (sz, padz) = ax[px], ax[py], ax[pz]
                sub = k[sx, sy, sz]
                dn = lax.conv_dimension_numbers(
                    x.shape, sub.shape, ("NXYZC", "XYZIO", "NXYZC"))
                outs.append(lax.conv_general_dilated(
                    x, sub, (1, 1, 1), padding=[padx, pady, padz],
                    dimension_numbers=dn))
    y = jnp.stack(outs, axis=4)
    y = y.reshape(b, nx, ny, nz, 2, 2, 2, f)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return y.reshape(b, 2 * nx, 2 * ny, 2 * nz, f)


def up_zfold(xz, k):
    """xz: z-major [B, Z, X, Y, C]; k: [3,3,3,C,F] (ConvTranspose layout).

    Per-axis phase taps (see PhaseConvTranspose3D): even output = taps
    [0, 2] of the kernel with a leading input pad, odd = tap [1]. The z
    taps fold into channels (even: 2 slabs [x[m-1], x[m]], odd: 1 slab),
    the x/y phases stay spatial 2D convs. Returns z-major
    [B, 2Z, 2X, 2Y, F]."""
    b, z, X, Y, c = xz.shape
    f = k.shape[-1]
    ax = {0: (slice(0, None, 2), (1, 0)), 1: (slice(1, 2), (0, 0))}
    # z-even input: [x[m-1] | x[m]] on channels; z-odd input: x[m]
    xm1 = jnp.pad(xz, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :z]
    x_even = jnp.concatenate([xm1, xz], axis=-1).reshape(
        b * z, X, Y, 2 * c)
    x_odd = xz.reshape(b * z, X, Y, c)
    zk = {0: ((0, 2), x_even), 1: ((1,), x_odd)}
    outs = {}
    for px in (0, 1):
        for py in (0, 1):
            for pz in (0, 1):
                (sx, padx), (sy, pady) = ax[px], ax[py]
                ztaps, xin = zk[pz]
                # [kx,ky,C*len(ztaps),F]; channel index zt*C+c matches
                # the slab concat order above
                sub = jnp.concatenate(
                    [k[sx, sy, zt] for zt in ztaps], axis=2)
                dn = lax.conv_dimension_numbers(
                    xin.shape, sub.shape, ("NHWC", "HWIO", "NHWC"))
                outs[(px, py, pz)] = lax.conv_general_dilated(
                    xin, sub, (1, 1), padding=[padx, pady],
                    dimension_numbers=dn).reshape(b, z, X, Y, f)
    y = jnp.stack([outs[(px, py, pz)]
                   for px in (0, 1) for py in (0, 1) for pz in (0, 1)],
                  axis=5)                                 # [B,Z,X,Y,F,8]
    y = y.reshape(b, z, X, Y, f, 2, 2, 2)
    # phase index order is (px, py, pz); interleave each against its axis
    y = y.transpose(0, 1, 7, 2, 5, 3, 6, 4)               # [B,Z,2,X,2,Y,2,F]
    return y.reshape(b, 2 * z, 2 * X, 2 * Y, f)


def up3d_ref(x, k):
    """lax.conv_transpose SAME — the semantics PhaseConvTranspose3D
    reproduces (tests/test_phase_deconv.py)."""
    dn = lax.conv_dimension_numbers(
        x.shape, k.shape, ("NXYZC", "XYZIO", "NXYZC"))
    return lax.conv_transpose(x, k, (2, 2, 2), "SAME",
                              dimension_numbers=dn)


# ----------------------------------------------------------------- timing

def timed(fn, *args, iters=400):
    def body(i, acc):
        out = fn(acc, *args[1:])
        return args[0] + jnp.mean(out) * 0.0

    loop_l = jax.jit(lambda a0: lax.fori_loop(0, iters, body, a0))
    loop_s = jax.jit(lambda a0: lax.fori_loop(0, iters // 10, body, a0))
    np.asarray(loop_l(args[0]))
    np.asarray(loop_s(args[0]))
    t0 = time.perf_counter()
    np.asarray(loop_l(args[0]))
    t1 = time.perf_counter()
    np.asarray(loop_s(args[0]))
    t2 = time.perf_counter()
    return ((t1 - t0) - (t2 - t1)) / (iters - iters // 10) * 1e3


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    for name, xs, f in [("down1_40_c128", (1, 40, 40, 40, 128), 128),
                        ("down2_20_c128", (1, 20, 20, 20, 128), 256)]:
        xf = rng.randn(*xs).astype(np.float32)
        wf = (rng.randn(3, 3, 3, xs[-1], f) * 0.05).astype(np.float32)
        # exactness at f32
        ya = np.asarray(down3d(jnp.asarray(xf), jnp.asarray(wf)))
        xzf = jnp.asarray(xf.transpose(0, 3, 1, 2, 4))
        yb = np.asarray(down_zfold(xzf, jnp.asarray(wf)))
        yb = yb.transpose(0, 2, 3, 1, 4)
        err = float(np.max(np.abs(ya - yb)) / (np.max(np.abs(ya)) + 1e-9))
        x = jnp.asarray(xf, dt)
        xz = jnp.asarray(np.asarray(xzf), dt)
        w = jnp.asarray(wf, dt)
        t3 = timed(down3d, x, w)
        tz = timed(down_zfold, xz, w)
        # incl. on-the-fly transpose from voxel-major (the real cost when
        # the producer stays [B,X,Y,Z,C])
        tzt = timed(lambda xx, ww: down_zfold(
            xx.transpose(0, 3, 1, 2, 4), ww), x, w)
        print(json.dumps({"shape": name, "rel_err": err,
                          "conv3d_ms": round(t3, 4),
                          "zfold_ms": round(tz, 4),
                          "zfold_incl_t_ms": round(tzt, 4)}), flush=True)

    for name, xs, f in [("up2_20_c128_f64", (1, 20, 20, 20, 128), 64),
                        ("up1_10_c256_f128", (1, 10, 10, 10, 256), 128)]:
        xf = rng.randn(*xs).astype(np.float32)
        kf = (rng.randn(3, 3, 3, xs[-1], f) * 0.05).astype(np.float32)
        yr = np.asarray(up3d_ref(jnp.asarray(xf), jnp.asarray(kf)))
        yp = np.asarray(up3d_phase(jnp.asarray(xf), jnp.asarray(kf)))
        xzf = jnp.asarray(xf.transpose(0, 3, 1, 2, 4))
        yz = np.asarray(up_zfold(xzf, jnp.asarray(kf)))
        yz = yz.transpose(0, 2, 3, 1, 4)
        scale = np.max(np.abs(yr)) + 1e-9
        err_p = float(np.max(np.abs(yr - yp)) / scale)
        err_z = float(np.max(np.abs(yr - yz)) / scale)
        x = jnp.asarray(xf, dt)
        xz = jnp.asarray(np.asarray(xzf), dt)
        k = jnp.asarray(kf, dt)
        tp = timed(up3d_phase, x, k)
        tz = timed(up_zfold, xz, k)
        tzt = timed(lambda xx, kk: up_zfold(
            xx.transpose(0, 3, 1, 2, 4), kk), x, k)
        print(json.dumps({"shape": name,
                          "rel_err_phase": err_p, "rel_err_zfold": err_z,
                          "phase3d_ms": round(tp, 4),
                          "zfold_ms": round(tz, 4),
                          "zfold_incl_t_ms": round(tzt, 4)}), flush=True)


if __name__ == "__main__":
    main()
