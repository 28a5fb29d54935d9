"""Probe: stride-2 3x3x3 Conv3D (the conv3d U-Net's down1/down2,
model_multi.py:406-441 analog in models/fusion.py::GridFusion) — is
XLA:TPU's strided-3D-conv lowering beatable by a space-to-depth
phase-blocked stride-1 form?

The strided conv's SAME padding at in=40, k=3, s=2 is pad=(0,1), so
    y[m] = x[2m]*W[0] + x[2m+1]*W[1] + x[2m+2]*W[2]
Splitting x by parity (x_e[m]=x[2m], x_o[m]=x[2m+1]) gives a k=2
stride-1 conv over the 2x2x2-blocked input [N, 20,20,20, 8*C]:
    y[m] = (x_e[m]W0 + x_o[m]W1) + (x_e[m+1]W2 + x_o[m+1]*0)
i.e. the blocked kernel is [2,2,2, 8C, Cout] with 64/27 of the taps
zero-padded (2.37x dense FLOPs) but a stride-1 dense-MXU form.

Prints one JSON line per shape with both timings; a negative result is
still a result (recorded in BENCH_NOTES).
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


def strided(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NXYZC", "XYZIO", "NXYZC"))
    return lax.conv_general_dilated(x, w, (2, 2, 2), "SAME",
                                    dimension_numbers=dn)


def block2(x):
    """[N, 2m, 2m, 2m, C] -> [N, m, m, m, 8C] (phase-major blocks)."""
    n, X, Y, Z, c = x.shape
    x = x.reshape(n, X // 2, 2, Y // 2, 2, Z // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(n, X // 2, Y // 2, Z // 2, 8 * c)


def block_kernel(w):
    """[3,3,3,C,F] -> [2,2,2,8C,F] matching block2's phase order.

    Input phase (px,py,pz) at blocked position (mx,my,mz) is original
    x[2mx+px, ...]; kernel tap t on axis hits y[m] from x[2m+t], i.e.
    blocked tap b = (2m+t)//2 - m = t//2? No: t in {0,1,2} -> source
    index 2m+t = 2(m + t//2) + t%2, so blocked offset t//2, phase t%2.
    """
    c, f = w.shape[3], w.shape[4]
    wb = np.zeros((2, 2, 2, 2, 2, 2, c, f), w.dtype)  # [bx,by,bz,px,py,pz,C,F]
    wn = np.asarray(w)
    for tx in range(3):
        for ty in range(3):
            for tz in range(3):
                wb[tx // 2, ty // 2, tz // 2,
                   tx % 2, ty % 2, tz % 2] += wn[tx, ty, tz]
    return jnp.asarray(wb.reshape(2, 2, 2, 8 * c, f))


def s2d(xb, wb):
    dn = lax.conv_dimension_numbers(xb.shape, wb.shape,
                                    ("NXYZC", "XYZIO", "NXYZC"))
    # pad (0,1): tap b=1 reads x_e[m+1] which pads with zero at the edge
    return lax.conv_general_dilated(
        xb, wb, (1, 1, 1), [(0, 1), (0, 1), (0, 1)],
        dimension_numbers=dn)


def timed(fn, *args, iters=50):
    @functools.partial(jax.jit, static_argnums=())
    def loop(a0, rest):
        def body(i, acc):
            out = fn(acc, *rest)
            # chain a scalar back into the input to serialize iterations
            return a0 + jnp.mean(out) * 0.0
        return lax.fori_loop(0, iters, body, a0)

    rest = args[1:]
    # block on the warmup: dispatch is async, so an unblocked warmup's
    # tail would otherwise queue ahead of the timed window and inflate it
    np.asarray(loop(args[0], rest))  # compile+warm
    t0 = time.perf_counter()
    _ = np.asarray(loop(args[0], rest))
    t1 = time.perf_counter()
    loop_short = jax.jit(lambda a0, rest: lax.fori_loop(
        0, 5, lambda i, acc: a0 + jnp.mean(fn(acc, *rest)) * 0.0, a0))
    np.asarray(loop_short(args[0], rest))
    t2 = time.perf_counter()
    _ = np.asarray(loop_short(args[0], rest))
    t3 = time.perf_counter()
    return ((t1 - t0) - (t3 - t2)) / (iters - 5) * 1e3  # ms/call


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    shapes = [
        ("down1_40c128", (1, 40, 40, 40, 128), 128),
        ("down2_20c128", (1, 20, 20, 20, 128), 256),
        ("down1_b4", (4, 40, 40, 40, 128), 128),
    ]
    for name, xs, f in shapes:
        x = jnp.asarray(rng.randn(*xs), dt)
        w = jnp.asarray(rng.randn(3, 3, 3, xs[-1], f) * 0.05, dt)
        xb = block2(x)
        wb = block_kernel(np.asarray(w, np.float32)).astype(dt)
        # exactness first
        ya = np.asarray(strided(x, w), np.float32)
        yb = np.asarray(s2d(xb, wb), np.float32)
        err = float(np.max(np.abs(ya - yb)) / (np.max(np.abs(ya)) + 1e-9))
        t_str = timed(strided, x, w)
        t_s2d = timed(s2d, xb, wb)
        # s2d including the on-the-fly input blocking (the real cost if
        # the producer cannot emit blocked layout)
        t_s2d_blk = timed(lambda xx, ww: s2d(block2(xx), ww), x, wb)
        print(json.dumps({
            "shape": name, "rel_err": err,
            "strided_ms": round(t_str, 4),
            "s2d_ms": round(t_s2d, 4),
            "s2d_incl_block_ms": round(t_s2d_blk, 4)}))


if __name__ == "__main__":
    main()
