"""Cross-view voxel-grid fusion + depth-sample collapse (Flax linen).

Fusion modes match `grid_reas` (model_multi.py:394-463):
  'add'    : sum over the view axis + BN + relu
  'mean'   : mean over views (Notebook/projection.py:526-529 variant)
  'ident'  : concat views on channels -> relu -> 1x1x1 Conv3D -> BN -> relu
  'conv3d' : MLF U-Net — concat views, relu, 2x strided Conv3D (2C, 4C) down,
             2x Conv3DTranspose up with skip concat [deconv1, conv1]
  'lstm3d' : 3D ConvLSTM scanned over the view axis (recurrent.py:378-478):
             single fused 4-gate conv over [x, h], gate order
             (j, i, f, o), forget_bias=1, tanh activation — via lax.scan
             instead of K.rnn.

The caller instantiates one module PER FPN level (detector.py builds a
separate GridFusion/DepthCollapse pair for each level): the reference's
`reused_lay` dict is keyed by a per-level `name` prefix, so its weights are
reused across *calls within a level*, not across levels
(model_multi.py:415-439 with the per-level scopes at model_multi.py:2387-2391).

`DepthCollapse` squeezes the reprojected ray-sample axis to a 2D map
(depth_sampling, model_multi.py:466-488).
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BatchNorm


class ConvLSTMCell3D(nn.Module):
    """One fused-gate ConvLSTM step (recurrent.py:443-478 semantics)."""
    filters: int
    kernel: tuple = (3, 3, 3)
    forget_bias: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        memory, output = carry
        y = nn.Conv(4 * self.filters, self.kernel, padding="SAME",
                    name="lstm_gates", dtype=self.dtype)(
                        jnp.concatenate([x, output], axis=-1))
        j, i, f, o = jnp.split(y, 4, axis=-1)
        memory = (memory * jax.nn.sigmoid(f + self.forget_bias)
                  + jax.nn.sigmoid(i) * jnp.tanh(j))
        output = jnp.tanh(memory) * jax.nn.sigmoid(o)
        return (memory, output), output


class _LSTMGateParams(nn.Module):
    """Declares the fused-gate conv parameters at nn.Conv-compatible
    names/shapes ('kernel' [kx,ky,kz,C+F,4F], 'bias' [4F]) without
    applying the conv, so the hoisted ConvLSTM path below shares
    checkpoints with the scanned ConvLSTMCell3D path."""
    filters: int
    kernel: tuple
    in_ch: int

    @nn.compact
    def __call__(self):
        shape = (*self.kernel, self.in_ch + self.filters, 4 * self.filters)
        k = self.param("kernel", nn.initializers.lecun_normal(), shape)
        b = self.param("bias", nn.initializers.zeros, (4 * self.filters,))
        return k, b


class _LSTMCellParams(nn.Module):
    """Name-scope shim: places _LSTMGateParams under 'cell/lstm_gates/...',
    the exact parameter path the nn.scan'd ConvLSTMCell3D creates."""
    filters: int
    kernel: tuple
    in_ch: int

    @nn.compact
    def __call__(self):
        return _LSTMGateParams(self.filters, self.kernel, self.in_ch,
                               name="lstm_gates")()


class ConvLSTM3D(nn.Module):
    """ConvLSTM scanned over the view axis; returns the last hidden state
    (the reference's ConvRNN3D with return_sequences=False,
    recurrent.py:28-371).

    hoist_input (Config.LSTM_HOIST_INPUT, serving-time): the fused gate
    conv is linear in the channel concat — conv([x,h], W) ==
    conv(x, Wx) + conv(h, Wh) — so the x-side gates of ALL views run as
    ONE [B*V]-batched conv outside the scan and only the h-side
    recurrence stays sequential (the standard cuDNN RNN decomposition).
    Halves the per-view sequential conv channels. Identical parameter
    tree; same math up to summation order
    (tests/test_nn_modules.py::test_convlstm_hoist_matches_scan)."""
    filters: int
    kernel: tuple = (3, 3, 3)
    forget_bias: float = 1.0
    dtype: Any = jnp.float32
    hoist_input: bool = False

    @nn.compact
    def __call__(self, xs):
        """xs: [B, V, X, Y, Z, C] -> [B, X, Y, Z, filters]."""
        b, v, nx, ny, nz, c = xs.shape
        init = (jnp.zeros((b, nx, ny, nz, self.filters), xs.dtype),
                jnp.zeros((b, nx, ny, nz, self.filters), xs.dtype))
        if self.hoist_input:
            return self._hoisted(xs, init)
        ScanCell = nn.scan(ConvLSTMCell3D,
                           variable_broadcast="params",
                           split_rngs={"params": False},
                           in_axes=1, out_axes=1)
        (memory, output), _ = ScanCell(
            self.filters, self.kernel, self.forget_bias, self.dtype,
            name="cell")(init, xs)
        return output

    def _hoisted(self, xs, init):
        b, v, nx, ny, nz, c = xs.shape
        kernel, bias = _LSTMCellParams(self.filters, self.kernel, c,
                                       name="cell")()
        k = kernel.astype(self.dtype)
        wx, wh = k[..., :c, :], k[..., c:, :]
        x = xs.astype(self.dtype).reshape(b * v, nx, ny, nz, c)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, wx.shape, ("NXYZC", "XYZIO", "NXYZC"))
        xg = jax.lax.conv_general_dilated(
            x, wx, (1, 1, 1), "SAME", dimension_numbers=dn)
        xg = (xg + bias.astype(self.dtype)).reshape(
            b, v, nx, ny, nz, 4 * self.filters)
        dnh = jax.lax.conv_dimension_numbers(
            (b, nx, ny, nz, self.filters), wh.shape,
            ("NXYZC", "XYZIO", "NXYZC"))
        fb = self.forget_bias

        def step(carry, xg_v):
            memory, output = carry
            y = xg_v + jax.lax.conv_general_dilated(
                output.astype(self.dtype), wh, (1, 1, 1), "SAME",
                dimension_numbers=dnh)
            j, i, f, o = jnp.split(y, 4, axis=-1)
            memory = (memory * jax.nn.sigmoid(f + fb)
                      + jax.nn.sigmoid(i) * jnp.tanh(j))
            output = jnp.tanh(memory) * jax.nn.sigmoid(o)
            return (memory, output), None

        (memory, output), _ = jax.lax.scan(
            step, init, jnp.moveaxis(xg, 1, 0))
        return output


class PhaseConvTranspose3D(nn.Module):
    """Drop-in for nn.ConvTranspose(features, (3, 3, 3), strides=(2, 2, 2),
    padding='SAME') computed as 8 output-parity phase convs + interleave.

    XLA lowers a stride-2 transposed conv as a conv over the lhs-dilated
    input: 27 kernel taps per output cell of which at most 8 hit non-zero
    (non-inserted) inputs — ~3.4x wasted MACs — and the 3D-conv path on
    TPU is weak on top. Decomposing by output parity runs 8 dense convs
    with kernels of size {1,2}^3 (every weight used exactly once, zero
    waste) and interleaves with one depth-to-space transpose. Derivation
    of the phase kernels from lax.conv_transpose's SAME padding
    (pad=(2,1) per axis at k=3, s=2, see _GroupedConvTranspose):
        y[2m]   = x[m-1]*W[0] + x[m]*W[2]   (even phase: taps [0, 2])
        y[2m+1] = x[m]*W[1]                 (odd phase:  tap  [1])
    Param names/shapes match nn.ConvTranspose ('kernel' [3,3,3,Cin,Cout],
    'bias' [Cout]) so trained checkpoints load unchanged; exactness vs
    nn.ConvTranspose is covered by tests/test_phase_deconv.py.
    (reference op: Conv3DTranspose in the MLF U-Net,
    model_multi.py:406-441)"""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, nx, ny, nz, cin = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        # per-axis phase slicing: even -> taps [0, 2] with front pad 1,
        # odd -> tap [1] with no pad
        ax = {0: (slice(0, None, 2), (1, 0)), 1: (slice(1, 2), (0, 0))}
        outs = []
        for px in (0, 1):
            for py in (0, 1):
                for pz in (0, 1):
                    (sx, padx), (sy, pady), (sz, padz) = ax[px], ax[py], \
                        ax[pz]
                    sub = k[sx, sy, sz]
                    dn = jax.lax.conv_dimension_numbers(
                        x.shape, sub.shape, ("NXYZC", "XYZIO", "NXYZC"))
                    outs.append(jax.lax.conv_general_dilated(
                        x, sub, (1, 1, 1), padding=[padx, pady, padz],
                        dimension_numbers=dn))
        y = jnp.stack(outs, axis=4)               # [B,X,Y,Z,8,C]
        y = y.reshape(b, nx, ny, nz, 2, 2, 2, self.features)
        y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)   # [B,X,2,Y,2,Z,2,C]
        y = y.reshape(b, 2 * nx, 2 * ny, 2 * nz, self.features)
        return y + bias.astype(self.dtype)


class ZfoldConv3D(nn.Module):
    """Drop-in for nn.Conv(features, (3, 3, 3), strides=(2, 2, 2),
    padding='SAME') on a Z-MAJOR grid [B, Z, X, Y, C].

    XLA:TPU's 3D-conv emitters tile poorly at the voxel-grid shapes (the
    down1 convs measured 249 us each in-graph vs a ~36 us MXU floor,
    round-4 trace). Same arithmetic as a 2D conv: the kernel's z taps
    fold into input channels (z-slab concat; z_i = 2*z_o + dz under the
    SAME pad (0, 1) of in-even/k3/s2) and Z folds into the batch dim,
    where the 2D emitters are strong — measured 0.369 -> 0.111 ms at the
    down1 shape (tools/probe_zfold.py), exact to f32 roundoff. Param
    names/shapes match nn.Conv ('kernel' [3,3,3,Cin,F], 'bias' [F]) so
    trained checkpoints and FOLD_BN apply unchanged.
    (reference op: strided Conv3D in the MLF U-Net, model_multi.py:406-441)
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xz):
        b, z, X, Y, c = xz.shape
        assert z % 2 == 0 and X % 2 == 0 and Y % 2 == 0, (
            "ZfoldConv3D needs even dims (SAME pad (0,1) at k=3, s=2)")
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        xz = xz.astype(self.dtype)
        zo = z // 2
        xp = jnp.pad(xz, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        slabs = [jax.lax.slice_in_dim(xp, dz, dz + 2 * zo - 1, 2, axis=1)
                 for dz in range(3)]
        x3 = jnp.concatenate(slabs, axis=-1).reshape(b * zo, X, Y, 3 * c)
        # [kx,ky,kz,C,F] -> [kx,ky,kz*C,F]; channel index kz*C+c matches
        # the slab concat order. The kernel's kz axis is the Z one even
        # though the data is z-major: kx/ky slide over the 2D conv's
        # spatial dims (X, Y) exactly as in the voxel-major layout.
        kf = k.transpose(0, 1, 2, 3, 4).reshape(3, 3, 3 * c, self.features)
        dn = jax.lax.conv_dimension_numbers(
            x3.shape, kf.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x3, kf, (2, 2), [(0, 1), (0, 1)], dimension_numbers=dn)
        y = y.reshape(b, zo, X // 2, Y // 2, self.features)
        return y + bias.astype(self.dtype)


class ZfoldPhaseConvTranspose3D(nn.Module):
    """Drop-in for nn.ConvTranspose(features, (3, 3, 3), strides=(2, 2, 2),
    padding='SAME') on a Z-MAJOR grid [B, Z, X, Y, C].

    PhaseConvTranspose3D's 8 output-parity convs, with the z phases
    folded into channels instead of run as 3D convs: even output z reads
    [x[m-1] | x[m]] (kernel z taps [0, 2]), odd reads x[m] (tap [1]) —
    see the per-axis derivation on PhaseConvTranspose3D. The x/y phases
    stay spatial, so each of the 8 convs is a 2D conv with Z in batch.
    Measured 0.081 -> 0.016 ms at the up1 shape (tools/probe_zfold.py),
    exact to f32 roundoff. Param names/shapes match nn.ConvTranspose
    ('kernel' [3,3,3,Cin,F], 'bias' [F]).
    (reference op: Conv3DTranspose in the MLF U-Net, model_multi.py:406-441)
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xz):
        b, z, X, Y, cin = xz.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        xz = xz.astype(self.dtype)
        f = self.features
        ax = {0: (slice(0, None, 2), (1, 0)), 1: (slice(1, 2), (0, 0))}
        xm1 = jnp.pad(xz, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :z]
        x_even = jnp.concatenate([xm1, xz], axis=-1).reshape(
            b * z, X, Y, 2 * cin)
        x_odd = xz.reshape(b * z, X, Y, cin)
        zk = {0: ((0, 2), x_even), 1: ((1,), x_odd)}
        outs = []
        for px in (0, 1):
            for py in (0, 1):
                for pz in (0, 1):
                    (sx, padx), (sy, pady) = ax[px], ax[py]
                    ztaps, xin = zk[pz]
                    sub = jnp.concatenate(
                        [k[sx, sy, zt] for zt in ztaps], axis=2)
                    dn = jax.lax.conv_dimension_numbers(
                        xin.shape, sub.shape, ("NHWC", "HWIO", "NHWC"))
                    outs.append(jax.lax.conv_general_dilated(
                        xin, sub, (1, 1), padding=[padx, pady],
                        dimension_numbers=dn).reshape(b, z, X, Y, f))
        y = jnp.stack(outs, axis=5)                   # [B,Z,X,Y,F,8]
        y = y.reshape(b, z, X, Y, f, 2, 2, 2)
        # phase index order is (px, py, pz); interleave each parity
        # against its axis (z-major output)
        y = y.transpose(0, 1, 7, 2, 5, 3, 6, 4)       # [B,Z,2,X,2,Y,2,F]
        y = y.reshape(b, 2 * z, 2 * X, 2 * Y, f)
        return y + bias.astype(self.dtype)


class GridFusion(nn.Module):
    mode: str            # add | mean | ident | conv3d | lstm3d
    channels: int        # TOP_DOWN_PYRAMID_SIZE
    num_views: int
    train_bn: bool = False
    dtype: Any = jnp.float32
    fold_bn: bool = False
    # inputs_fused: grids arrive as [B, X, Y, Z, V*C] with the pre-fusion
    # relu already applied (the Pallas unprojection kernel's epilogue,
    # kernels/unproject_pallas.py::bilinear_gather_fused) — skips the
    # transpose+reshape+relu HBM passes. Only conv3d/ident consume this.
    inputs_fused: bool = False
    # phase_deconv: serving-time lowering of the U-Net's up1/up2 as
    # PhaseConvTranspose3D (identical params, same math up to summation
    # order). Config.PHASE_DECONV; enabled by bench/serving configs.
    phase_deconv: bool = False
    # lstm_hoist: serving-time hoisted ConvLSTM input conv
    # (Config.LSTM_HOIST_INPUT, see ConvLSTM3D.hoist_input).
    lstm_hoist: bool = False
    # zfold: run the conv3d U-Net's 3D convs in a z-major layout with the
    # kernel z taps folded into channels (ZfoldConv3D /
    # ZfoldPhaseConvTranspose3D). Identical params, same math up to
    # summation order (tests/test_zfold_fusion.py). Config.ZFOLD_FUSION.
    zfold: bool = False

    @nn.compact
    def __call__(self, grids):
        """grids: [B, V, X, Y, Z, C] -> fused [B, X, Y, Z, C]
        (or [B, X, Y, Z, V*C] when inputs_fused)."""
        x = grids
        if self.mode == "add":
            x = jnp.sum(x, axis=1)
            x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="fuse_bn")(x)
            return nn.relu(x)

        if self.mode == "mean":
            return jnp.mean(x, axis=1)

        if self.mode == "ident":
            if not self.inputs_fused:
                b, v, nx, ny, nz, c = x.shape
                x = x.transpose(0, 2, 3, 4, 1, 5).reshape(
                    b, nx, ny, nz, v * c)
                x = nn.relu(x)
            x = nn.Conv(self.channels, (1, 1, 1), name="ident_conv",
                        dtype=self.dtype)(x)
            x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="fuse_bn")(x)
            return nn.relu(x)

        if self.mode == "conv3d":
            if not self.inputs_fused:
                b, v, nx, ny, nz, c = x.shape
                if self.zfold:
                    # straight to z-major [B, Z, X, Y, V*C]
                    x = x.transpose(0, 4, 2, 3, 1, 5).reshape(
                        b, nz, nx, ny, v * c)
                else:
                    x = x.transpose(0, 2, 3, 4, 1, 5).reshape(
                        b, nx, ny, nz, v * c)
                x = nn.relu(x)
            elif self.zfold:
                x = x.transpose(0, 3, 1, 2, 4)    # [B,X,Y,Z,VC]->[B,Z,X,Y,VC]
            if self.zfold:
                Down = ZfoldConv3D
                Deconv = ZfoldPhaseConvTranspose3D
            else:
                Down = functools.partial(nn.Conv, kernel_size=(3, 3, 3),
                                         strides=(2, 2, 2), padding="SAME")
                Deconv = (PhaseConvTranspose3D if self.phase_deconv else
                          functools.partial(nn.ConvTranspose,
                                            kernel_size=(3, 3, 3),
                                            strides=(2, 2, 2),
                                            padding="SAME"))
            x = Down(self.channels * 2, name="down1", dtype=self.dtype)(x)
            x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn1")(x)
            conv1 = nn.relu(x)
            x = Down(self.channels * 4, name="down2", dtype=self.dtype)(conv1)
            x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn2")(x)
            conv2 = nn.relu(x)
            x = Deconv(self.channels * 2, name="up1",
                       dtype=self.dtype)(conv2)
            x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn_up1")(x)
            deconv1 = nn.relu(x)
            x = jnp.concatenate([deconv1, conv1], axis=-1)
            x = Deconv(self.channels, name="up2", dtype=self.dtype)(x)
            x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn_up2")(x)
            x = nn.relu(x)
            if self.zfold:
                x = x.transpose(0, 2, 3, 1, 4)    # back to [B,X,Y,Z,C]
            return x

        if self.mode == "lstm3d":
            x = nn.relu(x)
            x = ConvLSTM3D(self.channels, dtype=self.dtype,
                           hoist_input=self.lstm_hoist,
                           name="convlstm")(x)
            x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="fuse_bn")(x)
            return nn.relu(x)

        raise ValueError(f"unknown fusion mode {self.mode}")


class _GroupedConvTranspose(nn.Module):
    """L per-level flax ConvTranspose layers run as one grouped
    fractionally-strided conv (lax.conv_transpose has no
    feature_group_count, so this reproduces its SAME-padding arithmetic
    on conv_general_dilated with lhs_dilation). Kernel layout matches
    the channel-concat of the per-level ConvTranspose kernels:
    [k, k, k, in_per_group, L * out_per_group]."""
    features_per_group: int
    groups: int
    kernel: tuple = (3, 3, 3)
    strides: tuple = (2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_per_group = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel, in_per_group,
             self.groups * self.features_per_group))
        bias = self.param(
            "bias", nn.initializers.zeros,
            (self.groups * self.features_per_group,))
        # lax.conv_transpose's SAME padding for kernel k, stride s
        pads = []
        for ks, s in zip(self.kernel, self.strides):
            pad_len = ks + s - 2
            pad_a = ks - 1 if s > ks - 1 else -(-pad_len // 2)
            pads.append((pad_a, pad_len - pad_a))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NXYZC", "XYZIO", "NXYZC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1, 1), padding=pads,
            lhs_dilation=self.strides, dimension_numbers=dn,
            feature_group_count=self.groups)
        return y + bias.astype(self.dtype)


class GroupedGridFusion(nn.Module):
    """Serving-time cross-level form of L per-level GridFusions
    (Config.CROSS_LEVEL_FUSION): all active pyramid levels share the
    voxel-grid shape, so their conv3d U-Nets (or ident 1x1 convs) run as
    single grouped convs over the channel-concatenated grids — one
    dispatch per layer instead of one per level per layer.

    Input  [B, X, Y, Z, L * V * C]  (per-level fused layouts, already
                                     relu'd, concatenated on channels)
    Output [B, X, Y, Z, L * C]      (level l's fused grid in channels
                                     l*C:(l+1)*C)

    Parameters mirror the per-level layer names (down1/down2/up1/up2 or
    ident_conv) with kernels/biases channel-concatenated in level order —
    utils/bn_fold.py::group_fusion_variables builds them from trained
    per-level weights. BatchNorms are assumed pre-folded into the convs
    (the transform runs on a fold_bn_variables tree), so the module is a
    pure conv+relu chain; exactness vs the per-level path is covered by
    tests/test_cross_level.py."""
    mode: str            # conv3d | ident
    channels: int        # C = TOP_DOWN_PYRAMID_SIZE
    num_levels: int      # L
    num_views: int       # V
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        L, C = self.num_levels, self.channels
        if self.mode == "ident":
            x = nn.Conv(L * C, (1, 1, 1), feature_group_count=L,
                        name="ident_conv", dtype=self.dtype)(x)
            return nn.relu(x)
        if self.mode != "conv3d":
            raise ValueError(
                f"GroupedGridFusion supports conv3d/ident, not {self.mode}")
        x = nn.Conv(L * C * 2, (3, 3, 3), strides=(2, 2, 2),
                    padding="SAME", feature_group_count=L,
                    name="down1", dtype=self.dtype)(x)
        conv1 = nn.relu(x)
        x = nn.Conv(L * C * 4, (3, 3, 3), strides=(2, 2, 2),
                    padding="SAME", feature_group_count=L,
                    name="down2", dtype=self.dtype)(conv1)
        conv2 = nn.relu(x)
        x = _GroupedConvTranspose(C * 2, L, dtype=self.dtype,
                                  name="up1")(conv2)
        deconv1 = nn.relu(x)
        # per-level skip concat [deconv1_l, conv1_l]: interleave so group
        # l's input channels stay contiguous
        b, nx, ny, nz = deconv1.shape[:4]
        x = jnp.concatenate(
            [deconv1.reshape(b, nx, ny, nz, L, 2 * C),
             conv1.reshape(b, nx, ny, nz, L, 2 * C)], axis=-1)
        x = x.reshape(b, nx, ny, nz, L * 4 * C)
        x = _GroupedConvTranspose(C, L, dtype=self.dtype, name="up2")(x)
        return nn.relu(x)


class DepthCollapse(nn.Module):
    """[B, D, S, S, C] ray slices -> [B, S, S, C_out] 2D map."""
    mode: str            # 'conv3d' gets the deep collapse, others the 1x1
    channels: int        # TOP_DOWN_PYRAMID_SIZE
    samples: int
    train_bn: bool = False
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        b, d, s1, s2, c = x.shape
        if self.mode == "conv3d":
            # samples folded into channels -> depthwise + pointwise stack
            # (model_multi.py:467-480)
            x = x.transpose(0, 2, 3, 4, 1).reshape(b, s1, s2, c * d)
            feat = c * d
            x = nn.Conv(feat, (1, 1), feature_group_count=feat,
                        name="dw1", dtype=self.dtype)(x)
            x = nn.Conv(512, (1, 1), name="pw1", dtype=self.dtype)(x)
            x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn1")(x)
            x = nn.relu(x)
            x = nn.Conv(512, (1, 1), feature_group_count=512,
                        name="dw2", dtype=self.dtype)(x)
            x = nn.Conv(self.channels, (1, 1), name="pw2",
                        dtype=self.dtype)(x)
            x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn2")(x)
            return nn.relu(x)
        # per-channel 1x1 conv collapsing samples -> 1, weights shared
        # across channels; BN over the single collapsed feature exactly as
        # the reference's channels-last BN on [B, C, S, S, 1]
        # (model_multi.py:482-487)
        x = x.transpose(0, 4, 2, 3, 1)           # [B, C, S, S, D]
        x = x.reshape(b * c, s1, s2, d)
        x = nn.Conv(1, (1, 1), name="collapse", dtype=self.dtype)(x)
        x = x.reshape(b, c, s1, s2, 1)
        x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn")(x)
        x = nn.relu(x)
        return x[..., 0].transpose(0, 2, 3, 1)
