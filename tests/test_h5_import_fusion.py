"""h5 import of the multi-view fork's FUSION checkpoint layers.

The full-graph multi-view golden (tests/test_multiview_fullgraph.py)
exercises the conv3d path end to end; these tests pin the remaining
per-layer import semantics directly: the fused ConvLSTM kernel concat,
the DepthwiseConv2D kernel transpose, and the 3D transposed-conv
flip+transpose — each checked by NUMERICS (imported weights reproduce
the TF-side layer's output), not just by tree placement.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _write_layer_h5(path, layer, weights):
    """One-layer keras-2-protocol h5: weights = {wname: array}."""
    import h5py
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([layer.encode()])
        g = f.create_group(layer)
        wnames = []
        for wname, arr in weights.items():
            g.create_dataset(f"{layer}/{wname}:0", data=arr)
            wnames.append(f"{layer}/{wname}:0".encode())
        g.attrs["weight_names"] = np.array(wnames)


def test_convlstm_fused_kernel_import(tmp_path):
    """kernel + recurrent_kernel fuse into the single-gate-conv param by
    input-channel concat, and the imported cell reproduces the reference
    recurrence arithmetic (recurrent.py:443-478: gates from
    conv(x, kernel) + conv(h, recurrent_kernel), order (j,i,f,o),
    forget_bias=1)."""
    from mulit_view_object_detection_tpu.models.fusion import GridFusion
    from mulit_view_object_detection_tpu.utils.h5_import import (
        load_h5_weights)

    rng = np.random.RandomState(0)
    c_in, filt = 3, 4
    kernel = rng.randn(3, 3, 3, c_in, 4 * filt).astype(np.float32) * 0.3
    recurrent = rng.randn(3, 3, 3, filt, 4 * filt).astype(np.float32) * 0.3
    bias = rng.randn(4 * filt).astype(np.float32) * 0.1
    h5 = str(tmp_path / "lstm.h5")
    _write_layer_h5(h5, "grid_reas_P4_convlstm3d",
                    {"kernel": kernel, "recurrent_kernel": recurrent,
                     "bias": bias})

    fusion = GridFusion("lstm3d", filt, num_views=2)
    x = rng.randn(1, 2, 4, 4, 4, c_in).astype(np.float32)
    variables = fusion.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, bstats, report = load_h5_weights(
        h5, {"grid_fusion_p4": variables["params"]},
        {"grid_fusion_p4": variables.get("batch_stats", {})})
    assert report["loaded"] == ["grid_reas_P4_convlstm3d"]
    got = params["grid_fusion_p4"]["convlstm"]["cell"]["lstm_gates"]
    np.testing.assert_array_equal(
        got["kernel"], np.concatenate([kernel, recurrent], axis=-2))
    np.testing.assert_array_equal(got["bias"], bias)

    # numeric check: one recurrence step against a direct transcription
    # of the reference cell on the same weights
    def conv3d(v, k):
        dn = jax.lax.conv_dimension_numbers(
            v.shape, k.shape, ("NXYZC", "XYZIO", "NXYZC"))
        return jax.lax.conv_general_dilated(
            v, k, (1, 1, 1), "SAME", dimension_numbers=dn)

    xs = jnp.maximum(jnp.asarray(x), 0.0)   # GridFusion relu's first
    h = jnp.zeros((1, 4, 4, 4, filt))
    m = jnp.zeros((1, 4, 4, 4, filt))
    for v in range(2):
        gates = conv3d(xs[:, v], jnp.asarray(kernel)) + \
            conv3d(h, jnp.asarray(recurrent)) + bias
        j, i, f, o = jnp.split(gates, 4, axis=-1)
        m = m * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
        h = jnp.tanh(m) * jax.nn.sigmoid(o)
    # tail: BN at init stats (mean 0, var 1, eps 1e-3) + relu
    expect = np.maximum(np.asarray(h) / np.sqrt(1.0 + 1e-3), 0.0)

    out = fusion.apply(
        {"params": params["grid_fusion_p4"],
         "batch_stats": bstats["grid_fusion_p4"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_convlstm_reference_fused_names_import(tmp_path):
    """The reference's ACTUAL ConvLSTMCell saves one fused gate kernel
    'weights_lstm3d' [k,k,k,C+F,4F] + 'bias_lstm3d' (recurrent.py:
    423-431), NOT the Keras-standard split kernel/recurrent_kernel
    pair. The importer must map those names; before the fix this
    silently no-op'd (layer reported loaded, nothing assigned)."""
    from mulit_view_object_detection_tpu.models.fusion import GridFusion
    from mulit_view_object_detection_tpu.utils.h5_import import (
        load_h5_weights)

    rng = np.random.RandomState(4)
    c_in, filt = 3, 4
    fused = rng.randn(3, 3, 3, c_in + filt, 4 * filt).astype(
        np.float32) * 0.3
    bias = rng.randn(4 * filt).astype(np.float32) * 0.1
    h5 = str(tmp_path / "lstm_fused.h5")
    _write_layer_h5(h5, "grid_reas_P4_convlstm3d",
                    {"weights_lstm3d": fused, "bias_lstm3d": bias})

    fusion = GridFusion("lstm3d", filt, num_views=2)
    x = rng.randn(1, 2, 4, 4, 4, c_in).astype(np.float32)
    variables = fusion.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, _, report = load_h5_weights(
        h5, {"grid_fusion_p4": variables["params"]})
    assert report["loaded"] == ["grid_reas_P4_convlstm3d"]
    got = params["grid_fusion_p4"]["convlstm"]["cell"]["lstm_gates"]
    np.testing.assert_array_equal(got["kernel"], fused)
    np.testing.assert_array_equal(got["bias"], bias)


def test_depthwise_kernel_import_numeric(tmp_path):
    """DepthwiseConv2D [1,1,C,1] kernels become grouped-conv [1,1,1,C]
    kernels that compute the same per-channel scale."""
    from mulit_view_object_detection_tpu.utils.h5_import import (
        load_h5_weights)
    import flax.linen as nn

    rng = np.random.RandomState(1)
    c = 6
    dw = rng.randn(1, 1, c, 1).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    h5 = str(tmp_path / "dw.h5")
    _write_layer_h5(h5, "grid_reas_depth_PG4_DepthwiseConv_1",
                    {"depthwise_kernel": dw, "bias": bias})

    conv = nn.Conv(c, (1, 1), feature_group_count=c)
    x = rng.randn(1, 5, 5, c).astype(np.float32)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, _, report = load_h5_weights(
        h5, {"depth_collapse_p4": {"dw1": variables["params"]}})
    assert report["loaded"] == ["grid_reas_depth_PG4_DepthwiseConv_1"]
    out = conv.apply({"params": params["depth_collapse_p4"]["dw1"]},
                     jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), x * dw[0, 0, :, 0] + bias, atol=1e-6)


@pytest.mark.parametrize("lname,sub", [
    ("grid_reas_P4_3D_conv_deconv_1", "up1"),
])
def test_conv3d_transpose_import_numeric(tmp_path, lname, sub):
    """Keras Conv3DTranspose [k,k,k,out,in] kernels import as flipped +
    channel-transposed flax ConvTranspose kernels computing the same
    stride-2 SAME deconvolution (3D analog of test_h5_import.py::
    test_deconv_semantics; verified against the TF op at generation time
    by the multi-view full-graph golden)."""
    from mulit_view_object_detection_tpu.utils.h5_import import (
        load_h5_weights)
    import flax.linen as nn

    rng = np.random.RandomState(2)
    cin, cout = 3, 2
    k = rng.randn(3, 3, 3, cout, cin).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)
    h5 = str(tmp_path / "dc.h5")
    _write_layer_h5(h5, lname, {"kernel": k, "bias": bias})

    deconv = nn.ConvTranspose(cout, (3, 3, 3), strides=(2, 2, 2),
                              padding="SAME")
    x = rng.randn(1, 4, 4, 4, cin).astype(np.float32)
    variables = deconv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, _, report = load_h5_weights(
        h5, {"grid_fusion_p4": {sub: variables["params"]}})
    assert report["loaded"] == [lname]
    got = params["grid_fusion_p4"][sub]["kernel"]
    np.testing.assert_array_equal(
        got, np.transpose(k[::-1, ::-1, ::-1], (0, 1, 2, 4, 3)))
    out = deconv.apply({"params": params["grid_fusion_p4"][sub]},
                       jnp.asarray(x))
    assert out.shape == (1, 8, 8, 8, cout)


def test_timedistributed_autonamed_inner_import(tmp_path):
    """The fork's non-conv3d depth collapse saves its TimeDistributed-
    wrapped UNNAMED Conv2D under an auto-generated inner name
    ('conv2d_57/kernel:0', model_multi.py:483); the importer must fall
    back to the saved (outer) layer name to map it."""
    import h5py
    from mulit_view_object_detection_tpu.models.fusion import DepthCollapse
    from mulit_view_object_detection_tpu.utils.h5_import import (
        load_h5_weights)

    rng = np.random.RandomState(3)
    d = 4                                    # ray samples
    kernel = rng.randn(1, 1, d, 1).astype(np.float32)
    bias = rng.randn(1).astype(np.float32)
    h5 = str(tmp_path / "td.h5")
    with h5py.File(h5, "w") as f:
        f.attrs["layer_names"] = np.array([b"grid_reas_depth_PG42DConv"])
        g = f.create_group("grid_reas_depth_PG42DConv")
        g.create_dataset("conv2d_57/kernel:0", data=kernel)
        g.create_dataset("conv2d_57/bias:0", data=bias)
        g.attrs["weight_names"] = np.array(
            [b"conv2d_57/kernel:0", b"conv2d_57/bias:0"])

    collapse = DepthCollapse("add", channels=5, samples=d)
    x = rng.randn(1, d, 6, 6, 5).astype(np.float32)
    variables = collapse.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, _, report = load_h5_weights(
        h5, {"depth_collapse_p4": variables["params"]})
    assert report["loaded"] == ["conv2d_57"]
    got = params["depth_collapse_p4"]["collapse"]
    np.testing.assert_array_equal(got["kernel"], kernel)
    np.testing.assert_array_equal(got["bias"], bias)
