"""Transformer-fusion full-graph parity vs the EXECUTED reference
model_transformer.py.

The heavy check (640^2 engine compile on CPU, ~10 min) is gated behind
RUN_HEAVY_PARITY=1; the committed TRANSFORMER_PARITY_r04.json records a
run of it (10/10 detections matched, raw detection/mask errors <= 2e-6).
The always-on test below guards the piece that regresses silently: the
h5 importer's structural mapping of the reference encoder's auto-named
inner Dense/LayerNormalization layers
(utils/h5_import.py::_assign_transformer_layer) onto
models/transformer.py::ViewFusionTransformer, including the keras ->
flax MHA head-split kernel reshapes.
"""

import json
import os

import numpy as np
import pytest

INVENTORY = os.path.join(os.path.dirname(__file__), "fixtures",
                         "golden_transformer_layers.json")


@pytest.mark.skipif(not os.path.exists(INVENTORY),
                    reason="no transformer golden inventory")
def test_transformer_inventory_imports_into_flax_encoder(tmp_path):
    import jax

    from mulit_view_object_detection_tpu.models.transformer import (
        ViewFusionTransformer)
    from mulit_view_object_detection_tpu.utils.h5_fixture import (
        golden_inventory_value, write_h5_from_inventory)
    from mulit_view_object_detection_tpu.utils.h5_import import (
        load_h5_weights)

    with open(INVENTORY) as f:
        inventory = json.load(f)
    xf_entry = [e for e in inventory if e["layer"] == "transformer"][0]
    h5 = str(tmp_path / "xf.h5")
    write_h5_from_inventory(h5, [xf_entry], seed=17)

    import jax.numpy as jnp
    xf = ViewFusionTransformer(6, 72, 8, 256, 20)
    toks = jnp.zeros((1, 800, 72))
    pos = jnp.zeros((1, 800, 3))
    variables = xf.init(jax.random.PRNGKey(0), toks, pos)
    params, _, report = load_h5_weights(
        h5, {"view_transformer": variables["params"]})
    # every inner layer of the encoder group must be assigned
    n_inner = len({w["name"].split("/")[-2]
                   for w in xf_entry["weights"]})
    assert len(report["loaded"]) == n_inner, report["skipped"][:8]
    assert not report["skipped"]

    # spot-check the head-split reshape: layer 0's wq kernel (the first
    # auto-named 'dense') must land in layer0/mha/query as [72, 8, 9]
    wq_name = [w["name"] for w in xf_entry["weights"]
               if w["name"].endswith("dense/kernel:0")][0]
    want = golden_inventory_value(wq_name, (72, 72), seed=17)
    got = np.asarray(
        params["view_transformer"]["layer0"]["mha"]["query"]["kernel"])
    assert got.shape == (72, 8, 9)
    np.testing.assert_array_equal(got, want.reshape(72, 8, 9))

    # and the final token projection [800, 400]
    tp_name = [w["name"] for w in xf_entry["weights"]
               if w["name"].split("/")[-1] == "kernel:0"][-1]
    want_tp = golden_inventory_value(tp_name, (800, 400), seed=17)
    got_tp = np.asarray(
        params["view_transformer"]["token_proj"]["kernel"])
    np.testing.assert_array_equal(got_tp, want_tp)


@pytest.mark.skipif(not os.environ.get("RUN_HEAVY_PARITY"),
                    reason="640^2 CPU compile (~10 min); "
                           "set RUN_HEAVY_PARITY=1")
def test_transformer_fullgraph_parity():
    from tools.check_transformer_golden import run_check
    from tools.gen_transformer_golden import fixture_paths
    if not all(os.path.exists(p) for p in fixture_paths()):
        pytest.skip("no committed transformer golden")
    res = run_check()
    assert res["ok"], res
