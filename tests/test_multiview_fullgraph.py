"""Multi-view full-graph parity vs the EXECUTED reference model_multi.py.

The heavy check (640^2 engine compile on CPU, ~5-10 min) is gated behind
RUN_HEAVY_PARITY=1; the committed MULTIVIEW_PARITY_r04.json records a
run of it (10/10 detections matched, exact scores/masks). The always-on
test below guards the piece that regresses silently: the h5 importer's
name mapping for every weighted layer of the multi-view fork's
checkpoint protocol (tests/fixtures/golden_multiview_layers.json is the
real inventory of the built model_multi inference graph).
"""

import glob
import json
import os

import numpy as np
import pytest

INVENTORY = os.path.join(os.path.dirname(__file__), "fixtures",
                         "golden_multiview_layers.json")
ALL_INVENTORIES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "fixtures", "golden_multiview_layers*.json")))


@pytest.mark.parametrize("inventory_path", ALL_INVENTORIES,
                         ids=[os.path.basename(p) for p in ALL_INVENTORIES])
def test_importer_maps_every_multiview_layer(inventory_path):
    from mulit_view_object_detection_tpu.utils.h5_import import _map_layer
    with open(inventory_path) as f:
        inventory = json.load(f)
    unmapped = []
    for e in inventory:
        if e["layer"] == "rpn_model":
            # nested submodel: the importer addresses its INNER layers
            inners = {w["name"].split("/")[0] for w in e["weights"]}
            for inner in inners:
                if _map_layer(inner)[0] is None:
                    unmapped.append(inner)
            continue
        if _map_layer(e["layer"])[0] is None:
            unmapped.append(e["layer"])
    assert not unmapped, (
        f"{len(unmapped)} multi-view checkpoint layers have no importer "
        f"mapping: {unmapped[:8]}")


def test_inventory_h5_round_trip(tmp_path):
    """write_h5_from_inventory produces the keras-2 protocol our reader
    consumes: every inventory weight comes back byte-identical."""
    from mulit_view_object_detection_tpu.utils.h5_fixture import (
        golden_inventory_value, write_h5_from_inventory)
    from mulit_view_object_detection_tpu.utils.h5_import import (
        _h5_layer_weights)
    import h5py

    with open(INVENTORY) as f:
        inventory = json.load(f)
    path = str(tmp_path / "mv.h5")
    write_h5_from_inventory(path, inventory, seed=13)
    with h5py.File(path, "r") as f:
        layers, _ = _h5_layer_weights(f)
    n = 0
    for e in inventory:
        for w in e["weights"]:
            inner = w["name"].split("/")[0]
            wname = w["name"].split("/")[-1].split(":")[0]
            got = layers[inner][wname]
            expect = golden_inventory_value(w["name"], w["shape"], seed=13)
            np.testing.assert_array_equal(got, expect)
            n += 1
    assert n == sum(len(e["weights"]) for e in inventory)


@pytest.mark.skipif(not os.environ.get("RUN_HEAVY_PARITY"),
                    reason="640^2 CPU compile (~5-10 min); "
                           "set RUN_HEAVY_PARITY=1")
@pytest.mark.parametrize("grid_reas", ["conv3d", "ident", "add", "lstm3d"])
def test_multiview_fullgraph_parity(grid_reas):
    from tools.check_multiview_golden import run_check
    from tools.gen_multiview_golden import fixture_paths
    if not all(os.path.exists(p) for p in fixture_paths(grid_reas)):
        pytest.skip(f"no committed golden for {grid_reas}")
    res = run_check(grid_reas)
    assert res["ok"], res
