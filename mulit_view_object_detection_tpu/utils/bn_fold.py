"""Inference-time BatchNorm folding.

With frozen running stats (the reference's TRAIN_BN=False regime,
model_multi.py:71-86) every BatchNorm is a per-channel affine
``y = x*s + t`` with ``s = gamma/sqrt(var+eps)``, ``t = beta - mean*s``.
When a conv directly precedes the BN, that affine folds into the conv's
kernel/bias and the BN disappears from the serving graph entirely; the
remaining BNs (those after a non-conv op, e.g. GridFusion 'add'/'lstm3d'
fuse_bn) keep the precomputed (s, t) as their scale/bias.

Used together with Config.FOLD_BN, which swaps frozen BNs for the
_AffineBN module (models/resnet.py) with an identical parameter tree —
so fold_bn_variables() output applies to the FOLD_BN model unchanged,
and a checkpoint/h5 tree loads into either form.

Measured motivation: the per-BN rsqrt/mul scalar chains cost ~1.5 ms per
frame on the flagship inference trace (three 0.5 ms f32[C] fusions plus
the bf16<->f32 converts they force) — pure overhead for frozen BNs.
"""

from __future__ import annotations

import numpy as np

BN_EPS = 1e-3  # matches models.resnet.BatchNorm

# BN module name -> candidate preceding-conv names within the same parent
# module (first present wins). Derived from the module definitions:
# resnet._Bottleneck, models.fusion.{GridFusion,DepthCollapse},
# models.heads.{ClassifierHead,MaskHead}.
_CONV_FOR_BN = {
    "bn_conv1": ("conv1",),
    "bn2a": ("conv2a",),
    "bn2b": ("conv2b",),
    "bn2c": ("conv2c",),
    "bn1": ("conv1", "down1", "pw1"),
    "bn2": ("down2", "pw2"),
    "bn_up1": ("up1",),
    "bn_up2": ("up2",),
    "bn": ("collapse",),
    "fuse_bn": ("ident_conv",),
    "mrcnn_class_bn1": ("mrcnn_class_conv1",),
    "mrcnn_class_bn2": ("mrcnn_class_conv2",),
    "mrcnn_mask_bn1": ("mrcnn_mask_conv1",),
    "mrcnn_mask_bn2": ("mrcnn_mask_conv2",),
    "mrcnn_mask_bn3": ("mrcnn_mask_conv3",),
    "mrcnn_mask_bn4": ("mrcnn_mask_conv4",),
}


def _walk(params, batch_stats, parent_params, report, path=()):
    """Recurse over the param tree; fold each BatchNorm_0 found."""
    if not isinstance(params, dict):
        return
    for name in list(params.keys()):
        child = params[name]
        if not isinstance(child, dict):
            continue
        if "BatchNorm_0" in child:
            _fold_one(name, params, batch_stats.get(name, {}), report)
        else:
            _walk(child, batch_stats.get(name, {}), params, report,
                  path + (name,))


def _fold_one(bn_name, parent_params, bn_stats, report):
    bn = parent_params[bn_name]["BatchNorm_0"]
    stats = bn_stats.get("BatchNorm_0", {})
    gamma = np.asarray(bn["scale"], np.float64)
    beta = np.asarray(bn["bias"], np.float64)
    mean = np.asarray(stats["mean"], np.float64)
    var = np.asarray(stats["var"], np.float64)
    s = gamma / np.sqrt(var + BN_EPS)
    t = beta - mean * s

    conv_name = None
    for cand in _CONV_FOR_BN.get(bn_name, ()):
        if cand in parent_params and "kernel" in parent_params[cand]:
            conv_name = cand
            break

    f32 = np.float32
    if conv_name is not None:
        conv = parent_params[conv_name]
        kernel = np.asarray(conv["kernel"], np.float64)
        # conv & conv-transpose kernels both keep out-features last in flax
        conv["kernel"] = (kernel * s).astype(f32)
        bias = np.asarray(conv.get("bias", np.zeros(s.shape)), np.float64)
        conv["bias"] = (bias * s + t).astype(f32)
        bn["scale"] = np.ones_like(gamma, f32)
        bn["bias"] = np.zeros_like(beta, f32)
        report["folded"].append(f"{conv_name}<-{bn_name}")
    else:
        bn["scale"] = s.astype(f32)
        bn["bias"] = t.astype(f32)
        report["affine"].append(bn_name)
    # stats become identity so (a) the _AffineBN variables stay layout-
    # compatible and (b) re-folding an already-folded tree is a no-op.
    # var = 1-eps makes sqrt(var+eps) exactly 1.0, so the folded tree is
    # also exact under the UNFOLDED BatchNorm module.
    if stats:
        stats["mean"] = np.zeros_like(mean, f32)
        stats["var"] = np.full_like(var, 1.0 - BN_EPS, dtype=f32)


def group_fusion_variables(variables, level_indices, mode="conv3d"):
    """Build the CROSS_LEVEL_FUSION parameter subtree: channel-concatenate
    the (BN-folded) per-level GridFusion conv kernels/biases in level
    order into `params['grid_fusion_grouped']`, matching
    models.fusion.GroupedGridFusion's grouped-conv layout
    (feature_group_count = len(level_indices), group l = level l).

    Must run on a fold_bn_variables() tree — the grouped module has no
    BatchNorms, so any unfolded BN statistics would be silently dropped.
    The per-level subtrees are left in place (checkpoints and the
    training path keep using them); idempotent."""
    import jax

    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    names = [f"grid_fusion_p{li + 2}" for li in level_indices]
    for n in names:
        if n not in params:
            raise ValueError(f"no per-level fusion params for {n}")
        for bn in params[n]:
            if "BatchNorm_0" not in params[n][bn]:
                continue
            bnp = params[n][bn]["BatchNorm_0"]
            folded = (np.allclose(bnp["scale"], 1.0)
                      and np.allclose(bnp["bias"], 0.0))
            # scale/bias can sit at their init values while the RUNNING
            # STATS trained (e.g. frozen-stage training) — require the
            # unique identity signature _fold_one writes (mean=0,
            # var=1-eps), or the stats would be silently dropped.
            stats = (batch_stats.get(n, {}).get(bn, {})
                     .get("BatchNorm_0", {}))
            if stats:
                folded = (folded
                          and np.allclose(stats["mean"], 0.0)
                          and np.allclose(stats["var"], 1.0 - BN_EPS))
            if not folded:
                raise ValueError(
                    "group_fusion_variables needs a BN-folded tree; "
                    f"run fold_bn_variables first ({n}/{bn})")

    def cat(layer, field):
        return np.concatenate(
            [np.asarray(params[n][layer][field]) for n in names], axis=-1)

    layers = (("down1", "down2", "up1", "up2") if mode == "conv3d"
              else ("ident_conv",))
    params["grid_fusion_grouped"] = {
        layer: {"kernel": cat(layer, "kernel"), "bias": cat(layer, "bias")}
        for layer in layers}
    return variables


def fold_bn_variables(variables):
    """Fold every frozen BatchNorm in a flax variables dict. Returns a new
    {'params', 'batch_stats', ...} dict (numpy leaves) plus a report of
    which BNs folded into convs vs stayed affine. Idempotent."""
    import jax

    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    report = {"folded": [], "affine": []}
    _walk(params, batch_stats, None, report)
    variables["params"] = params
    variables["batch_stats"] = batch_stats
    return variables, report
