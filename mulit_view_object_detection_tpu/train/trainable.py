"""Stage-wise layer freezing: the reference's regex-over-layer-names
(model_multi.py:2822-2836, set_trainable model_multi.py:2709-2745) becomes a
predicate over flax parameter paths.

Stages:
  heads     rpn + classifier/mask heads + fpn (+ depth collapse/transformer)
  grid+     heads + grid fusion
  grid+-    grid+ minus fpn
  grid_only grid fusion only
  3+ / 4+ / 5+   resnet stage N and up + grid+ set
  all       everything
"""

from __future__ import annotations

import re

import jax

HEAD_TOPS = ("rpn", "classifier_head", "mask_head", "fpn", "depth_collapse",
             "view_transformer")
GRID_TOPS = ("grid_fusion",)


def _in(top, tops):
    # per-level fusion modules are named grid_fusion_p4 / depth_collapse_p5…
    return top.startswith(tops)


def _backbone_stage(name):
    m = re.match(r"res(\d)", name)
    if m:
        return int(m.group(1))
    if name in ("conv1", "bn_conv1"):
        return 1
    return None


def _path_trainable(path, stage):
    top = path[0]
    if stage == "all":
        return True
    if stage == "heads":
        return _in(top, HEAD_TOPS)
    if stage == "grid+":
        return _in(top, HEAD_TOPS) or _in(top, GRID_TOPS)
    if stage == "grid+-":
        no_fpn = tuple(t for t in HEAD_TOPS if t != "fpn")
        return _in(top, no_fpn) or _in(top, GRID_TOPS)
    if stage == "grid_only":
        return _in(top, GRID_TOPS)
    m = re.match(r"(\d)\+$", stage)
    if m:
        min_stage = int(m.group(1))
        if _in(top, HEAD_TOPS) or _in(top, GRID_TOPS):
            return True
        if top == "backbone" and len(path) > 1:
            s = _backbone_stage(path[1])
            return s is not None and s >= min_stage
        return False
    # otherwise treat the stage as a regex over the dotted path
    dotted = "/".join(path)
    return re.fullmatch(stage, dotted) is not None or \
        re.match(stage, dotted) is not None


def trainable_mask(params, stage):
    """Pytree of bools matching `params`: True = train, False = freeze."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat[0], flat[1]
    out = []
    for path, _ in leaves:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        out.append(_path_trainable(keys, stage))
    return jax.tree_util.tree_unflatten(treedef, out)
