"""Multi-view Mask R-CNN — the single model core.

The reference maintains three ~85%-identical model files (model.py,
model_multi.py, model_transformer.py — SURVEY.md §1); here ONE module
implements all variants, switched by config:

  NUM_VIEWS == 1        -> stock single-view Mask R-CNN (model.py graph)
  TRANSFORMER           -> P5-only transformer view fusion, other levels
                           zeroed (model_transformer.py:2419-2438)
  VANILLA               -> multi-view inputs, but the main view's features
                           are used directly with P2/P3 zeroed
                           (model_multi.py:2413-2422; the reference's P3
                           zero-shape bug is NOT reproduced)
  otherwise             -> projected path: per-level unproject -> fuse ->
                           reproject -> depth-collapse; PG2/PG3 zeroed
                           (the reference's memory cap, model_multi.py:
                           2406-2412) — and, unlike TF which builds-then-
                           prunes, we never compute the zeroed levels.

TPU-native details:
  * views fold into the batch axis for backbone/FPN (vs TimeDistributed);
  * RPN on zeroed levels is constant-folded: conv stacks on an all-zero
    input are spatially constant (= function of biases), so we evaluate the
    RPN on a 1x1 zero tile and broadcast — exact numerics, skips the two
    largest levels' RPN convs entirely;
  * proposals/NMS/ROI-align/targets are the static-shape ops from ops/;
  * everything jit-compatible with static shapes throughout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import norm_boxes
from ..ops.detection import refine_detections
from ..ops.image_meta import parse_image_meta
from ..ops.projection import (project_grid, unproject_features,
                              unproject_rays, voxel_grid_points)
from ..ops.proposals import generate_proposals
from ..ops.roi_align import pyramid_roi_align
from ..ops.targets import detection_targets_batch
from .fpn import FPN
from .fusion import DepthCollapse, GridFusion
from .heads import ClassifierHead, MaskHead
from .resnet import ResNet
from .rpn import RPNHead
from .transformer import ViewFusionTransformer


class MaskRCNN(nn.Module):
    config: Any

    def _dtype(self):
        return (jnp.bfloat16 if self.config.COMPUTE_DTYPE == "bfloat16"
                else jnp.float32)

    @nn.compact
    def __call__(self, batch, training=False):
        """batch keys:
          images  [B, V, H, W, 3] molded float32, or raw resized uint8
                  when config.UINT8_IMAGE_TRANSFER (de-molded on device)
          image_meta [B, META_SIZE]
          anchors [A, 4] normalized
          Rcam    [B, V, 3, 4] cam->world poses   (multi-view only)
          Kmat    [B, 3, 3]                       (multi-view only)
          depths  [B, V, dh, dw]                  (transformer only)
          gt_class_ids [B, G], gt_boxes [B, G, 4] normalized,
          gt_masks [B, G, mh, mw]                 (training only)
        """
        cfg = self.config
        dtype = self._dtype()
        images = batch["images"]
        b, v, h, w, _ = images.shape
        # BN_EVAL_BATCH_STATS: diagnostic knob — keep BN in batch-stats
        # mode even on the inference graph, to isolate train/eval skew
        # caused by running-average drift (batch-size-1 training computes
        # per-scene statistics the heads adapt to; see BENCH_NOTES.md).
        train_bn = bool(cfg.TRAIN_BN) and (
            training or bool(getattr(cfg, "BN_EVAL_BATCH_STATS", False)))
        # FOLD_BN: serving mode — frozen BNs become pre-folded affines
        # (see utils/bn_fold.py); inference-only, exact same param tree.
        fold_bn = bool(getattr(cfg, "FOLD_BN", False)) and not training
        multiview = v > 1 or cfg.NUM_VIEWS > 1

        # ------------------------------------------------------------------
        # Backbone + FPN (views folded into batch)
        # ------------------------------------------------------------------
        x = images.reshape(b * v, h, w, images.shape[-1])
        if x.dtype == jnp.uint8:
            # UINT8_IMAGE_TRANSFER: raw resized pixels shipped host->device
            # (4x fewer bytes); de-mold here in f32 — bit-identical to the
            # host-side mold (molding.py:150 subtracts MEAN_PIXEL from the
            # same uint8 pixels). XLA fuses the subtract into the first conv.
            mean = jnp.asarray(np.asarray(cfg.MEAN_PIXEL, np.float32))
            x = x.astype(jnp.float32) - mean
        x = x.astype(dtype)
        stage4_blocks = getattr(cfg, "RESNET50_STAGE4_BLOCKS", None)
        _, c2, c3, c4, c5 = ResNet(
            cfg.BACKBONE, stage5=True, train_bn=train_bn,
            stage4_blocks=stage4_blocks, dtype=dtype, fold_bn=fold_bn,
            remat=bool(getattr(cfg, "REMAT", False)) and training,
            stem_s2d=bool(getattr(cfg, "STEM_S2D", False))
            and not training,
            name="backbone")(x)
        # post-P-conv ReLU: a model_multi.py-only divergence (630-640).
        # model_transformer.py's FPN does NOT have it (:622-637) — a real
        # difference between the reference's clone files, caught by the
        # transformer full-graph golden.
        p2, p3, p4, p5, p6 = FPN(
            cfg.TOP_DOWN_PYRAMID_SIZE,
            post_relu=multiview and not cfg.TRANSFORMER, dtype=dtype,
            name="fpn")(c2, c3, c4, c5)
        levels = [p2, p3, p4, p5, p6]
        if multiview:
            levels = [p.reshape((b, v) + p.shape[1:]) for p in levels]
        else:
            levels = [p[:, None] for p in levels]  # [B, 1, h, w, C]

        # ------------------------------------------------------------------
        # View fusion -> per-level feature maps + which levels are zero
        # ------------------------------------------------------------------
        fmaps, zero_levels = self._fuse_views(batch, levels, (h, w),
                                              training, dtype)

        rpn_feature_maps = fmaps                  # P2..P6
        mrcnn_feature_maps = fmaps[:4]            # P2..P5

        # ------------------------------------------------------------------
        # RPN (shared head; zero levels constant-folded)
        # ------------------------------------------------------------------
        rpn = RPNHead(len(cfg.RPN_ANCHOR_RATIOS), cfg.RPN_ANCHOR_STRIDE,
                      dtype=dtype, name="rpn")
        k = len(cfg.RPN_ANCHOR_RATIOS)
        logits_l, probs_l, deltas_l = [], [], []
        level_counts = []
        for li, fmap in enumerate(rpn_feature_maps):
            if li in zero_levels:
                lh, lw = fmap.shape[1], fmap.shape[2]
                tile = jnp.zeros((b, 1, 1, fmap.shape[-1]), dtype)
                lg, pr, dl = rpn(tile)            # [B, k, ...] constants
                # cell count of the SAME-padded strided RPN conv (and of
                # the anchor lattice): ceil(dim / anchor_stride)
                astr = cfg.RPN_ANCHOR_STRIDE
                reps = (-(-lh // astr)) * (-(-lw // astr))
                lg = jnp.tile(lg, (1, reps, 1))
                pr = jnp.tile(pr, (1, reps, 1))
                dl = jnp.tile(dl, (1, reps, 1))
            else:
                lg, pr, dl = rpn(fmap)
            logits_l.append(lg)
            probs_l.append(pr)
            deltas_l.append(dl)
            level_counts.append(int(lg.shape[1]))
        rpn_class_logits = jnp.concatenate(logits_l, axis=1)
        rpn_probs = jnp.concatenate(probs_l, axis=1)
        rpn_bbox = jnp.concatenate(deltas_l, axis=1)

        # ------------------------------------------------------------------
        # Proposals (gradients stopped, model.py:409-410)
        # ------------------------------------------------------------------
        proposal_count = (cfg.POST_NMS_ROIS_TRAINING if training
                          else cfg.POST_NMS_ROIS_INFERENCE)
        # Zeroed levels' scores are k-periodic constants — one constant
        # per anchor-ratio slot, tiled over cells by the folded RPN above
        # — tell the proposal layer so its top-k runs only over the
        # non-constant anchors (exact, ~94% fewer at the flagship shape)
        const_spans, off = [], 0
        for li, n_l in enumerate(level_counts):
            if li in zero_levels:
                const_spans.append((off, n_l, k))
            off += n_l
        if off != batch["anchors"].shape[0]:
            const_spans = []              # anchor layout mismatch: fall back
        proposals = generate_proposals(
            jax.lax.stop_gradient(rpn_probs),
            jax.lax.stop_gradient(rpn_bbox),
            batch["anchors"],
            proposal_count=proposal_count,
            nms_threshold=cfg.RPN_NMS_THRESHOLD,
            pre_nms_limit=cfg.PRE_NMS_LIMIT,
            bbox_std_dev=np.asarray(cfg.RPN_BBOX_STD_DEV),
            const_spans=tuple(const_spans))

        classifier = ClassifierHead(
            cfg.NUM_CLASSES, cfg.POOL_SIZE, cfg.FPN_CLASSIF_FC_LAYERS_SIZE,
            train_bn, dtype, fold_bn, name="classifier_head")
        mask_filters = 128 if multiview else 256  # model_multi.py:1412-1438
        mask_head = MaskHead(cfg.NUM_CLASSES, mask_filters, train_bn, dtype,
                             fold_bn,
                             phase_deconv=bool(
                                 getattr(cfg, "PHASE_DECONV_MASK", False))
                             and not training,
                             name="mask_head")

        outputs = {
            "rpn_class_logits": rpn_class_logits,
            "rpn_probs": rpn_probs,
            "rpn_bbox": rpn_bbox,
            "proposals": proposals,
        }
        if getattr(cfg, "EXPOSE_FUSED_PYRAMID", False):
            # post-fusion pyramid (the reference's PG2..PG5) for
            # run_graph/ancestor partial-graph debugging and parity
            # bisection. Opt-in: as jitted outputs these are ~35 MB of
            # extra HBM buffers per 640^2 image that XLA can't DCE or
            # reuse — never on the production detect() path.
            outputs.update({f"fused_p{li + 2}": fm
                            for li, fm in enumerate(mrcnn_feature_maps)})

        if training:
            rng = self.make_rng("sampling")
            rois, tcls, tdeltas, tmasks = detection_targets_batch(
                rng, proposals, batch["gt_class_ids"], batch["gt_boxes"],
                batch["gt_masks"],
                train_rois_per_image=cfg.TRAIN_ROIS_PER_IMAGE,
                roi_positive_ratio=cfg.ROI_POSITIVE_RATIO,
                mask_shape=tuple(cfg.MASK_SHAPE),
                use_mini_mask=cfg.USE_MINI_MASK,
                bbox_std_dev=np.asarray(cfg.BBOX_STD_DEV))
            pooled = pyramid_roi_align(rois, mrcnn_feature_maps, (h, w),
                                       cfg.POOL_SIZE)
            logits, probs, bbox = classifier(pooled)
            pooled_m = pyramid_roi_align(rois, mrcnn_feature_maps, (h, w),
                                         cfg.MASK_POOL_SIZE)
            pred_masks = mask_head(pooled_m)
            outputs.update({
                "rois": rois,
                "target_class_ids": tcls,
                "target_deltas": tdeltas,
                "target_masks": tmasks,
                "mrcnn_class_logits": logits,
                "mrcnn_probs": probs,
                "mrcnn_bbox": bbox,
                "mrcnn_masks": pred_masks,
            })
            return outputs

        # Inference
        pooled = pyramid_roi_align(proposals, mrcnn_feature_maps, (h, w),
                                   cfg.POOL_SIZE)
        logits, probs, bbox = classifier(pooled)
        meta = parse_image_meta(batch["image_meta"])
        windows = norm_boxes(meta["window"], (h, w))  # [B, 4]
        detections = refine_detections(
            proposals, probs, bbox, windows,
            bbox_std_dev=np.asarray(cfg.BBOX_STD_DEV),
            detection_min_confidence=cfg.DETECTION_MIN_CONFIDENCE,
            detection_max_instances=cfg.DETECTION_MAX_INSTANCES,
            detection_nms_threshold=cfg.DETECTION_NMS_THRESHOLD)
        det_boxes = detections[..., :4]
        pooled_m = pyramid_roi_align(det_boxes, mrcnn_feature_maps, (h, w),
                                     cfg.MASK_POOL_SIZE)
        pred_masks = mask_head(pooled_m)
        outputs.update({
            "mrcnn_class_logits": logits,
            "mrcnn_probs": probs,
            "mrcnn_bbox": bbox,
            "detections": detections,
            "mrcnn_masks": pred_masks,
        })
        return outputs

    # ----------------------------------------------------------------------
    # View fusion dispatch
    # ----------------------------------------------------------------------
    def _fuse_views(self, batch, levels, image_shape, training, dtype):
        """levels: list of 5 [B, V, h, w, C]. Returns ([P2..P6] as
        [B, h, w, C], zero_level_indices)."""
        cfg = self.config
        v = levels[0].shape[1]

        if v == 1 and not cfg.TRANSFORMER:
            return [p[:, 0] for p in levels], set()

        if cfg.TRANSFORMER:
            p5 = levels[3]                        # [B, V, 20H, 20W, C]
            faithful = bool(getattr(cfg, "XFORMER_FAITHFUL_PAIRING", False))
            positions, tokens = unproject_rays(
                p5.astype(jnp.float32), batch["Rcam"], batch["Kmat"],
                batch["depths"], image_shape, samples=cfg.samples,
                faithful_pairing=faithful)
            fused = ViewFusionTransformer(
                cfg.XFORMER_NUM_LAYERS, cfg.XFORMER_D_MODEL,
                cfg.XFORMER_NUM_HEADS, cfg.XFORMER_DFF,
                p5.shape[2], cfg.XFORMER_DROPOUT, dtype,
                zero_init=bool(getattr(cfg, "XFORMER_ZERO_INIT", False)),
                faithful_output=faithful,
                name="view_transformer")(
                    tokens.astype(dtype), positions,
                    deterministic=not training)
            # Reference semantics zero every level except the fused P5
            # (model_transformer.py:2419-2438). XFORMER_KEEP_MAIN_LEVELS
            # (opt-in, no reference analog) keeps the main view's features
            # on the other levels instead — needed when objects are small
            # relative to the image so ROIs route to P2/P3.
            keep_main = bool(getattr(cfg, "XFORMER_KEEP_MAIN_LEVELS", False))
            out, zeros = [], set()
            for li, p in enumerate(levels):
                main = p[:, 0]
                if li == 3:
                    out.append(main + fused.astype(main.dtype))
                elif keep_main:
                    out.append(main)
                else:
                    out.append(jnp.zeros_like(main))
                    zeros.add(li)
            return out, zeros

        zero_levels = set(getattr(cfg, "ZERO_PG_LEVELS", (0, 1)))
        if cfg.VANILLA:
            out, zeros = [], set()
            for li, p in enumerate(levels):
                main = p[:, 0]
                if li in zero_levels:             # P2, P3 by default
                    out.append(jnp.zeros_like(main))
                    zeros.add(li)
                else:
                    out.append(main)
            return out, zeros

        # Projected multi-view path: levels P4, P5, P6 carry signal
        grid_pts = jnp.asarray(voxel_grid_points(cfg))
        grid_shape = (cfg.nvox, cfg.nvox, cfg.nvox_z)
        method = ("trilinear" if getattr(cfg, "TRILINEAR_REPROJECTION", False)
                  else "nearest")
        use_pallas = getattr(cfg, "USE_PALLAS", False) and \
            jax.default_backend() in ("tpu", "axon")
        if use_pallas:
            from ..kernels.unproject_pallas import (
                unproject_features_pallas, unproject_features_pallas_fused)
            unproject = unproject_features_pallas
        else:
            unproject = unproject_features
        # conv3d/ident consume relu(concat-on-channels(views)): the fused
        # kernel emits that layout directly with the relu in its epilogue
        fuse_layout = use_pallas and cfg.GRID_REAS in ("conv3d", "ident")

        train_bn_now = bool(cfg.TRAIN_BN) and (
            training or bool(getattr(cfg, "BN_EVAL_BATCH_STATS", False)))
        cross_level = (bool(getattr(cfg, "CROSS_LEVEL_FUSION", False))
                       and not training and not train_bn_now
                       and cfg.GRID_REAS in ("conv3d", "ident"))
        if cross_level:
            return self._fuse_views_cross_level(
                batch, levels, image_shape, zero_levels, grid_pts,
                grid_shape, method, use_pallas, fuse_layout, v, dtype)
        # loop-invariant module flags, computed ONCE (train_bn_now is the
        # same BN-mode predicate the backbone got; keeping a single copy
        # prevents the backbone and fusion BN modes from desynchronizing)
        remat = bool(getattr(cfg, "REMAT", False)) and training
        Fusion = nn.remat(GridFusion) if remat else GridFusion
        Collapse = nn.remat(DepthCollapse) if remat else DepthCollapse
        fold_bn = bool(getattr(cfg, "FOLD_BN", False)) and not training
        out, zeros = [], set()
        for li, p in enumerate(levels):
            if li in zero_levels:                 # PG2/PG3 memory cap
                out.append(jnp.zeros_like(p[:, 0]))
                zeros.add(li)
                continue
            # SEPARATE fusion/collapse weights per pyramid level — the
            # reference's reused_lay keys embed the level scope
            # ('grid_reas_P4_3D_conv', model_multi.py:394-463), so each
            # level owns its weights there too.
            # Under REMAT the voxel-space fusion/collapse activations (the
            # largest tensors in the graph, [B,V,nvox^3,C]-scale) are
            # recomputed in the backward pass instead of read from HBM.
            fusion = Fusion(cfg.GRID_REAS, cfg.TOP_DOWN_PYRAMID_SIZE, v,
                            train_bn_now, dtype,
                            fold_bn, inputs_fused=fuse_layout,
                            phase_deconv=bool(
                                getattr(cfg, "PHASE_DECONV", False))
                            and not training,
                            lstm_hoist=bool(
                                getattr(cfg, "LSTM_HOIST_INPUT", False))
                            and not training,
                            zfold=bool(getattr(cfg, "ZFOLD_FUSION", False))
                            and not training,
                            name=f"grid_fusion_p{li + 2}")
            collapse = Collapse(
                cfg.GRID_REAS, cfg.TOP_DOWN_PYRAMID_SIZE, cfg.samples,
                train_bn_now, dtype,
                fold_bn, name=f"depth_collapse_p{li + 2}")
            if fuse_layout:
                vox = unproject_features_pallas_fused(
                    p, batch["Rcam"], batch["Kmat"], image_shape,
                    grid_pts, grid_shape, relu=True)
            else:
                vox = unproject(p, batch["Rcam"], batch["Kmat"],
                                image_shape, grid_pts, grid_shape)
            fused = fusion(vox)
            out.append(self._reproject_collapse(
                fused, collapse, p.shape[2], batch, image_shape, method,
                use_pallas, dtype))
        return out, zeros

    def _reproject_collapse(self, fused, collapse, s, batch, image_shape,
                            method, use_pallas, dtype):
        """Shared tail of the per-level and cross-level fusion paths:
        reproject the fused voxel grid onto the level's ray samples and
        collapse the depth axis. Single-sourced so the serving path's
        numerics cannot silently diverge from the train/eval path."""
        cfg = self.config
        if use_pallas and method == "nearest":
            # keep bf16: the one-hot gather is exact in any dtype
            from ..kernels.reproject_pallas import project_grid_pallas
            rays = project_grid_pallas(
                fused, batch["Kmat"], image_shape, s, cfg.samples, cfg)
        else:
            rays = project_grid(fused.astype(jnp.float32),
                                batch["Kmat"], image_shape, s,
                                cfg.samples, cfg, method=method)
        return collapse(rays.astype(dtype))

    def _fuse_views_cross_level(self, batch, levels, image_shape,
                                zero_levels, grid_pts, grid_shape, method,
                                use_pallas, fuse_layout, v, dtype):
        """CROSS_LEVEL_FUSION serving path: one grouped U-Net over the
        channel-concatenated voxel grids of all active levels instead of
        L per-level U-Nets (Config.CROSS_LEVEL_FUSION; weights built by
        utils.bn_fold.group_fusion_variables). Reprojection and depth
        collapse stay per level — their spatial shapes differ."""
        from .fusion import DepthCollapse, GroupedGridFusion
        cfg = self.config
        if use_pallas:
            from ..kernels.unproject_pallas import (
                unproject_features_pallas, unproject_features_pallas_fused)
        active = [li for li in range(len(levels)) if li not in zero_levels]
        voxes = []
        for li in active:
            p = levels[li]
            if fuse_layout:
                vox = unproject_features_pallas_fused(
                    p, batch["Rcam"], batch["Kmat"], image_shape,
                    grid_pts, grid_shape, relu=True)
            else:
                unproject_fn = (unproject_features_pallas if use_pallas
                                else unproject_features)
                vox = unproject_fn(p, batch["Rcam"], batch["Kmat"],
                                   image_shape, grid_pts, grid_shape)
                b_, v_, nx, ny, nz, c_ = vox.shape
                vox = nn.relu(vox.transpose(0, 2, 3, 4, 1, 5).reshape(
                    b_, nx, ny, nz, v_ * c_))
            voxes.append(vox)
        grouped = GroupedGridFusion(
            cfg.GRID_REAS, cfg.TOP_DOWN_PYRAMID_SIZE, len(active), v,
            dtype, name="grid_fusion_grouped")(
                jnp.concatenate(voxes, axis=-1))
        fold_bn = bool(getattr(cfg, "FOLD_BN", False))
        C = cfg.TOP_DOWN_PYRAMID_SIZE
        out = [None] * len(levels)
        for li in zero_levels:
            out[li] = jnp.zeros_like(levels[li][:, 0])
        for i, li in enumerate(active):
            fused = grouped[..., i * C:(i + 1) * C]
            collapse = DepthCollapse(
                cfg.GRID_REAS, C, cfg.samples, False, dtype, fold_bn,
                name=f"depth_collapse_p{li + 2}")
            out[li] = self._reproject_collapse(
                fused, collapse, levels[li].shape[2], batch, image_shape,
                method, use_pallas, dtype)
        return out, set(zero_levels)


def make_dummy_batch(config, training=False, batch_size=None, num_views=None,
                     image_size=None):
    """Zero-filled inputs with the right static shapes — for module.init,
    shape checks and compile smoke tests."""
    from ..ops.anchors import get_anchors

    cfg = config
    b = batch_size or cfg.BATCH_SIZE
    v = num_views or cfg.NUM_VIEWS
    hw = image_size or int(cfg.IMAGE_SHAPE[0])
    anchors = get_anchors(cfg, [hw, hw, 3])
    img_dtype = (np.uint8 if getattr(cfg, "UINT8_IMAGE_TRANSFER", False)
                 else np.float32)
    batch = {
        "images": np.zeros((b, v, hw, hw, 3), img_dtype),
        "image_meta": np.zeros((b, cfg.IMAGE_META_SIZE), np.float32),
        "anchors": anchors.astype(np.float32),
        "Rcam": np.tile(np.eye(3, 4, dtype=np.float32), (b, v, 1, 1)),
        "Kmat": np.tile(np.array([[hw, 0, hw / 2], [0, hw, hw / 2],
                                  [0, 0, 1]], np.float32), (b, 1, 1)),
    }
    batch["image_meta"][:, 4:7] = [hw, hw, 3]
    batch["image_meta"][:, 7:11] = [0, 0, hw, hw]
    if cfg.TRANSFORMER:
        s5 = hw // cfg.BACKBONE_STRIDES[3]
        batch["depths"] = np.full((b, v, s5, s5), 2.0, np.float32)
    if training:
        g = cfg.MAX_GT_INSTANCES
        mh, mw = (cfg.MINI_MASK_SHAPE if cfg.USE_MINI_MASK
                  else (hw, hw))
        batch["gt_class_ids"] = np.zeros((b, g), np.int32)
        batch["gt_boxes"] = np.zeros((b, g, 4), np.float32)
        batch["gt_masks"] = np.zeros((b, g, mh, mw), np.float32)
    return batch
