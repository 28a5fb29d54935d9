"""Matterport-parity engine API.

`MaskRCNN(mode, config, model_dir)` with `detect(images, Rcam, Kmat,
depths)`, `train(...)`, `mold_inputs`/`unmold_detections`, `get_anchors`,
`find_last`, `load_weights`/`save_weights` — the public surface of the
reference engine (model.py:1824-2725, model_multi.py:2300-3271), backed by
the jitted JAX model instead of a Keras graph/session.
"""

from __future__ import annotations

import datetime
import logging
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config  # noqa: F401  (re-export convenience)
from ..data.generator import BatchPrefetcher, make_batch
from ..data.molding import mold_image, resize_image, unmold_mask
from ..ops.anchors import get_anchors
from ..ops.boxes import denorm_boxes_np, norm_boxes_np
from ..ops.image_meta import compose_image_meta
from ..models.detector import MaskRCNN as _Model, make_dummy_batch
from ..train.checkpoint import (latest_step, restore_checkpoint,
                                save_checkpoint)
from ..train.step import (create_train_state, make_eval_step,
                          make_train_step, make_val_step)

log = logging.getLogger(__name__)


class MaskRCNN:
    """Engine wrapper: mode in {'training', 'inference'}."""

    def __init__(self, mode, config, model_dir):
        assert mode in ("training", "inference")
        self.mode = mode
        self.config = config
        self.model_dir = model_dir
        self.model = _Model(config)
        self.epoch = 0
        self._state = None
        self._fold_src = None
        self._fold_cache = None
        self._infer_step = None
        self._rng = jax.random.PRNGKey(0)
        self.set_log_dir()

    # ------------------------------------------------------------------ #
    # state / weights
    # ------------------------------------------------------------------ #
    def _ensure_state(self):
        if self._state is None:
            batch = make_dummy_batch(self.config, training=True)
            self._state = create_train_state(
                self.model, self.config, jax.random.PRNGKey(0), batch)
        return self._state


    def _maybe_fold(self, state):
        """FOLD_BN serving mode: bake frozen-BN affines into conv weights
        once per state (utils/bn_fold.py); cached until the state changes.
        With CROSS_LEVEL_FUSION also builds the grouped cross-level
        fusion weights from the folded per-level ones."""
        cfg = self.config
        cross = (bool(getattr(cfg, "CROSS_LEVEL_FUSION", False))
                 and not cfg.VANILLA and not getattr(cfg, "TRANSFORMER",
                                                     False)
                 and cfg.NUM_VIEWS > 1
                 and cfg.GRID_REAS in ("conv3d", "ident"))
        if not getattr(cfg, "FOLD_BN", False) and not cross:
            return state
        if self._fold_src is not state:
            from ..utils.bn_fold import (fold_bn_variables,
                                         group_fusion_variables)
            folded, _ = fold_bn_variables(
                {"params": state.params, "batch_stats": state.batch_stats})
            if cross:
                zero = set(getattr(cfg, "ZERO_PG_LEVELS", (0, 1)))
                active = [li for li in range(5) if li not in zero]
                folded = group_fusion_variables(folded, active,
                                                mode=cfg.GRID_REAS)
            # fold_bn_variables works in host numpy; push the folded trees
            # to the device ONCE here, or every detect() re-uploads the
            # whole weight set (bench.py does the same post-fold put)
            folded = jax.device_put(folded)
            self._fold_cache = state.replace(
                params=folded["params"], batch_stats=folded["batch_stats"])
            self._fold_src = state
        return self._fold_cache

    def load_weights(self, filepath, by_name=True, exclude=None):
        """Load weights from either an Orbax checkpoint directory or a
        keras `.h5` file (the reference API: model.load_weights(
        "mask_rcnn_coco.h5", by_name=True, exclude=[...]),
        model.py:2102-2144). For h5, `exclude` is the keras layer-name
        list; for Orbax it drops param sub-trees by top-level name."""
        state = self._ensure_state()
        if str(filepath).endswith((".h5", ".hdf5")):
            from ..utils.h5_import import load_h5_weights
            params, batch_stats, report = load_h5_weights(
                filepath, state.params, state.batch_stats, exclude=exclude)
            self._state = state.replace(params=params,
                                        batch_stats=batch_stats)
            self._infer_step = None
            self._last_h5_report = report
            return self
        restored = restore_checkpoint(filepath, state)
        if exclude:
            params = dict(restored.params)
            for name in exclude:
                if name in params:
                    params[name] = state.params[name]
            restored = restored.replace(params=params)
        self._state = restored
        self._infer_step = None
        # resume the epoch count from the checkpoint — the reference calls
        # set_log_dir(filepath) inside load_weights (model_multi.py:2642)
        # so a subsequent train(epochs=N) CONTINUES instead of re-running
        # completed stages
        self.set_log_dir(filepath)
        return self

    def save_weights(self, filepath, step=None):
        return save_checkpoint(filepath, self._ensure_state(), step=step)

    def find_last(self):
        """Newest checkpoint in model_dir (model.py:2073-2100)."""
        dir_names = [d for d in sorted(os.listdir(self.model_dir))
                     if d.startswith((self.config.NAME or "").lower())]
        for d in reversed(dir_names):
            ckpt = os.path.join(self.model_dir, d, "checkpoints")
            if latest_step(ckpt) is not None:
                return ckpt
        ckpt = os.path.join(self.log_dir, "checkpoints")
        if latest_step(ckpt) is not None:
            return ckpt
        raise FileNotFoundError(
            f"Could not find weight files in {self.model_dir}")

    def set_log_dir(self, model_path=None):
        """Epoch/timestamp bookkeeping (model.py:2245-2281). With Orbax the
        epoch is the checkpoint step; model_path may name a checkpoint dir
        whose latest step resumes the count."""
        self.epoch = 0
        now = datetime.datetime.now()
        if model_path is not None:
            step = latest_step(model_path)
            if step is not None:
                self.epoch = int(step)
        name = (self.config.NAME or "maskrcnn").lower()
        self.log_dir = os.path.join(
            self.model_dir, "{}{:%Y%m%dT%H%M}".format(name, now))
        self.checkpoint_dir = os.path.join(self.log_dir, "checkpoints")

    # ------------------------------------------------------------------ #
    # molding
    # ------------------------------------------------------------------ #
    def mold_inputs(self, images):
        """images: list of [H, W, 3] uint8. Returns (molded [N, h, w, 3],
        metas [N, META], windows [N, 4]) (model.py:2666-2696)."""
        molded_images, image_metas, windows = [], [], []
        for image in images:
            molded_image, window, scale, padding, crop = resize_image(
                image,
                min_dim=self.config.IMAGE_MIN_DIM,
                min_scale=self.config.IMAGE_MIN_SCALE,
                max_dim=self.config.IMAGE_MAX_DIM,
                mode=self.config.IMAGE_RESIZE_MODE)
            image_meta = compose_image_meta(
                0, image.shape, molded_image.shape, window, scale,
                np.zeros([self.config.NUM_CLASSES], dtype=np.int32))
            molded_images.append(molded_image)
            image_metas.append(image_meta)
            windows.append(window)
        # The uint8 fast path (raw resized pixels; device graph de-molds,
        # 4x fewer bytes per request) is a WHOLE-BATCH decision: the
        # device keys de-molding on the batch dtype, so a float input in
        # the list (post-augmentation etc.) would otherwise stack into a
        # float batch carrying raw 0-255 pixels straight to the network.
        uint8_ok = (getattr(self.config, "UINT8_IMAGE_TRANSFER", False)
                    and all(m.dtype == np.uint8 for m in molded_images))
        if not uint8_ok:
            molded_images = [mold_image(m, self.config.MEAN_PIXEL)
                             for m in molded_images]
        return (np.stack(molded_images), np.stack(image_metas),
                np.stack(windows))

    def unmold_detections(self, detections, mrcnn_mask, original_image_shape,
                          image_shape, window):
        """Device outputs -> pixel-space results (model.py:2954-3017)."""
        zero_ix = np.where(detections[:, 4] == 0)[0]
        n = zero_ix[0] if zero_ix.shape[0] > 0 else detections.shape[0]

        boxes = detections[:n, :4]
        class_ids = detections[:n, 4].astype(np.int32)
        scores = detections[:n, 5]
        masks = mrcnn_mask[np.arange(n), :, :, class_ids]

        window_n = norm_boxes_np(np.asarray(window, np.float32),
                                 image_shape[:2])
        wy1, wx1, wy2, wx2 = window_n
        shift = np.array([wy1, wx1, wy1, wx1])
        wh = wy2 - wy1
        ww = wx2 - wx1
        scale = np.array([wh, ww, wh, ww])
        boxes = np.divide(boxes - shift, scale)
        boxes = denorm_boxes_np(boxes, original_image_shape[:2])

        exclude_ix = np.where(
            (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) <= 0)[0]
        if exclude_ix.shape[0] > 0:
            boxes = np.delete(boxes, exclude_ix, axis=0)
            class_ids = np.delete(class_ids, exclude_ix, axis=0)
            scores = np.delete(scores, exclude_ix, axis=0)
            masks = np.delete(masks, exclude_ix, axis=0)
            n = class_ids.shape[0]

        full_masks = []
        for i in range(n):
            full_mask = unmold_mask(masks[i], boxes[i], original_image_shape)
            full_masks.append(full_mask)
        full_masks = (np.stack(full_masks, axis=-1) if full_masks
                      else np.empty(original_image_shape[:2] + (0,)))
        return boxes, class_ids, scores, full_masks

    def get_anchors(self, image_shape):
        return get_anchors(self.config, image_shape)

    # ------------------------------------------------------------------ #
    # inference
    # ------------------------------------------------------------------ #
    def detect(self, images, Rcam=None, Kmat=None, depths=None, verbose=0):
        """Run detection. For multi-view, each element of `images` is a
        [V, H, W, 3] stack whose first view is the main view; Rcam [B,V,3,4],
        Kmat [B,3,3] (model_multi.py:3019-3082). Returns list of dicts with
        rois/class_ids/scores/masks."""
        cfg = self.config
        state = self._ensure_state()
        if self._infer_step is None:
            self._infer_step = make_eval_step(cfg)

        multiview = cfg.NUM_VIEWS > 1
        batch_images = []
        metas = None
        windows = None
        for item in images:
            views = np.asarray(item)
            if views.ndim == 3:
                views = views[None]
            molded, m, win = self.mold_inputs(list(views))
            batch_images.append(molded)
            if metas is None:
                metas, windows = m[:1], win[:1]
            else:
                metas = np.concatenate([metas, m[:1]])
                windows = np.concatenate([windows, win[:1]])
        molded = np.stack(batch_images)  # [B, V, h, w, 3]
        b, v = molded.shape[:2]
        hw = molded.shape[2]

        batch = {
            "images": (molded if molded.dtype == np.uint8
                       else molded.astype(np.float32)),
            "image_meta": metas.astype(np.float32),
            "anchors": self.get_anchors(molded.shape[2:]).astype(np.float32),
        }
        if multiview:
            batch["Rcam"] = np.asarray(Rcam, np.float32)
            batch["Kmat"] = np.asarray(Kmat, np.float32)
        else:
            batch["Rcam"] = np.tile(np.eye(3, 4, dtype=np.float32),
                                    (b, v, 1, 1))
            batch["Kmat"] = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
        if cfg.TRANSFORMER:
            batch["depths"] = np.asarray(depths, np.float32)

        outputs = self._infer_step(self._maybe_fold(state), batch)
        detections = np.asarray(outputs["detections"])
        mrcnn_masks = np.asarray(outputs["mrcnn_masks"])

        results = []
        for i, item in enumerate(images):
            views = np.asarray(item)
            if views.ndim == 3:
                views = views[None]
            original_shape = views[0].shape
            final_rois, final_class_ids, final_scores, final_masks = \
                self.unmold_detections(detections[i], mrcnn_masks[i],
                                       original_shape, molded.shape[2:5],
                                       windows[i])
            results.append({
                "rois": final_rois,
                "class_ids": final_class_ids,
                "scores": final_scores,
                "masks": final_masks,
            })
        return results

    def detect_molded(self, molded_images, image_metas, Rcam=None,
                      Kmat=None, depths=None):
        """Run detection on already-molded inputs (model.py:2547-2608).
        molded_images: [B, V, h, w, 3] (or [B, h, w, 3] single-view)."""
        cfg = self.config
        state = self._ensure_state()
        if self._infer_step is None:
            self._infer_step = make_eval_step(cfg)
        molded = np.asarray(molded_images, np.float32)
        if molded.ndim == 4:
            molded = molded[:, None]
        b, v = molded.shape[:2]
        batch = {
            "images": molded,
            "image_meta": np.asarray(image_metas, np.float32),
            "anchors": self.get_anchors(molded.shape[2:]).astype(np.float32),
            "Rcam": (np.asarray(Rcam, np.float32) if Rcam is not None else
                     np.tile(np.eye(3, 4, dtype=np.float32), (b, v, 1, 1))),
            "Kmat": (np.asarray(Kmat, np.float32) if Kmat is not None else
                     np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))),
        }
        if cfg.TRANSFORMER:
            batch["depths"] = np.asarray(depths, np.float32)
        outputs = self._infer_step(self._maybe_fold(state), batch)
        detections = np.asarray(outputs["detections"])
        mrcnn_masks = np.asarray(outputs["mrcnn_masks"])
        results = []
        metas = np.asarray(image_metas)
        for i in range(b):
            original_shape = metas[i, 1:4].astype(int)
            window = metas[i, 7:11].astype(int)
            rois, class_ids, scores, masks = self.unmold_detections(
                detections[i], mrcnn_masks[i], tuple(original_shape),
                molded.shape[2:5], window)
            results.append({"rois": rois, "class_ids": class_ids,
                            "scores": scores, "masks": masks})
        return results

    def run_graph(self, images, outputs=None, Rcam=None, Kmat=None,
                  depths=None):
        """Partial-graph debugger (model_multi.py:3213-3271): run inference
        and return the named intermediate tensors. `outputs` is a list of
        keys from the model's output dict (e.g. 'proposals', 'rpn_probs',
        'detections'); None returns everything."""
        cfg = self.config
        state = self._ensure_state()
        if self._infer_step is None:
            self._infer_step = make_eval_step(cfg)
        batch_images = []
        metas = None
        for item in images:
            views = np.asarray(item)
            if views.ndim == 3:
                views = views[None]
            molded, m, _ = self.mold_inputs(list(views))
            batch_images.append(molded)
            metas = m[:1] if metas is None else np.concatenate([metas, m[:1]])
        molded = np.stack(batch_images)
        b, v = molded.shape[:2]
        batch = {
            "images": (molded if molded.dtype == np.uint8
                       else molded.astype(np.float32)),
            "image_meta": metas.astype(np.float32),
            "anchors": self.get_anchors(molded.shape[2:]).astype(np.float32),
            "Rcam": (np.asarray(Rcam, np.float32) if Rcam is not None else
                     np.tile(np.eye(3, 4, dtype=np.float32), (b, v, 1, 1))),
            "Kmat": (np.asarray(Kmat, np.float32) if Kmat is not None else
                     np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))),
        }
        if cfg.TRANSFORMER:
            batch["depths"] = np.asarray(depths, np.float32)
        result = self._infer_step(self._maybe_fold(state), batch)
        result = {k: np.asarray(v_) for k, v_ in result.items()}
        if outputs is not None:
            result = {k: result[k] for k in outputs}
        return result

    def ancestor(self, pattern, images=None, **kwargs):
        """Regex search over the inference graph's named intermediate
        outputs (the reference's `ancestor()` graph search,
        model_multi.py:3164-3190, reformulated for a functional graph:
        names are output-dict keys rather than TF tensor names). With
        images given, returns a DICT {name: array} for every key matching
        `pattern`; with images=None, returns a LIST of the matching names
        (no compute happens, so there are no arrays to key on)."""
        import re as _re

        rx = _re.compile(pattern)
        if images is None:
            names = ["rpn_class_logits", "rpn_probs", "rpn_bbox",
                     "proposals", "mrcnn_class_logits", "mrcnn_probs",
                     "mrcnn_bbox", "detections", "mrcnn_masks"]
            if getattr(self.config, "EXPOSE_FUSED_PYRAMID", False):
                names[4:4] = ["fused_p2", "fused_p3", "fused_p4",
                              "fused_p5"]
            return [n for n in names if rx.search(n)]
        result = self.run_graph(images, outputs=None, **kwargs)
        return {k: v for k, v in result.items() if rx.search(k)}

    def get_imagenet_weights(self):
        """The reference downloads keras ImageNet ResNet weights
        (model.py:2644-2656). This build environment has no egress; point
        load_weights at a local h5/checkpoint instead."""
        raise NotImplementedError(
            "No network egress in this environment. Download the Matterport "
            "COCO h5 or keras ResNet ImageNet h5 elsewhere and use "
            "utils.h5_import.load_h5_weights / MaskRCNN.load_weights.")

    # ------------------------------------------------------------------ #
    # training
    # ------------------------------------------------------------------ #
    def train(self, train_dataset, val_dataset, learning_rate, epochs,
              layers, custom_callbacks=None, augmentation=None,
              prefetch_threads=4, save_every_epochs=50):
        """Stage-wise training loop (model_multi.py:2785-2912): `layers` is
        'heads'|'grid+'|'grid+-'|'grid_only'|'3+'|'4+'|'5+'|'all' or a path
        regex; `epochs` is the TOTAL epoch target (continues from
        self.epoch).

        Each call re-creates the optimizer at `learning_rate` and RESETS
        momentum — matching the reference, where every train() stage calls
        keras compile() afresh (model_multi.py:2843-2850), so the stage-3
        LEARNING_RATE/10 fine-tune really runs 10x slower.

        After every epoch, `VALIDATION_STEPS` batches from `val_dataset`
        are scored with the same loss graph (no update) and reported as
        val_* metrics (model_multi.py:2901-2912).

        `augmentation` is a callable (image, mask, rng) -> (image, mask);
        see data.augment (e.g. data.augment.Fliplr(0.5)).
        """
        assert self.mode == "training", "Create model in training mode."
        cfg = self.config
        state = self._ensure_state()
        from ..train.optim import make_optimizer
        tx = make_optimizer(learning_rate, cfg.LEARNING_MOMENTUM,
                            cfg.GRADIENT_CLIP_NORM)
        state = state.replace(tx=tx, opt_state=tx.init(state.params))
        train_step = make_train_step(cfg, stage=layers)
        val_step = make_val_step(cfg) if val_dataset is not None else None

        # multi-host data parallelism: each process loads its share of the
        # global batch; params replicate over the global mesh and GSPMD
        # inserts the gradient all-reduce (call parallel.mesh.
        # init_distributed before constructing the engine).
        nproc = jax.process_count()
        local_bs = cfg.BATCH_SIZE
        globalize = lambda b: b  # noqa: E731
        if nproc > 1:
            from ..parallel.mesh import (batch_sharding, globalize_batch,
                                         make_mesh, replicated)
            assert cfg.BATCH_SIZE % nproc == 0, \
                f"BATCH_SIZE {cfg.BATCH_SIZE} not divisible by " \
                f"{nproc} processes"
            local_bs = cfg.BATCH_SIZE // nproc
            mesh = make_mesh()
            shardings = batch_sharding(mesh)
            state = jax.device_put(state, replicated(mesh))
            globalize = lambda b: globalize_batch(b, shardings)  # noqa: E731

        with_depth = bool(cfg.TRANSFORMER)
        # decorrelate per-host loading; keep the step rng host-identical
        host_off = jax.process_index() * 1000003
        prefetcher = BatchPrefetcher(
            lambda seed: make_batch(train_dataset, cfg,
                                    rnd_state=seed + host_off,
                                    with_depth=with_depth,
                                    augmentation=augmentation,
                                    batch_size=local_bs),
            num_threads=prefetch_threads)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        # per-epoch scalars -> TensorBoard event file + JSONL, matching the
        # reference's TensorBoard callback (model.py:2346-2348)
        from ..utils.logging_utils import MetricsLogger, TBEventWriter
        jsonl = MetricsLogger(self.log_dir)
        tb = TBEventWriter(self.log_dir)
        try:
            for epoch in range(self.epoch, epochs):
                metrics_acc = {}
                for _ in range(cfg.STEPS_PER_EPOCH):
                    batch = globalize(next(prefetcher))
                    self._rng, step_rng = jax.random.split(self._rng)
                    state, metrics = train_step(state, batch, step_rng)
                    for k_, v_ in metrics.items():
                        metrics_acc.setdefault(k_, []).append(float(v_))
                means = {k_: float(np.mean(v_))
                         for k_, v_ in metrics_acc.items()}
                if val_step is not None:
                    val_acc = {}
                    for vstep in range(cfg.VALIDATION_STEPS):
                        vbatch = globalize(make_batch(
                            val_dataset, cfg,
                            rnd_state=epoch * 10007 + vstep + host_off,
                            with_depth=with_depth, batch_size=local_bs))
                        self._rng, vrng = jax.random.split(self._rng)
                        vmetrics = val_step(state, vbatch, vrng)
                        for k_, v_ in vmetrics.items():
                            val_acc.setdefault(k_, []).append(float(v_))
                    means.update({f"val_{k_}": float(np.mean(v_))
                                  for k_, v_ in val_acc.items()})
                log.info("epoch %d: %s", epoch + 1, means)
                print(f"epoch {epoch + 1}: " + " ".join(
                    f"{k_}={v_:.4f}" for k_, v_ in sorted(means.items())))
                jsonl.log(epoch + 1, **means)
                tb.add_scalars(epoch + 1, means)
                if (epoch + 1) % save_every_epochs == 0 or epoch + 1 == epochs:
                    self._state = state
                    save_checkpoint(self.checkpoint_dir, state,
                                    step=epoch + 1)
                if custom_callbacks:
                    for cb in custom_callbacks:
                        cb(epoch + 1, means)
        finally:
            prefetcher.close()
            jsonl.close()
            tb.close()
        self._state = state
        self.epoch = max(self.epoch, epochs)


def compute_backbone_shapes(config, image_shape):
    from ..ops.anchors import compute_backbone_shapes as f
    return f(config, image_shape)
