"""Synthetic multi-view scenes for tests and benchmarks.

The reference has no test assets (SURVEY.md §4); this module provides
fixed-seed procedurally generated scenes: colored 3D billboards at known
positions, rendered into V views with known camera poses/intrinsics via
true pinhole projection — so the projective geometry ops see real,
consistent multi-view data and end-to-end smoke training has learnable
signal.
"""

from __future__ import annotations

import numpy as np

from ..utils.pose import look_at_extrinsics
from .dataset import Dataset

_COLORS = np.array([
    [200, 60, 60], [60, 200, 60], [60, 60, 200], [200, 200, 60],
    [200, 60, 200], [60, 200, 200],
], dtype=np.uint8)


class SyntheticScene:
    """A set of 3D billboards + V cameras around the origin-ish."""

    def __init__(self, rng, num_objects=3, num_views=2, image_size=64,
                 num_classes=4, focal=None, obj_px_range=None):
        self.image_size = image_size
        self.num_classes = num_classes
        f = focal or image_size
        c = image_size / 2.0
        self.K = np.array([[f, 0, c], [0, f, c], [0, 0, 1]], np.float64)
        # objects in the MAIN camera's viewing volume: x,y in [-1,1], z in [3,6]
        if obj_px_range is None:
            # legacy draw ORDER preserved (x, y, z, half): same-seed scenes
            # must stay identical to earlier rounds' runs/checkpoints
            cx = rng.uniform(-1.0, 1.0, num_objects)
            cy = rng.uniform(-1.0, 1.0, num_objects)
            z = rng.uniform(3.0, 6.0, num_objects)
            half = rng.uniform(0.3, 0.6, num_objects)
        else:
            z = rng.uniform(3.0, 6.0, num_objects)
            # Target an on-screen size in PIXELS so the scene exercises a
            # chosen ROI-routing regime (ops/roi_align.py::roi_levels):
            # Mask R-CNN routes a box of side s px to P4 iff s >~ 224/sqrt(2)
            # and to P5 iff s >~ 224*sqrt(2) at 640^2.  The flagship protocol
            # zeroes the fused P2/P3 maps (Config.ZERO_PG_LEVELS, matching
            # model_multi.py's memory cap), so quality runs at the
            # reference's 640^2 geometry need P4/P5-scale objects — exactly
            # the furniture-scale content of InteriorNet itself.
            lo, hi = obj_px_range
            px = rng.uniform(lo, hi, num_objects)
            half = px * z / (2.0 * f)           # size_px = 2*half*f/z
            # keep centers fully in frame (half-frame at depth z is c*z/f)
            # AND inside the voxel volume (|x|,|y| <= ~2, see train_to_ap's
            # vmin/vmax) so the fusion grid actually covers the objects
            m = np.clip(np.minimum((c / f) * z - half, 2.0 - half),
                        0.05, None)
            cx = rng.uniform(-1.0, 1.0, num_objects) * m
            cy = rng.uniform(-1.0, 1.0, num_objects) * m
        self.centers = np.stack([cx, cy, z], axis=1)
        self.half_sizes = half
        self.class_ids = rng.randint(1, num_classes, num_objects)
        self.colors = _COLORS[rng.randint(0, len(_COLORS), num_objects)]

        # cameras: view 0 at origin looking +z; others jittered around it
        self.poses = []  # cam->world [3, 4]
        for vi in range(num_views):
            if vi == 0:
                eye = np.zeros(3)
            else:
                eye = rng.uniform(-0.6, 0.6, 3) * np.array([1, 1, 0.3])
            w2c = look_at_extrinsics(eye, np.array([0.0, 0.0, 4.5]))
            R = w2c[:, :3]
            t = w2c[:, 3]
            # invert world->cam to cam->world
            pose = np.concatenate([R.T, (-R.T @ t)[:, None]], axis=1)
            self.poses.append(pose)
        self.poses = np.stack(self.poses)  # [V, 3, 4]

    def regenerate_poses(self, rng, jitter_main=True):
        """Replace ALL camera poses with fresh draws from `rng`, keeping
        the scene content (objects, classes, colors) identical. Used for
        held-out-VIEWPOINT evaluation (VERDICT r4 #1): the model trains
        on this scene's original cameras and is evaluated on novel ones.
        The main view is jittered too (smaller radius, so the scene stays
        framed) — GT is re-rendered from the new main view, so it remains
        exact. Clears the render memo."""
        poses = []
        for vi in range(len(self.poses)):
            if vi == 0 and not jitter_main:
                eye = np.zeros(3)
            elif vi == 0:
                eye = rng.uniform(-0.3, 0.3, 3) * np.array([1, 1, 0.3])
            else:
                eye = rng.uniform(-0.6, 0.6, 3) * np.array([1, 1, 0.3])
            w2c = look_at_extrinsics(eye, np.array([0.0, 0.0, 4.5]))
            R, t = w2c[:, :3], w2c[:, 3]
            poses.append(
                np.concatenate([R.T, (-R.T @ t)[:, None]], axis=1))
        self.poses = np.stack(poses)
        self._render_cache = {}

    def render(self, view):
        """Render view -> (image uint8 [S,S,3], masks [S,S,N], depth [S,S]).

        Scenes are static, so renders are memoized per view — load_image /
        load_mask / load_depth each hit this and would otherwise re-render
        the same frame three times per sample."""
        cached = getattr(self, "_render_cache", None)
        if cached is None:
            cached = self._render_cache = {}
        if view not in cached:
            cached[view] = self._render(view)
        return cached[view]

    def _render(self, view):
        s = self.image_size
        image = np.full((s, s, 3), 30, np.uint8)
        masks = np.zeros((s, s, len(self.centers)), bool)
        depth = np.full((s, s), 50.0, np.float32)
        pose = self.poses[view]
        R, t = pose[:, :3], pose[:, 3]
        # world->cam
        Rw, tw = R.T, -R.T @ t
        order = np.argsort(-self.centers[:, 2])  # far to near
        for oi in order:
            cpos = Rw @ self.centers[oi] + tw
            if cpos[2] <= 0.1:
                continue
            r = self.half_sizes[oi]
            # billboard corners facing the camera
            u0 = self.K @ (cpos + np.array([-r, -r, 0.0]))
            u1 = self.K @ (cpos + np.array([r, r, 0.0]))
            x0, y0 = int(round(u0[0] / u0[2])), int(round(u0[1] / u0[2]))
            x1, y1 = int(round(u1[0] / u1[2])), int(round(u1[1] / u1[2]))
            x0, x1 = sorted((x0, x1))
            y0, y1 = sorted((y0, y1))
            x0c, x1c = max(0, x0), min(s, x1)
            y0c, y1c = max(0, y0), min(s, y1)
            if x1c <= x0c or y1c <= y0c:
                continue
            image[y0c:y1c, x0c:x1c] = self.colors[oi]
            masks[:, :, oi] = False
            masks[y0c:y1c, x0c:x1c, oi] = True
            depth[y0c:y1c, x0c:x1c] = cpos[2]
        return image, masks, depth


class SyntheticMultiViewDataset(Dataset):
    """Dataset-API wrapper over SyntheticScene (supports load_R/load_depth/
    load_view/view_map like InteriorNetDataset)."""

    def __init__(self, num_scenes=4, num_views=3, image_size=64,
                 num_classes=4, seed=0, obj_px_range=None, view_seed=None):
        """`view_seed`: if given, every scene's cameras are REPLACED with
        fresh poses drawn from RandomState(view_seed + scene_index) after
        construction — same scenes, unseen viewpoints (held-out-viewpoint
        eval). Scene content draws are untouched, so a dataset built with
        the same `seed` has bit-identical objects with or without it."""
        super().__init__()
        self.scenes = []
        self.K = None
        rng = np.random.RandomState(seed)
        for i in range(1, num_classes):
            self.add_class("synthetic", i, f"class{i}")
        self.view_map = {}
        for si in range(num_scenes):
            scene = SyntheticScene(rng, num_objects=3, num_views=num_views,
                                   image_size=image_size,
                                   num_classes=num_classes,
                                   obj_px_range=obj_px_range)
            if view_seed is not None:
                scene.regenerate_poses(
                    np.random.RandomState(view_seed + si))
            self.K = scene.K
            self.scenes.append(scene)
            ids = []
            for vi in range(num_views):
                uid = f"s{si}_v{vi}"
                self.add_image("synthetic", image_id=uid, path=uid,
                               scene=si, view=vi)
                ids.append(uid)
            self.view_map[ids[0]] = ids[1:]
        self.prepare()

    def _scene_view(self, image_id):
        info = self.image_info[image_id]
        return self.scenes[info["scene"]], info["view"]

    def load_image(self, image_id):
        scene, view = self._scene_view(image_id)
        return scene.render(view)[0]

    def load_mask(self, image_id):
        scene, view = self._scene_view(image_id)
        _, masks, _ = scene.render(view)
        keep = masks.any(axis=(0, 1))
        return masks[:, :, keep], scene.class_ids[keep].astype(np.int32)

    def load_depth(self, image_id, config):
        from .molding import resize_image
        scene, view = self._scene_view(image_id)
        depth = scene.render(view)[2][:, :, None]
        # depth rides at P5 resolution (see data.generator.make_sample)
        ds = int(config.IMAGE_SHAPE[0]) // config.BACKBONE_STRIDES[3]
        depth, *_ = resize_image(depth, min_dim=ds, max_dim=ds,
                                 mode="square")
        return depth[:, :, 0]

    def load_R(self, image_id):
        scene, view = self._scene_view(image_id)
        return scene.poses[view].astype(np.float32)

    def load_view(self, n, main_image, rnd_state=None):
        ids = [main_image] + list(self.view_map[main_image])[:n - 1]
        return [self.image_from_source_map["synthetic." + i] for i in ids]
