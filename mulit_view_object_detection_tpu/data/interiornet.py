"""InteriorNet dataset loader (HD1 sequential / HD7 non-sequential).

Re-implements InteriorDataset (samples/interior/interior_multi.py:83-328)
without pycocotools (the per-scene `cocolabel.json` is parsed directly —
only image listings are used from it; masks come from the
`<frame>_instance.png` + `<frame>_nyu.png` label pairs).

Layout expectations (reference README + loader):
  <root>/<subset>/<scene>/cocolabel.json                (HD7)
  <root>/<subset>/<scene>/original_1_1/cocolabel.json   (HD1)
  <root>/<subset>/<scene>/[original_1_1/]label0/data/<frame>_instance.png
  <root>/<subset>/<scene>/[original_1_1/]label0/data/<frame>_nyu.png
  <root>/<subset>/<scene>/depth0/data/<frame>.png
  <root>/<subset>/<scene>/cam0.render                   (HD7 poses)
  <root>/<subset>/<scene>/velocity_angular_1_1/cam0_gt.visim  (HD1 poses)
  <root>/<subset>/view_mapping[_seq].json

Hardcoded InteriorNet intrinsics K = [[600,0,320],[0,600,320],[0,0,1]]
(interior_multi.py:150-156).
"""

from __future__ import annotations

import csv
import glob
import json
import os

import numpy as np

from ..utils.pose import quat2rot, vec2rot
from .classes import NYU40_TO_SELECTED, SELECTED_CLASSES
from .dataset import Dataset
from .molding import resize_image

INTERIORNET_K = np.array([[600.0, 0, 320], [0, 600, 320], [0, 0, 1]])


class InteriorNetDataset(Dataset):
    """Multi-view InteriorNet dataset."""

    def load_interiornet(self, dataset_dir, subset,
                         nyu40_to_sel_map=None, selected_classes=None,
                         class_ids=None):
        nyu40_to_sel_map = nyu40_to_sel_map or NYU40_TO_SELECTED
        selected_classes = selected_classes or SELECTED_CLASSES
        _, hd_folder = os.path.split(dataset_dir.rstrip("/"))
        self.hd_folder = hd_folder
        dataset_dir = os.path.join(dataset_dir, subset)
        self.dataset_dir = dataset_dir
        self.NYU40_to_sel_map = nyu40_to_sel_map
        self.K = INTERIORNET_K.copy()

        is_hd7 = hd_folder == "HD7"
        self.label_path = ("label0/data" if is_hd7
                          else "original_1_1/label0/data")
        view_map_name = ("view_mapping.json" if is_hd7
                         else "view_mapping_seq.json")
        vm_path = os.path.join(dataset_dir, view_map_name)
        self.view_map = {}
        if os.path.exists(vm_path):
            with open(vm_path) as f:
                self.view_map = json.load(f)

        for i in range(1, len(selected_classes)):
            self.add_class("interior", i, selected_classes[i])

        for scene_dir in sorted(glob.glob(os.path.join(dataset_dir, "*"))):
            if scene_dir.endswith(".json") or not os.path.isdir(scene_dir):
                continue
            add_path = "" if is_hd7 else "original_1_1"
            coco_path = os.path.join(scene_dir, add_path, "cocolabel.json")
            if not os.path.exists(coco_path):
                continue
            with open(coco_path) as f:
                coco = json.load(f)
            scene = os.path.split(scene_dir)[1]
            time_to_pose = self._load_poses(scene_dir, is_hd7)
            for img in coco.get("images", []):
                image_name = os.path.split(img["file_name"])[1][:-4]
                uid = scene + "_id" + image_name
                timestamp = int(img["timestamp"])
                if timestamp not in time_to_pose:
                    continue
                R = self._pose_to_R(time_to_pose[timestamp], is_hd7)
                self.add_image(
                    "interior", image_id=uid,
                    image_sub_id=image_name,
                    path=os.path.join(scene_dir, add_path, img["file_name"]),
                    width=img["width"], height=img["height"],
                    subfolder=scene, R=R)

    @staticmethod
    def _load_poses(scene_dir, is_hd7):
        """timestamp -> raw pose row (interior_multi.py:158-192)."""
        time_to_pose = {}
        if is_hd7:
            path = os.path.join(scene_dir, "cam0.render")
            if not os.path.exists(path):
                return time_to_pose
            with open(path) as f:
                reader = csv.reader(f, delimiter=" ")
                for _ in range(3):
                    next(reader, None)
                for row in reader:
                    if row:
                        time_to_pose[int(row[0])] = row[1:]
        else:
            path = os.path.join(scene_dir, "velocity_angular_1_1",
                                "cam0_gt.visim")
            if not os.path.exists(path):
                return time_to_pose
            with open(path) as f:
                reader = csv.reader(f, delimiter=",")
                next(reader, None)
                for row in reader:
                    if row:
                        time_to_pose[int(row[0])] = row[1:]
        return time_to_pose

    @staticmethod
    def _pose_to_R(row, is_hd7):
        """Raw pose row -> [R|t] 3x4 cam->world (interior_multi.py:188-192).

        HD7 translation: the reference uses `vec[1:4]` (interior_multi.py:192)
        on the SAME timestamp-stripped row whose eye position its own
        vec2rot reads as `vec[0:3]` — i.e. it stores (eye_y, eye_z,
        lookat_x) as the camera center, a provable off-by-one that
        garbles every HD7 camera pose. Fixed here: the camera center is
        the eye, vals[0:3] (rotation is unchanged — the reference's was
        already consistent with vals[0:3])."""
        vals = [float(x) for x in row]
        if is_hd7:
            return np.concatenate(
                [vec2rot(np.array(vals)),
                 np.array(vals[0:3]).reshape(3, 1)], axis=1)
        x, y, z, qw, qx, qy, qz = vals[:7]
        return np.concatenate(
            [quat2rot([qw, qx, qy, qz]), np.array([[x], [y], [z]])], axis=1)

    def image_reference(self, image_id):
        return self.image_info[image_id]["path"]

    def load_mask(self, image_id):
        """Masks from <frame>_instance.png + <frame>_nyu.png
        (interior_multi.py:218-268)."""
        import imageio.v2 as imageio

        from .native import extract_instances
        info = self.image_info[image_id]
        base = os.path.join(self.dataset_dir, info["subfolder"],
                            self.label_path, str(info["image_sub_id"]))
        instance_im = np.asarray(imageio.imread(base + "_instance.png"))
        nyu_im = np.asarray(imageio.imread(base + "_nyu.png"))
        # one-pass C++ extraction (native/maskops.cpp); numpy fallback inside
        masks, class_ids, _ = extract_instances(
            instance_im, nyu_im, self.NYU40_to_sel_map)
        if len(class_ids):
            return np.transpose(masks, (1, 2, 0)), class_ids
        return super().load_mask(image_id)

    def load_depth(self, image_id, config):
        """Depth map resized to the transformer token grid
        (interior_multi.py:271-284)."""
        import imageio.v2 as imageio
        info = self.image_info[image_id]
        depth_path = os.path.join(self.dataset_dir, info["subfolder"],
                                  "depth0/data",
                                  str(info["image_sub_id"]) + ".png")
        depth_image = np.asarray(imageio.imread(depth_path))[:, :, None]
        ds = int(config.IMAGE_SHAPE[0]) // config.BACKBONE_STRIDES[3]
        depth_image, _, _, _, _ = resize_image(
            depth_image, min_dim=ds, min_scale=config.IMAGE_MIN_SCALE,
            max_dim=ds, mode=config.IMAGE_RESIZE_MODE)
        return depth_image[:, :, 0]

    def load_R(self, image_id):
        return self.image_info[image_id]["R"]

    def load_view(self, n, main_image, rnd_state=None):
        """Pick n view ids (main first): HD1 = stride-5 temporal neighbors,
        HD7 = random among >=5 co-visible views (interior_multi.py:294-328).
        Returns None when the sample can't supply n views (sparse-view
        samples are skipped, model_multi.py:2143-2146) — callers must not
        get a SHORT list, which would crash batch stacking downstream."""
        max_views = 5
        rnd = np.random.RandomState(rnd_state)
        if self.hd_folder != "HD7":
            num_skip = 5
            secondary = np.asarray(self.view_map[main_image])
            image_ids = secondary[::-1][num_skip:n * num_skip:num_skip]
            if image_ids.shape[0] < n - 1:   # scene shorter than the stride
                return None
            out = [self.image_from_source_map["interior." + main_image]]
            for iid in image_ids:
                out.append(self.image_from_source_map["interior." + iid])
            return out
        secondary = np.asarray(self.view_map[main_image])
        # the reference draws max_views-1 = 4 candidates and slices [:n-1],
        # silently capping NUM_VIEWS > 5 at five views; here the draw
        # grows with n (identical random stream for n <= 5)
        if secondary.shape[0] < max(max_views, n - 1):
            return None
        views = rnd.choice(range(secondary.shape[0]),
                           max(max_views - 1, n - 1), replace=False)
        image_ids = secondary[views][:n - 1]
        out = [self.image_from_source_map["interior." + main_image]]
        for iid in image_ids:
            out.append(self.image_from_source_map["interior." + iid])
        return out
