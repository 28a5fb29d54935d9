"""ctypes bindings for the C++ data-loader hot loops (native/maskops.cpp).

Compiled lazily with g++ on first use; every entry point has a pure-numpy
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile

import numpy as np

log = logging.getLogger(__name__)

_LIB = None
_TRIED = False


def _native_dir():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_native_dir(), "maskops.cpp")
    if not os.path.exists(src):
        return None
    # The build uses -march=native, so a cached .so is only valid on the
    # host ISA that built it (a container image or NFS home carried to a
    # different microarch would SIGILL). Key the cache file by a
    # fingerprint of (source bytes, machine, cpu flags).
    import hashlib
    import platform
    cpu_flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    cpu_flags = line
                    break
    except OSError:
        pass
    with open(src, "rb") as f:
        src_bytes = f.read()
    tag = hashlib.sha256(
        src_bytes + platform.machine().encode() + cpu_flags.encode()
    ).hexdigest()[:16]
    so_path = os.path.join(tempfile.gettempdir(), f"libmaskops-{tag}.so")
    try:
        if not os.path.exists(so_path):
            # -ffp-contract=off: anchor_gt_match's tie detection relies on
            # float32 results matching numpy bit-for-bit (no FMA fusion —
            # min/max/div stay IEEE-exact under -march=native, which is
            # what lets the anchor loops use the host's full vector ISA)
            subprocess.run(
                ["g++", "-O3", "-ffp-contract=off", "-march=native",
                 "-shared", "-fPIC", "-o", so_path, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.extract_instances.restype = ctypes.c_int
        lib.extract_instances.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.extract_bboxes.restype = None
        lib.extract_bboxes.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        lib.anchor_gt_match.restype = None
        lib.anchor_gt_match.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8)]
        _LIB = lib
    except Exception:  # pragma: no cover — toolchain missing
        log.exception("native maskops unavailable; using numpy fallback")
        _LIB = None
    return _LIB


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def extract_instances(instance_im, nyu_im, nyu_map, max_inst=256):
    """One-pass instance mask extraction.

    instance_im: [H, W] int; nyu_im: [H, W] int; nyu_map: dict or [256]
    array mapping NYU class -> selected class (0 = drop).

    Returns (masks [N, H, W] bool, class_ids [N] int32, boxes [N, 4] int32).
    """
    h, w = instance_im.shape
    map_arr = np.zeros(256, np.int32)
    if isinstance(nyu_map, dict):
        for k, v in nyu_map.items():
            if 0 <= int(k) < 256:
                map_arr[int(k)] = v
    else:
        map_arr[:len(nyu_map)] = nyu_map

    lib = _load()
    if lib is not None:
        inst = np.ascontiguousarray(instance_im, np.int32)
        nyu = np.ascontiguousarray(nyu_im, np.int32)
        masks = np.zeros((max_inst, h, w), np.uint8)
        class_ids = np.zeros(max_inst, np.int32)
        boxes = np.zeros((max_inst, 4), np.int32)
        n = lib.extract_instances(
            _ptr(inst, ctypes.c_int32), _ptr(nyu, ctypes.c_int32), h, w,
            _ptr(map_arr, ctypes.c_int32), 256,
            _ptr(masks, ctypes.c_uint8), _ptr(class_ids, ctypes.c_int32),
            _ptr(boxes, ctypes.c_int32), max_inst)
        return masks[:n].astype(bool), class_ids[:n], boxes[:n]

    # numpy fallback (reference semantics, interior_multi.py:242-259)
    masks, class_ids, boxes = [], [], []
    for instance_id in np.unique(instance_im):
        binary = instance_im == instance_id
        nyu_class = int(nyu_im[binary][0])
        cls = int(map_arr[nyu_class]) if nyu_class < 256 else 0
        if cls == 0:
            continue
        ys, xs = np.where(binary)
        masks.append(binary)
        class_ids.append(cls)
        boxes.append([ys.min(), xs.min(), ys.max() + 1, xs.max() + 1])
        if len(masks) >= max_inst:
            break
    if masks:
        return (np.stack(masks), np.array(class_ids, np.int32),
                np.array(boxes, np.int32))
    return (np.zeros((0, h, w), bool), np.zeros(0, np.int32),
            np.zeros((0, 4), np.int32))


def anchor_gt_match(anchors, gt_boxes):
    """Per-anchor best GT + per-GT forced-anchor flags, without the [A, G]
    IoU matrix (native/maskops.cpp::anchor_gt_match).

    anchors: [A, 4] float32, gt_boxes: [G, 4] float32 (both contiguous).
    Returns (best_gt [A] int32, best_iou [A] f32, forced [A] bool), or
    None when the native library is unavailable (caller falls back to the
    numpy matrix path)."""
    lib = _load()
    if lib is None or gt_boxes.shape[0] == 0 or gt_boxes.shape[0] > 256:
        return None
    a = anchors.shape[0]
    anchors = np.ascontiguousarray(anchors, np.float32)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float32)
    best_gt = np.empty(a, np.int32)
    best_iou = np.empty(a, np.float32)
    forced = np.empty(a, np.uint8)
    lib.anchor_gt_match(
        _ptr(anchors, ctypes.c_float), a,
        _ptr(gt_boxes, ctypes.c_float), gt_boxes.shape[0],
        _ptr(best_gt, ctypes.c_int32), _ptr(best_iou, ctypes.c_float),
        _ptr(forced, ctypes.c_uint8))
    return best_gt, best_iou, forced.astype(bool)


def extract_bboxes(masks, layout="HWN"):
    """Tight boxes from bool masks -> [N, 4] int32.

    `layout` is EXPLICIT ('HWN' = reference utils.py:293 convention,
    'NHW' = instance-major): a shape heuristic would misread e.g. 100
    mini-masks of 56x56 passed as [100, 56, 56]."""
    lib = _load()
    if layout == "HWN":
        nhw = np.ascontiguousarray(np.transpose(masks, (2, 0, 1)))
    elif layout == "NHW":
        nhw = np.ascontiguousarray(masks)
    else:
        raise ValueError(f"layout must be 'HWN' or 'NHW', got {layout!r}")
    n, h, w = nhw.shape
    if lib is not None and n:
        m8 = nhw.astype(np.uint8)
        boxes = np.zeros((n, 4), np.int32)
        lib.extract_bboxes(_ptr(m8, ctypes.c_uint8), n, h, w,
                           _ptr(boxes, ctypes.c_int32))
        return boxes
    from ..ops.boxes import extract_bboxes_np
    return extract_bboxes_np(np.transpose(nhw, (1, 2, 0)))
