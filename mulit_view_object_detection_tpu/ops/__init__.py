from . import anchors, boxes, detection, image_meta, nms, proposals, roi_align, targets  # noqa: F401
