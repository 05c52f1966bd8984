from . import boxes, losses, nms, roi_align, rotated, masks  # noqa: F401
