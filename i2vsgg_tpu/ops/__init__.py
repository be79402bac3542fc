from i2vsgg_tpu.ops import boxes, anchors, nms, roi_align, roi_pool  # noqa: F401
