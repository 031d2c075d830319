from dana_tpu.core.boxes import (
    encode_boxes,
    decode_boxes,
    clip_boxes,
    iou_matrix,
    iou_matrix_masked,
)
from dana_tpu.core.anchors import generate_anchors, shifted_anchors

__all__ = [
    'encode_boxes', 'decode_boxes', 'clip_boxes', 'iou_matrix',
    'iou_matrix_masked', 'generate_anchors', 'shifted_anchors',
]
