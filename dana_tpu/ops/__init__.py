from dana_tpu.ops.nms import batched_nms_fixed, nms_fixed, nms_fixed_tiled  # noqa: F401
from dana_tpu.ops.roi_align import roi_align  # noqa: F401
from dana_tpu.ops.roi_pool import roi_pool  # noqa: F401
from dana_tpu.ops.grid_sample import grid_sample, roi_crop_pool  # noqa: F401
from dana_tpu.ops import cisa_attention  # noqa: F401
