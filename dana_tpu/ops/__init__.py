from dana_tpu.ops.nms import nms_fixed, batched_nms_fixed
from dana_tpu.ops.roi_align import roi_align
from dana_tpu.ops.roi_pool import roi_pool

__all__ = ['nms_fixed', 'batched_nms_fixed', 'roi_align', 'roi_pool']
