"""dana_tpu — TPU-native (JAX/XLA/Pallas) few-shot object detection framework.

A ground-up rebuild of the capabilities of
Tung-I/Dual-awareness-Attention-for-Few-shot-Object-Detection (DAnA few-shot
Faster R-CNN) designed for TPU hardware:

* static episodic shapes end-to-end (padded boxes + validity masks),
* NHWC feature layout, bf16 matmuls on the MXU,
* proposal selection / NMS / RoIAlign as XLA-friendly fixed-shape ops,
* the CISA dual-awareness attention as batched einsums (fused by XLA,
  Pallas kernels for the hot paths),
* data-parallel scaling via jax.sharding.Mesh + jit (ICI collectives),
  not host-side replicate/gather.

Layer map (mirrors SURVEY.md §1 of the reference):
  core/       box math + anchors               (ref lib/model/rpn/bbox_transform.py)
  ops/        nms, roi_align, roi_pool         (ref lib/model/csrc/*)
  models/     backbones, rpn, target layers, 5 detector frameworks
  data/       datasets, episodic loaders, COCO eval
  parallel/   mesh + sharded train/predict steps
  utils/      config, checkpoints, logging
"""

__version__ = "0.1.0"
