from dana_tpu.eval import coco_eval  # noqa: F401
