from dana_tpu.data import blob, coco_json, factory, fs_loader, imdb  # noqa: F401
