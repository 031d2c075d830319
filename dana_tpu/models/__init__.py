from dana_tpu.models import dana, layers, losses, resnet, rpn  # noqa: F401
