from dana_tpu.engine import optim, train  # noqa: F401
