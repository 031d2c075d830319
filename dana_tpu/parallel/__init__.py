"""Device-mesh parallelism utilities.

The reference's only parallelism is single-process nn.DataParallel
(train.py:104-105).  Here scaling is expressed the TPU way: a
jax.sharding.Mesh, batch sharded over the 'data' axis, params/optimizer
replicated, XLA inserting the gradient all-reduce over ICI.  The jitted
step functions themselves live in dana_tpu.engine.train; this module owns
mesh construction and placement helpers and is the stable public surface.
"""

from dana_tpu.engine.train import (make_mesh, replicate,  # noqa: F401
                                   shard_batch)

__all__ = ['make_mesh', 'replicate', 'shard_batch']
