"""Device mesh + sharding utilities (SPMD over jax.sharding.Mesh)."""

from coot_videotext_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, get_mesh, replicated_sharding, shard_params)
