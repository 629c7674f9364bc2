"""Device-mesh parallelism: sharding rules and distributed train/serve."""

from vocalie_tts_tpu.parallel.mesh import (
    make_mesh,
    transformer_param_sharding,
)

__all__ = ["make_mesh", "transformer_param_sharding"]
