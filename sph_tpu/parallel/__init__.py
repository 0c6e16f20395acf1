from .mesh import make_mesh, pad_scene_to_devices
from .sharded import make_sharded_step, shard_state

__all__ = [
    "make_mesh",
    "pad_scene_to_devices",
    "make_sharded_step",
    "shard_state",
]
