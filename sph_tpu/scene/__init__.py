from .scene import Scene
from .worm import (
    generate_worm_scene,
    generate_liquid_box_scene,
    generate_multi_worm_scene,
    generate_multi_worm_params,
)
from . import io

__all__ = [
    "Scene",
    "generate_worm_scene",
    "generate_liquid_box_scene",
    "generate_multi_worm_scene",
    "generate_multi_worm_params",
    "io",
]
