from .mesh import make_mesh, data_sharding, replicate
from .tiling import tile_image, untile_image, tiled_apply

__all__ = ["make_mesh", "data_sharding", "replicate", "tile_image",
           "untile_image", "tiled_apply"]
