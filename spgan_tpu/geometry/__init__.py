"""Spherical geometry: coordinate fields, gnomonic sampling grids,
spherical convolutions."""
from spgan_tpu.geometry.coords import (  # noqa: F401
    CoordsPartial,
    CoordGrid,
    encode_coords,
)
from spgan_tpu.geometry.sphere_grid import (  # noqa: F401
    sphere_patch_grid,
    sphere_patch_grid_batch,
    global_sphere_pattern,
)
from spgan_tpu.geometry.sphere_conv import (  # noqa: F401
    SphereStyledConv,
    SphereSkipConv,
)
