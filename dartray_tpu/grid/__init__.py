from .octree import Grid, point_to_cell, pos_to_fine, fine_to_cell
from .builder import build_grid
from .io import read_grid, write_grid

__all__ = [
    "Grid",
    "point_to_cell",
    "pos_to_fine",
    "fine_to_cell",
    "build_grid",
    "read_grid",
    "write_grid",
]
