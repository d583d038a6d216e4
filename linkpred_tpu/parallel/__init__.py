"""Mesh sharding / multi-chip scaling (replaces OpenMP + belongsOmp ownership)."""
from .mesh import make_mesh, pad_tiles_for_mesh, score_tiles_sharded

__all__ = ["make_mesh", "pad_tiles_for_mesh", "score_tiles_sharded"]
