"""Spatial acceleration structures (host build, device traversal)."""

from .bvh import FlatBVH, build_bvh

__all__ = ["FlatBVH", "build_bvh"]
