"""Data layer: catalog, JSON loaders, axis codec, fixed-shape mapper."""

from .axis_codec import (angle_offset_to_axis, axis_to_angle_offset,
                         axis_to_angle_offset_jnp, get_boundary_point)
from .catalog import (get_dataset_dicts, get_metadata, list_datasets,
                      load_arti_json, load_scannet_json, register_dataset)
from .mapper import DetectionLoader, PlaneRCNNMapper, collate, polygons_to_bitmask

__all__ = [
    "axis_to_angle_offset", "axis_to_angle_offset_jnp", "angle_offset_to_axis",
    "get_boundary_point", "get_dataset_dicts", "get_metadata", "list_datasets",
    "load_arti_json", "load_scannet_json", "register_dataset",
    "PlaneRCNNMapper", "DetectionLoader", "collate", "polygons_to_bitmask",
]
