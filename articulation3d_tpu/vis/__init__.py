"""Visualization: instance/axis overlays + normal maps (cv2-based)."""

from .render import look_at_view_transform, render_img, render_meshes
from .visualizer import (ArtiVisualizer, draw_gt, draw_pred, get_normal_map,
                         random_colors, vis_surface_normal)

__all__ = ["ArtiVisualizer", "draw_pred", "draw_gt", "get_normal_map",
           "vis_surface_normal", "random_colors", "render_img", "render_meshes",
           "look_at_view_transform"]
