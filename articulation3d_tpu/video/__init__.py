"""Video inference: batched device pipeline + host ffmpeg IO."""

from .io import read_frames, write_video
from .pipeline import VideoPipeline, make_inference_step, override_plane_offsets

__all__ = ["VideoPipeline", "make_inference_step", "override_plane_offsets",
           "read_frames", "write_video"]
