"""Host-side video IO: ffmpeg decode/encode via imageio.

Thin shim matching `tools/inference.py:203-278`: mp4 (or single png) in,
640x480 BGR frames out; side-by-side visualization mp4 writer.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import cv2
import numpy as np


def read_frames(path: str, height: int = 480, width: int = 640
                ) -> Tuple[List[np.ndarray], Optional[float]]:
    """Decode a video (or single image) to a list of (H, W, 3) BGR uint8.

    Returns (frames, fps); fps is None for still images.
    """
    if path.endswith(".png") or path.endswith(".jpg"):
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return [cv2.resize(img, (width, height))], None

    try:
        import imageio
        reader = imageio.get_reader(path)
    except ImportError:
        reader = None                      # no imageio/ffmpeg: use OpenCV
    except ValueError as e:
        # imageio signals a missing backend plugin as ValueError ("Could not
        # find a backend to open ..."); genuine decode errors on a corrupt
        # file must propagate, not silently reroute into the cv2 fallback
        if "backend" not in str(e).lower() and "ffmpeg" not in str(e).lower():
            raise
        reader = None
    if reader is not None:
        fps = reader.get_meta_data().get("fps", 30.0)
        frames = []
        for im in reader:                  # imageio yields RGB
            im = cv2.resize(im, (width, height))
            frames.append(im[:, :, ::-1].copy())  # -> BGR
        reader.close()
        return frames, float(fps)

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while True:
        ok, im = cap.read()                # cv2 yields BGR directly
        if not ok:
            break
        frames.append(cv2.resize(im, (width, height)))
    cap.release()
    return frames, float(fps)


def write_video(path: str, frames: List[np.ndarray], fps: float = 30.0,
                bgr: bool = True) -> None:
    """Write (H, W, 3) uint8 frames to an mp4 (imageio/ffmpeg, cv2 fallback)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import imageio
        writer = imageio.get_writer(path, fps=fps)
    except ImportError:
        writer = None                      # no imageio/ffmpeg: use OpenCV
    except ValueError as e:
        # same contract as read_frames: only a missing backend plugin
        # ("Could not find a backend to write ...") reroutes to cv2;
        # genuine encode errors (bad codec args, unwritable path) propagate
        if "backend" not in str(e).lower() and "ffmpeg" not in str(e).lower():
            raise
        writer = None
    if writer is not None:
        for f in frames:
            writer.append_data(f[:, :, ::-1] if bgr else f)
        writer.close()
        return
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        vw.write(np.ascontiguousarray(f if bgr else f[:, :, ::-1]))
    vw.release()
