"""Pinhole camera helpers: 2D <-> 3D lifting and projection (jnp, jit-safe).

Re-implements the reference helpers (`articulation3d/articulation3d/utils/vis.py:37-119`).

TWO intrinsics are deliberately in play, reproducing the reference's
inconsistency (SURVEY.md §7.4 — do not "fix"):
  * FOCAL_OPT = 517.97, principal point (w/2, h/2) — used by the temporal
    optimizer and mesh lifting (`utils/vis.py:38,62,86`);
  * FOCAL_EVAL = 571.623718, principal point (319.5, 239.5) — used by the
    evaluation/depth paths (`evaluation/arti_evaluation.py:88-95`,
    `utils/arti_vis.py:101-108`).

All functions are pure jnp on (N, 2)/(N, 3) arrays so they vmap/jit inside
the temporal optimizer's hypothesis sweep; pass numpy in and they work
host-side too.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

FOCAL_OPT = 517.97       # optimizer / mesh lifting focal length
FOCAL_EVAL = 571.623718  # evaluation / depth path focal length


def intrinsics(h: int = 480, w: int = 640,
               focal_length: float = FOCAL_OPT) -> np.ndarray:
    """K with principal point at the image center (reference get_pcd/project2D)."""
    return np.array([[focal_length, 0.0, w / 2.0],
                     [0.0, focal_length, h / 2.0],
                     [0.0, 0.0, 1.0]])


def intrinsics_eval() -> np.ndarray:
    """K of the eval/depth path (`evaluation/arti_evaluation.py:88-95`)."""
    return np.array([[FOCAL_EVAL, 0.0, 319.5],
                     [0.0, FOCAL_EVAL, 239.5],
                     [0.0, 0.0, 1.0]])


def get_pcd(verts: jnp.ndarray, normal: jnp.ndarray, offset: jnp.ndarray,
            h: int = 480, w: int = 640,
            focal_length: float = FOCAL_OPT) -> jnp.ndarray:
    """Lift 2D pixels to the 3D plane: depth = offset / (n . K^-1 q).

    verts: (N, 2) pixel (x, y); normal: (3,); offset: scalar -> (N, 3).
    (reference `utils/vis.py:86-103`)
    """
    if isinstance(verts, np.ndarray):  # host path: float64 like the reference
        k_inv = np.linalg.inv(intrinsics(h, w, focal_length))
        homo = np.concatenate([verts, np.ones((verts.shape[0], 1))], axis=1)
        ray = homo @ k_inv.T
        depth = np.asarray(offset) / (ray @ np.asarray(normal))
        return depth[:, None] * ray
    k_inv = jnp.asarray(np.linalg.inv(intrinsics(h, w, focal_length)),
                        jnp.float32)
    ones = jnp.ones((verts.shape[0], 1), verts.dtype)
    homo = jnp.concatenate([verts, ones], axis=1)          # (N, 3)
    ray = homo @ k_inv.T                                    # (N, 3)
    depth = offset / (ray @ normal)                         # (N,)
    return depth[:, None] * ray


def get_pcd_depth(verts: jnp.ndarray, depth_map: jnp.ndarray,
                  h: int = 480, w: int = 640,
                  focal_length: float = FOCAL_OPT) -> jnp.ndarray:
    """Lift 2D pixels via a depth map (reference `utils/vis.py:106-119`).

    NOTE the reference indexes `depth[tuple(verts.T)]`, i.e. depth[x, y] with
    verts in (x, y) order — preserved verbatim.
    """
    k_inv = jnp.asarray(np.linalg.inv(intrinsics(h, w, focal_length)))
    ones = jnp.ones((verts.shape[0], 1), verts.dtype)
    homo = jnp.concatenate([verts, ones], axis=1)
    ray = homo @ k_inv.T
    vi = verts.astype(jnp.int32)
    d = depth_map[vi[:, 0], vi[:, 1]]
    return d[:, None] * ray


def project2D(pcd: jnp.ndarray, h: int = 480, w: int = 640,
              focal_length: float = FOCAL_OPT) -> jnp.ndarray:
    """Project (N, 3) camera-space points to (N, 2) pixels
    (reference `utils/vis.py:62-83`)."""
    if isinstance(pcd, np.ndarray):
        k = intrinsics(h, w, focal_length)
        proj = pcd @ k.T
        return proj[:, :2] / proj[:, 2][:, None]
    k = jnp.asarray(intrinsics(h, w, focal_length), jnp.float32)
    proj = pcd @ k.T
    return proj[:, :2] / proj[:, 2][:, None]


def precompute_K_inv_dot_xy_1(h: int = 480, w: int = 640) -> np.ndarray:
    """(3, h, w) back-projection rays at f=517.97, principal (320, 240)
    (reference `utils/vis.py:37-59`); pixel grid rescaled to 640x480."""
    k_inv = np.linalg.inv(np.array([[517.97, 0, 320.0],
                                    [0, 517.97, 240.0],
                                    [0, 0, 1.0]]))
    ys = (np.arange(h, dtype=np.float64) / h * 480)
    xs = (np.arange(w, dtype=np.float64) / w * 640)
    xx, yy = np.meshgrid(xs, ys)
    homo = np.stack([xx, yy, np.ones_like(xx)], axis=0)     # (3, h, w)
    return np.einsum("ij,jhw->ihw", k_inv, homo)


def get_k_inv_dot_xy_1_eval(h: int = 480, w: int = 640) -> np.ndarray:
    """(3, h*w) rays with the EVAL intrinsics — the depth->XYZ path of
    `evaluation/scannet_evaluation.py:140-163` and `utils/arti_vis.py:101-108`."""
    k_inv = np.linalg.inv(intrinsics_eval())
    ys = np.arange(h, dtype=np.float64)
    xs = np.arange(w, dtype=np.float64)
    xx, yy = np.meshgrid(xs, ys)
    homo = np.stack([xx.ravel(), yy.ravel(), np.ones(h * w)], axis=0)
    return k_inv @ homo
