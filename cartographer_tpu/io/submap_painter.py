"""Submap / map rendering to images.

Reference: io/submap_painter.cc (Cairo) — paints submap probability textures
into a global map image at their optimized poses. PIL-based here; the output
is the standard occupancy-map visualization (dark = occupied, light = free,
gray = unknown) used by the SubmapQuery response path and map export.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from cartographer_tpu.mapping.id import SubmapId
from cartographer_tpu.mapping.pose_graph_2d import PoseGraph2D
from cartographer_tpu.ops.probability import UNKNOWN_PROBABILITY


def submap_to_image(grid, crop: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """One submap grid -> (grayscale uint8 image, origin_xy of pixel (0,0)).

    Pixel value: 255 = free, 0 = occupied, 128 = unknown.
    """
    prob = np.asarray(grid.probability())
    known = np.asarray(grid.known)
    origin = np.asarray(grid.origin, np.float64)
    if crop:
        imin, imax, jmin, jmax = grid.known_bounds_numpy()
        if imax < imin:
            return np.full((1, 1), 128, np.uint8), origin
        prob = prob[imin:imax + 1, jmin:jmax + 1]
        known = known[imin:imax + 1, jmin:jmax + 1]
        origin = origin + np.array([imin, jmin]) * grid.resolution
    img = np.where(known, (255 * (1.0 - prob)).astype(np.uint8), 128)
    return img.astype(np.uint8), origin


def paint_map(pose_graph: PoseGraph2D, resolution: float = 0.05,
              path: Optional[str] = None) -> np.ndarray:
    """Compose all finished submaps at their optimized poses into one map
    image (io::PaintSubmapSlices). Returns the uint8 array (and saves PNG
    when `path` is given)."""
    pieces = []
    for (tid, sindex), entry in pose_graph.submap_data.items():
        if entry.submap.grid is None:
            continue
        img, origin = submap_to_image(entry.submap.grid)
        # Optimized correction: anchored global pose vs creation anchor.
        anchor = pose_graph._submap_local_pose_2d(entry.submap)
        correction = entry.global_pose_2d - anchor  # small-angle composition
        pieces.append((img, origin, correction, entry.submap.grid.resolution))
    if not pieces:
        return np.full((1, 1), 128, np.uint8)

    # World bounds.
    bounds = []
    for img, origin, corr, res in pieces:
        h, w = img.shape
        bounds.append([origin[0] + corr[0], origin[1] + corr[1],
                       origin[0] + corr[0] + h * res, origin[1] + corr[1] + w * res])
    bounds = np.asarray(bounds)
    x0, y0 = bounds[:, 0].min(), bounds[:, 1].min()
    x1, y1 = bounds[:, 2].max(), bounds[:, 3].max()
    W = int(np.ceil((x1 - x0) / resolution)) + 1
    H = int(np.ceil((y1 - y0) / resolution)) + 1

    acc = np.zeros((H, W), np.float64)
    weight = np.zeros((H, W), np.float64)
    for img, origin, corr, res in pieces:
        h, w = img.shape
        ii, jj = np.nonzero(img != 128)
        if len(ii) == 0:
            continue
        # Apply the (translation-only here; rotations are tiny per submap)
        # optimized correction.
        xs = origin[0] + corr[0] + (ii + 0.5) * res
        ys = origin[1] + corr[1] + (jj + 0.5) * res
        c, s = np.cos(corr[2]), np.sin(corr[2])
        if abs(corr[2]) > 1e-6:
            cxs = origin[0] + corr[0]
            cys = origin[1] + corr[1]
            rx = c * (xs - cxs) - s * (ys - cys) + cxs
            ry = s * (xs - cxs) + c * (ys - cys) + cys
            xs, ys = rx, ry
        px = ((xs - x0) / resolution).astype(int)
        py = ((ys - y0) / resolution).astype(int)
        ok = (px >= 0) & (px < H) & (py >= 0) & (py < W)
        np.add.at(acc, (px[ok], py[ok]), img[ii[ok], jj[ok]].astype(np.float64))
        np.add.at(weight, (px[ok], py[ok]), 1.0)

    out = np.where(weight > 0, acc / np.maximum(weight, 1), 128).astype(np.uint8)
    if path is not None:
        from PIL import Image

        Image.fromarray(out.T[::-1], "L").save(path)
    return out
