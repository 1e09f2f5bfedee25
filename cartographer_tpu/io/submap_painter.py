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


def grid_3d_to_xray_texture(grid) -> Dict:
    """X-ray view through a 3D grid, aligned to the xy-plane — the
    SubmapQuery texture of a 3D submap (reference Submap3D::ToResponseProto
    -> AddToTextureProto, mapping/3d/submap_3d.cc:196-226,310: per-pixel
    accumulation of voxel probabilities along z with an observed-count
    weight).

    Returns a renderable texture dict: `cells` is a (h, w) grayscale uint8
    x-ray (dark = occupied, light = free, 128 = unobserved column) and
    `height_cells` the per-pixel max occupied-voxel z index (uint8, scaled
    into the grid's z extent) — the height slice a 3D viewer shades by.
    """
    prob = np.asarray(grid.probability())
    known = np.asarray(grid.known)
    origin = np.asarray(grid.origin, np.float64)
    res = float(grid.resolution)

    counts = known.sum(axis=2)
    col_known = counts > 0
    # Crop to observed columns.
    xs, ys = np.nonzero(col_known)
    if len(xs) == 0:
        return {"width": 1, "height": 1,
                "cells": np.full((1, 1), 128, np.uint8).tobytes(),
                "height_cells": np.zeros((1, 1), np.uint8).tobytes(),
                "origin": [float(origin[0]), float(origin[1])],
                "resolution": res, "min_z": float(origin[2]),
                "max_z": float(origin[2])}
    imin, imax = int(xs.min()), int(xs.max())
    jmin, jmax = int(ys.min()), int(ys.max())
    prob = prob[imin:imax + 1, jmin:jmax + 1]
    known = known[imin:imax + 1, jmin:jmax + 1]
    counts = counts[imin:imax + 1, jmin:jmax + 1]
    col_known = col_known[imin:imax + 1, jmin:jmax + 1]

    # AccumulatePixelData: mean probability over observed voxels in the
    # column (the reference weights max-probability hits; a mean over known
    # voxels renders equivalently for occupancy display).
    mean_p = (prob * known).sum(axis=2) / np.maximum(counts, 1)
    img = np.where(col_known, (255 * (1.0 - mean_p)).astype(np.uint8), 128)

    # Height slice: highest occupied (p > 0.5) voxel index per column.
    occupied = known & (prob > 0.5)
    S_z = occupied.shape[2]
    zidx = np.arange(S_z)[None, None, :]
    top = np.where(occupied, zidx, -1).max(axis=2)
    height = np.where(top >= 0,
                      (top * 255 // max(S_z - 1, 1)), 0).astype(np.uint8)

    return {
        "width": int(img.shape[1]), "height": int(img.shape[0]),
        "cells": img.astype(np.uint8).tobytes(),
        "height_cells": height.tobytes(),
        "origin": [float(origin[0] + imin * res),
                   float(origin[1] + jmin * res)],
        "resolution": res,
        "min_z": float(origin[2]),
        "max_z": float(origin[2] + S_z * res),
    }


def submap_3d_to_textures(submap) -> List[Dict]:
    """The reference's two-texture 3D SubmapQuery response: high-resolution
    then low-resolution x-ray (submap_3d.cc:310-321)."""
    out = []
    for grid in (submap.high_grid, submap.low_grid):
        if grid is not None:
            out.append(grid_3d_to_xray_texture(grid))
    return out


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
