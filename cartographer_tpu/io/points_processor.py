"""Chainable map post-processing pipeline.

Reference: cartographer/io/points_processor.h (Process/Flush with
kRestartStream for multi-pass processors) and the 14 shipped processors
registered in points_processor_pipeline_builder.cc. This implements the
pipeline contract plus the core processors: pcd/ply/xyz writers, fixed-ratio
/ min-max-range / vertical-range / frame-id filtering, counting, coloring,
intensity-to-color, voxel-vote outlier removal (multi-pass), and x-ray /
probability-grid image projections (PIL instead of Cairo).
"""

from __future__ import annotations

import dataclasses
import random
import struct
from typing import Dict, List, Optional

import numpy as np

FLUSH_FINISHED = "kFinishedHandlingOutput"
FLUSH_RESTART = "kRestartStream"


@dataclasses.dataclass
class PointsBatch:
    """io::PointsBatch: one delivery of points from a map pass."""

    origin: np.ndarray  # (3,)
    points: np.ndarray  # (n, 3) in the map frame
    intensities: Optional[np.ndarray] = None  # (n,)
    colors: Optional[np.ndarray] = None  # (n, 3) uint8
    frame_id: str = ""
    trajectory_id: int = 0
    start_time: int = 0

    def remove(self, to_remove: np.ndarray) -> "PointsBatch":
        keep = ~to_remove
        return PointsBatch(
            origin=self.origin,
            points=self.points[keep],
            intensities=None if self.intensities is None else self.intensities[keep],
            colors=None if self.colors is None else self.colors[keep],
            frame_id=self.frame_id,
            trajectory_id=self.trajectory_id,
            start_time=self.start_time)


class PointsProcessor:
    def __init__(self, next_processor: Optional["PointsProcessor"] = None):
        self._next = next_processor

    def process(self, batch: PointsBatch) -> None:
        if self._next is not None:
            self._next.process(batch)

    def flush(self) -> str:
        if self._next is not None:
            return self._next.flush()
        return FLUSH_FINISHED


class NullPointsProcessor(PointsProcessor):
    """Terminal sink (io::NullPointsProcessor)."""

    def process(self, batch: PointsBatch) -> None:
        pass

    def flush(self) -> str:
        return FLUSH_FINISHED


class CountingPointsProcessor(PointsProcessor):
    def __init__(self, next_processor=None):
        super().__init__(next_processor)
        self.num_points = 0

    def process(self, batch: PointsBatch) -> None:
        self.num_points += len(batch.points)
        super().process(batch)


class FixedRatioSamplingPointsProcessor(PointsProcessor):
    def __init__(self, sampling_ratio: float, next_processor=None, seed: int = 0):
        super().__init__(next_processor)
        self._ratio = sampling_ratio
        self._rng = random.Random(seed)

    def process(self, batch: PointsBatch) -> None:
        remove = np.asarray(
            [self._rng.random() >= self._ratio for _ in range(len(batch.points))])
        super().process(batch.remove(remove))


class MinMaxRangeFilteringPointsProcessor(PointsProcessor):
    def __init__(self, min_range: float, max_range: float, next_processor=None):
        super().__init__(next_processor)
        self._min, self._max = min_range, max_range

    def process(self, batch: PointsBatch) -> None:
        r = np.linalg.norm(batch.points - batch.origin[None, :], axis=1)
        super().process(batch.remove((r < self._min) | (r > self._max)))


class VerticalRangeFilteringPointsProcessor(PointsProcessor):
    def __init__(self, min_z: float, max_z: float, next_processor=None):
        super().__init__(next_processor)
        self._min, self._max = min_z, max_z

    def process(self, batch: PointsBatch) -> None:
        z = batch.points[:, 2]
        super().process(batch.remove((z < self._min) | (z > self._max)))


class FrameIdFilteringPointsProcessor(PointsProcessor):
    def __init__(self, keep_frames: List[str] = (), drop_frames: List[str] = (),
                 next_processor=None):
        super().__init__(next_processor)
        self._keep = set(keep_frames)
        self._drop = set(drop_frames)

    def process(self, batch: PointsBatch) -> None:
        if batch.frame_id in self._drop:
            return
        if self._keep and batch.frame_id not in self._keep:
            return
        super().process(batch)


class ColoringPointsProcessor(PointsProcessor):
    def __init__(self, color, frame_id: str, next_processor=None):
        super().__init__(next_processor)
        self._color = np.asarray(color, np.uint8)
        self._frame_id = frame_id

    def process(self, batch: PointsBatch) -> None:
        if batch.frame_id == self._frame_id:
            batch.colors = np.tile(self._color, (len(batch.points), 1))
        super().process(batch)


class IntensityToColorPointsProcessor(PointsProcessor):
    """Map intensity to gray color (io::IntensityToColorPointsProcessor)."""

    def __init__(self, min_intensity: float, max_intensity: float,
                 frame_id: str = "", next_processor=None):
        super().__init__(next_processor)
        self._min, self._max = min_intensity, max_intensity
        self._frame_id = frame_id

    def process(self, batch: PointsBatch) -> None:
        if batch.intensities is not None and (
                not self._frame_id or batch.frame_id == self._frame_id):
            g = np.clip((batch.intensities - self._min)
                        / max(self._max - self._min, 1e-9), 0, 1)
            batch.colors = np.stack([(g * 255).astype(np.uint8)] * 3, -1)
        super().process(batch)


class OutlierRemovingPointsProcessor(PointsProcessor):
    """Voxel-vote outlier removal; multi-pass via kRestartStream
    (io::OutlierRemovingPointsProcessor): pass 1 counts rays ending in each
    voxel, pass 2 counts rays passing through, pass 3 drops points in voxels
    where pass-through dominates (moving objects)."""

    def __init__(self, voxel_size: float, miss_per_hit_limit: float = 3.0,
                 next_processor=None):
        super().__init__(next_processor)
        self._voxel = voxel_size
        self._limit = miss_per_hit_limit
        self._phase = 0  # 0: count hits, 1: count rays, 2: emit
        self._hits: Dict[tuple, int] = {}
        self._rays: Dict[tuple, int] = {}

    def _key(self, p) -> tuple:
        return tuple(np.floor(p / self._voxel).astype(int))

    def process(self, batch: PointsBatch) -> None:
        if self._phase == 0:
            for p in batch.points:
                k = self._key(p)
                self._hits[k] = self._hits.get(k, 0) + 1
        elif self._phase == 1:
            for p in batch.points:
                d = p - batch.origin
                n = max(int(np.linalg.norm(d) / self._voxel * 2), 1)
                for t in range(n):
                    k = self._key(batch.origin + d * (t / n))
                    if k in self._hits:
                        self._rays[k] = self._rays.get(k, 0) + 1
        else:
            remove = np.asarray([
                self._rays.get(self._key(p), 0)
                > self._limit * self._hits.get(self._key(p), 1)
                for p in batch.points])
            super().process(batch.remove(remove))

    def flush(self) -> str:
        if self._phase < 2:
            self._phase += 1
            return FLUSH_RESTART
        return super().flush()


class XyzWriterPointsProcessor(PointsProcessor):
    def __init__(self, path: str, next_processor=None):
        super().__init__(next_processor)
        self._f = open(path, "w")

    def process(self, batch: PointsBatch) -> None:
        for p in batch.points:
            self._f.write(f"{p[0]} {p[1]} {p[2]}\n")
        super().process(batch)

    def flush(self) -> str:
        self._f.close()
        return super().flush()


class PlyWriterPointsProcessor(PointsProcessor):
    """Binary little-endian PLY (io::PlyWritingPointsProcessor)."""

    def __init__(self, path: str, next_processor=None):
        super().__init__(next_processor)
        self._path = path
        self._points: List[np.ndarray] = []
        self._colors: List[Optional[np.ndarray]] = []

    def process(self, batch: PointsBatch) -> None:
        self._points.append(batch.points.astype(np.float32))
        self._colors.append(batch.colors)
        super().process(batch)

    def flush(self) -> str:
        pts = np.concatenate(self._points) if self._points else np.zeros((0, 3), np.float32)
        has_color = all(c is not None for c in self._colors) and self._colors
        with open(self._path, "wb") as f:
            header = ["ply", "format binary_little_endian 1.0",
                      f"element vertex {len(pts)}",
                      "property float x", "property float y", "property float z"]
            if has_color:
                header += ["property uchar red", "property uchar green",
                           "property uchar blue"]
            header.append("end_header")
            f.write(("\n".join(header) + "\n").encode())
            if has_color:
                colors = np.concatenate(self._colors)
                for p, c in zip(pts, colors):
                    f.write(struct.pack("<fffBBB", *p, *c))
            else:
                f.write(pts.astype("<f4").tobytes())
        return super().flush()


class PcdWriterPointsProcessor(PointsProcessor):
    """ASCII PCD v0.7 (io::PcdWritingPointsProcessor)."""

    def __init__(self, path: str, next_processor=None):
        super().__init__(next_processor)
        self._path = path
        self._points: List[np.ndarray] = []

    def process(self, batch: PointsBatch) -> None:
        self._points.append(batch.points)
        super().process(batch)

    def flush(self) -> str:
        pts = np.concatenate(self._points) if self._points else np.zeros((0, 3))
        with open(self._path, "w") as f:
            f.write("# .PCD v0.7 - Point Cloud Data file format\n")
            f.write("VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n")
            f.write(f"COUNT 1 1 1\nWIDTH {len(pts)}\nHEIGHT 1\n")
            f.write("VIEWPOINT 0 0 0 1 0 0 0\n")
            f.write(f"POINTS {len(pts)}\nDATA ascii\n")
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
        return super().flush()


class XRayPointsProcessor(PointsProcessor):
    """Top-down x-ray density image (io::XRayPointsProcessor, PIL not Cairo)."""

    def __init__(self, voxel_size: float, path: str, next_processor=None):
        super().__init__(next_processor)
        self._voxel = voxel_size
        self._path = path
        self._cells: Dict[tuple, int] = {}

    def process(self, batch: PointsBatch) -> None:
        for p in batch.points:
            k = (int(np.floor(p[0] / self._voxel)), int(np.floor(p[1] / self._voxel)))
            self._cells[k] = self._cells.get(k, 0) + 1
        super().process(batch)

    def flush(self) -> str:
        if self._cells:
            from PIL import Image

            keys = np.asarray(list(self._cells.keys()))
            counts = np.asarray(list(self._cells.values()), float)
            x0, y0 = keys.min(axis=0)
            w, h = keys.max(axis=0) - keys.min(axis=0) + 1
            img = np.zeros((int(h), int(w)), float)
            img[keys[:, 1] - y0, keys[:, 0] - x0] = np.minimum(
                1.0, np.log1p(counts) / np.log1p(counts.max()))
            Image.fromarray((255 * (1 - img)).astype(np.uint8), "L").save(self._path)
        return super().flush()


def _odds_update(cells_dict: Dict[tuple, float], cells: np.ndarray,
                 log_odds_delta: float, lo_min: float, lo_max: float) -> None:
    """Apply one odds-space update to each unique cell (probability_values.h
    odds algebra on f32 log-odds; update-marker semantics = unique per batch)."""
    for k in map(tuple, cells):
        cells_dict[k] = float(np.clip(cells_dict.get(k, 0.0) + log_odds_delta,
                                      lo_min, lo_max))


def _ray_miss_samples(origin: np.ndarray, points: np.ndarray,
                      resolution: float, max_steps: int = 4096) -> np.ndarray:
    """Vectorized free-space samples along each ray [origin, hit)."""
    if len(points) == 0:
        return np.zeros((0, points.shape[1]))
    d = points - origin[None, : points.shape[1]]
    r = np.linalg.norm(d, axis=1)
    n_steps = np.minimum(np.floor(r / resolution).astype(int), max_steps)
    total = int(n_steps.sum())
    if total == 0:
        return np.zeros((0, points.shape[1]))
    rep = np.repeat(np.arange(len(points)), n_steps)
    cum = np.cumsum(n_steps)
    pos = np.arange(total) - np.repeat(cum - n_steps, n_steps)
    frac = (pos + 0.5) * resolution / np.maximum(r[rep], 1e-9)
    return origin[None, : points.shape[1]] + d[rep] * frac[:, None]


class _GridWritingPointsProcessor(PointsProcessor):
    """Shared hit/miss log-odds accumulation for grid-writing processors."""

    def __init__(self, resolution: float, hit_probability: float,
                 miss_probability: float, dims: int, next_processor=None):
        super().__init__(next_processor)
        from cartographer_tpu.ops.probability import (
            MAX_LOG_ODDS, MIN_LOG_ODDS)
        self._res = resolution
        self._dims = dims
        self._lo_hit = float(np.log(hit_probability / (1 - hit_probability)))
        self._lo_miss = float(np.log(miss_probability / (1 - miss_probability)))
        self._lo_min, self._lo_max = float(MIN_LOG_ODDS), float(MAX_LOG_ODDS)
        self._cells: Dict[tuple, float] = {}

    def process(self, batch: PointsBatch) -> None:
        pts = batch.points[:, : self._dims]
        hit_cells = np.unique(
            np.floor(pts / self._res).astype(np.int64), axis=0)
        _odds_update(self._cells, hit_cells, self._lo_hit,
                     self._lo_min, self._lo_max)
        samples = _ray_miss_samples(batch.origin[: self._dims], pts, self._res)
        if len(samples):
            miss_cells = np.unique(
                np.floor(samples / self._res).astype(np.int64), axis=0)
            hit_set = {tuple(c) for c in hit_cells}
            miss_cells = np.asarray(
                [c for c in miss_cells if tuple(c) not in hit_set], np.int64)
            if len(miss_cells):
                _odds_update(self._cells, miss_cells, self._lo_miss,
                             self._lo_min, self._lo_max)
        super().process(batch)

    def probabilities(self):
        """(cells (n, dims) int64, probabilities (n,) float32)."""
        if not self._cells:
            return (np.zeros((0, self._dims), np.int64),
                    np.zeros(0, np.float32))
        cells = np.asarray(list(self._cells.keys()), np.int64)
        lo = np.asarray(list(self._cells.values()), np.float32)
        return cells, 1.0 / (1.0 + np.exp(-lo))


class ProbabilityGridPointsProcessor(_GridWritingPointsProcessor):
    """2D probability-grid rasterization of all map points
    (io::ProbabilityGridPointsProcessor, action "write_probability_grid").
    output_type "png" renders ProbabilityToColor grayscale via PIL (Cairo in
    the reference); "pb" writes the sparse grid as msgpack (this build's
    serialization format). draw_trajectories overlays node positions."""

    def __init__(self, resolution: float, path: str, output_type: str = "png",
                 draw_trajectories: bool = True, trajectories=(),
                 hit_probability: float = 0.55, miss_probability: float = 0.49,
                 next_processor=None):
        super().__init__(resolution, hit_probability, miss_probability, 2,
                         next_processor)
        self._path = path
        self._output_type = output_type
        self._draw = draw_trajectories
        self._trajectories = trajectories

    def flush(self) -> str:
        cells, probs = self.probabilities()
        if self._output_type == "pb":
            import msgpack
            with open(self._path, "wb") as f:
                f.write(msgpack.packb({
                    "resolution": self._res,
                    "cells": cells.tobytes(),
                    "probabilities": probs.astype(np.float32).tobytes(),
                    "num_cells": len(cells)}))
        elif len(cells):
            from PIL import Image
            x0, y0 = cells.min(axis=0)
            w, h = cells.max(axis=0) - cells.min(axis=0) + 1
            # unknown cells render mid-gray 128, known via ProbabilityToColor
            # (probability_grid_points_processor.cc:51-56)
            img = np.full((int(h), int(w)), 128, np.uint8)
            gray = np.round(255 * ((1.0 - probs) - 0.1) / 0.8).clip(0, 255)
            img[cells[:, 1] - y0, cells[:, 0] - x0] = gray.astype(np.uint8)
            rgb = np.stack([img] * 3, -1)
            if self._draw:
                colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
                for ti, traj in enumerate(self._trajectories):
                    for t, q in traj:
                        cx = int(np.floor(t[0] / self._res)) - x0
                        cy = int(np.floor(t[1] / self._res)) - y0
                        if 0 <= cy < h and 0 <= cx < w:
                            rgb[cy, cx] = colors[ti % len(colors)]
            Image.fromarray(rgb, "RGB").save(self._path)
        return super().flush()


class HybridGridPointsProcessor(_GridWritingPointsProcessor):
    """3D voxel-grid accumulation written as msgpack sparse grid
    (io::HybridGridPointsProcessor, action "write_hybrid_grid";
    hybrid_grid_points_processor.cc:41-58)."""

    def __init__(self, voxel_size: float, path: str,
                 hit_probability: float = 0.55, miss_probability: float = 0.49,
                 next_processor=None):
        super().__init__(voxel_size, hit_probability, miss_probability, 3,
                         next_processor)
        self._path = path

    def flush(self) -> str:
        import msgpack
        cells, probs = self.probabilities()
        with open(self._path, "wb") as f:
            f.write(msgpack.packb({
                "resolution": self._res,
                "cells": cells.tobytes(),
                "probabilities": probs.astype(np.float32).tobytes(),
                "num_cells": len(cells)}))
        result = super().flush()
        if result == FLUSH_RESTART:
            raise RuntimeError(
                "grid generation must run after any multi-pass stages")
        return result


# ---------------------------------------------------------------------------
# Pipeline builder (io::PointsProcessorPipelineBuilder)
# ---------------------------------------------------------------------------

_REGISTRY = {
    "write_xyz": lambda cfg, nxt: XyzWriterPointsProcessor(cfg["filename"], nxt),
    "write_ply": lambda cfg, nxt: PlyWriterPointsProcessor(cfg["filename"], nxt),
    "write_pcd": lambda cfg, nxt: PcdWriterPointsProcessor(cfg["filename"], nxt),
    "write_xray_image": lambda cfg, nxt: XRayPointsProcessor(
        cfg.get("voxel_size", 0.05), cfg["filename"], nxt),
    "write_xray": lambda cfg, nxt: XRayPointsProcessor(  # legacy alias
        cfg.get("voxel_size", 0.05), cfg["filename"], nxt),
    "write_probability_grid": lambda cfg, nxt: ProbabilityGridPointsProcessor(
        cfg["resolution"], cfg["filename"],
        output_type=cfg.get("output_type", "png"),
        draw_trajectories=cfg.get("draw_trajectories", True),
        trajectories=cfg.get("trajectories", ()),
        hit_probability=cfg.get("range_data_inserter", {}).get(
            "hit_probability", 0.55),
        miss_probability=cfg.get("range_data_inserter", {}).get(
            "miss_probability", 0.49),
        next_processor=nxt),
    "write_hybrid_grid": lambda cfg, nxt: HybridGridPointsProcessor(
        cfg["voxel_size"], cfg["filename"],
        hit_probability=cfg.get("range_data_inserter", {}).get(
            "hit_probability", 0.55),
        miss_probability=cfg.get("range_data_inserter", {}).get(
            "miss_probability", 0.49),
        next_processor=nxt),
    "dump_num_points": lambda cfg, nxt: CountingPointsProcessor(nxt),
    "count": lambda cfg, nxt: CountingPointsProcessor(nxt),  # legacy alias
    "fixed_ratio_sampler": lambda cfg, nxt: FixedRatioSamplingPointsProcessor(
        cfg["sampling_ratio"], nxt),
    "min_max_range_filter": lambda cfg, nxt: MinMaxRangeFilteringPointsProcessor(
        cfg.get("min_range", 0.0), cfg.get("max_range", 1e9), nxt),
    "vertical_range_filter": lambda cfg, nxt: VerticalRangeFilteringPointsProcessor(
        cfg.get("min_z", -1e9), cfg.get("max_z", 1e9), nxt),
    "frame_id_filter": lambda cfg, nxt: FrameIdFilteringPointsProcessor(
        cfg.get("keep_frames", ()), cfg.get("drop_frames", ()), nxt),
    "color_points": lambda cfg, nxt: ColoringPointsProcessor(
        cfg["color"], cfg["frame_id"], nxt),
    "intensity_to_color": lambda cfg, nxt: IntensityToColorPointsProcessor(
        cfg["min_intensity"], cfg["max_intensity"], cfg.get("frame_id", ""), nxt),
    "voxel_filter_and_remove_moving_objects":
        lambda cfg, nxt: OutlierRemovingPointsProcessor(
            cfg.get("voxel_size", 0.3), cfg.get("miss_per_hit_limit", 3.0), nxt),
}


def build_pipeline(configs: List[Dict]) -> PointsProcessor:
    """Build the chain from a list of {"action": name, ...} dicts; the last
    stage feeds a NullPointsProcessor sink."""
    processor: PointsProcessor = NullPointsProcessor()
    for cfg in reversed(configs):
        action = cfg["action"]
        if action not in _REGISTRY:
            raise KeyError(f"unknown points processor {action!r}")
        processor = _REGISTRY[action](cfg, processor)
    return processor


def run_pipeline(processor: PointsProcessor, batch_source) -> int:
    """Drive batches through the pipeline, honoring kRestartStream
    (multi-pass processors). `batch_source` is a callable returning an
    iterable of PointsBatch per pass. Returns the number of passes."""
    passes = 0
    while True:
        passes += 1
        for batch in batch_source():
            processor.process(batch)
        if processor.flush() != FLUSH_RESTART:
            return passes
