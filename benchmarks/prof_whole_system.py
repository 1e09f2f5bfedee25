"""Profile the whole-system bench: where does ingest time go?

Monkeypatches timers onto the constraint builder, the Schur solve, and the
scan batcher, then runs bench.bench_whole_system and prints a breakdown.
Run on the real chip: `python benchmarks/prof_whole_system.py`.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from cartographer_tpu.mapping import constraint_builder_2d as cb2  # noqa: E402
from cartographer_tpu.mapping import pose_graph_2d as pg2  # noqa: E402

stats = {
    "cb_raw_seconds": 0.0,
    "cb_requests": 0,
    "cb_calls": 0,
    "opt_seconds": 0.0,
    "opt_calls": 0,
    "batch_compute_seconds": 0.0,
}

_orig_raw = cb2.ConstraintBuilder2D._raw_results


def timed_raw(self, requests):
    t0 = time.monotonic()
    out = _orig_raw(self, requests)
    dt = time.monotonic() - t0
    stats["cb_raw_seconds"] += dt
    stats["cb_requests"] += len(requests)
    stats["cb_calls"] += 1
    print(f"[cb] n={len(requests)} dt={dt:.2f}s", flush=True)
    return out


cb2.ConstraintBuilder2D._raw_results = timed_raw

_orig_matcher_for = cb2.ConstraintBuilder2D._matcher_for


def timed_matcher_for(self, submap_id, grid):
    t0 = time.monotonic()
    out = _orig_matcher_for(self, submap_id, grid)
    dt = time.monotonic() - t0
    if dt > 0.005:
        print(f"[pyr] {submap_id} dt={dt:.3f}s", flush=True)
    return out


cb2.ConstraintBuilder2D._matcher_for = timed_matcher_for

from cartographer_tpu.ops import bnb_2d as _bnb  # noqa: E402

_orig_exact = _bnb.match_full_submap_exact


def timed_exact(pyr, grid, pts, msk, params, min_score, max_beam=65536):
    t0 = time.monotonic()
    out = _orig_exact(pyr, grid, pts, msk, params, min_score, max_beam)
    print(f"[widen] dt={time.monotonic()-t0:.2f}s score={out[1]:.3f} "
          f"cert={out[3]}", flush=True)
    return out


_bnb.match_full_submap_exact = timed_exact

_orig_globals = cb2.ConstraintBuilder2D._raw_globals


def timed_globals(self, reqs):
    t0 = time.monotonic()
    out = _orig_globals(self, reqs)
    print(f"[globals] n={len(reqs)} dt={time.monotonic()-t0:.2f}s "
          f"scores={[round(float(s), 2) for s in out[:, 0]]}", flush=True)
    return out


cb2.ConstraintBuilder2D._raw_globals = timed_globals

_orig_chunk = cb2.ConstraintBuilder2D._raw_chunk


def timed_chunk(self, group):
    t0 = time.monotonic()
    out = _orig_chunk(self, group)
    print(f"[chunk] n={len(group)} dispatch_dt={time.monotonic()-t0:.3f}s",
          flush=True)
    return out


cb2.ConstraintBuilder2D._raw_chunk = timed_chunk

_orig_opt = pg2.PoseGraph2D.run_optimization


def timed_opt(self, num_iterations=None):
    t0 = time.monotonic()
    out = _orig_opt(self, num_iterations)
    dt = time.monotonic() - t0
    stats["opt_seconds"] += dt
    stats["opt_calls"] += 1
    print(f"[opt] dt={dt:.2f}s", flush=True)
    return out


pg2.PoseGraph2D.run_optimization = timed_opt

_orig_ccb = pg2.PoseGraph2D._compute_constraints_batch


def timed_ccb(self, pairs):
    t0 = time.monotonic()
    out = _orig_ccb(self, pairs)
    stats["batch_compute_seconds"] += time.monotonic() - t0
    return out


pg2.PoseGraph2D._compute_constraints_batch = timed_ccb

# Grab the batcher telemetry: bench closes it, so snapshot via the
# MapBuilder reference the bench returns indirectly — easiest is to patch
# ScanBatcher.close to dump telemetry first.
from cartographer_tpu.mapping.scan_batcher import ScanBatcher  # noqa: E402

_orig_close = ScanBatcher.close


def dump_close(self):
    print(f"[batcher] batches={self.num_batches} scans={self.num_scans} "
          f"dispatch_s={self.dispatch_seconds:.2f} "
          f"fetch_s={self.fetch_seconds:.2f}")
    _orig_close(self)


ScanBatcher.close = dump_close

# Reset stats when the TIMED pass's MapBuilder is constructed (pass 2 =
# MapBuilder #2) so warm-pass compile time is reported separately.
from cartographer_tpu.mapping.map_builder import MapBuilder  # noqa: E402

_orig_mb_init = MapBuilder.__init__
_mb_count = [0]


def counting_init(self, *a, **k):
    _mb_count[0] += 1
    if _mb_count[0] == 2:
        print("== warm pass stats ==", flush=True)
        for k2, v in stats.items():
            print(f"  {k2}: {round(v, 2) if isinstance(v, float) else v}")
        for k2 in stats:
            stats[k2] = 0.0 if isinstance(stats[k2], float) else 0
        print("== timed pass begins ==", flush=True)
    return _orig_mb_init(self, *a, **k)


MapBuilder.__init__ = counting_init

t_all = time.monotonic()
val, extras = bench.bench_whole_system()
wall = time.monotonic() - t_all

print("whole_system scans/s (total incl drain):", round(val, 2))
for k, v in extras.items():
    print(f"  {k}: {v}")
print("stats (BOTH passes, warm+timed):")
for k, v in stats.items():
    print(f"  {k}: {round(v, 2) if isinstance(v, float) else v}")
print(f"total wall (warm+timed): {wall:.1f}s")
