"""RangeDataCollator: multi-sensor merge with per-point origins.

Mirrors mapping/internal/range_data_collator_test.cc: at most one pending
message per sensor; merged batches are cropped to (current_start,
current_end], globally time-sorted, and carry per-point origins
(TimedPointCloudOriginData semantics) plus zero-filled intensities.
"""

import numpy as np

from cartographer_tpu.core.time import from_seconds
from cartographer_tpu.mapping.range_data_collator import RangeDataCollator
from cartographer_tpu.sensor.data import TimedPointCloudData


def _scan(t_end_s, origin, n=5, span_s=0.1, value=0.0, intensities=None):
    times = np.linspace(-span_s, 0.0, n).astype(np.float32)
    ranges = np.full((n, 3), value, np.float32)
    ranges[:, 0] = np.arange(n)
    return TimedPointCloudData(
        time=from_seconds(t_end_s), origin=np.asarray(origin, np.float32),
        ranges=ranges, times=times, intensities=intensities)


def test_single_sensor_passthrough():
    c = RangeDataCollator(["a"])
    data = _scan(1.0, [0.1, 0.0, 0.0])
    out = c.add_range_data("a", data)
    assert out == [data]


def test_two_sensors_merge_with_per_point_origins():
    c = RangeDataCollator(["a", "b"])
    origin_a = [1.0, 0.0, 0.0]
    origin_b = [0.0, 2.0, 0.0]
    assert c.add_range_data("a", _scan(1.0, origin_a)) == []
    out = c.add_range_data("b", _scan(1.02, origin_b))
    assert len(out) == 1
    batch = out[0]
    # cropped at min(end times) = sensor a's stamp
    assert batch.time == from_seconds(1.0)
    assert batch.origins is not None and batch.origins.shape[1] == 3
    # every point carries the origin of the sensor it came from
    origins = {tuple(np.round(o, 3)) for o in batch.origins}
    assert (1.0, 0.0, 0.0) in origins and (0.0, 2.0, 0.0) in origins
    # globally time-sorted (range_data_collator.cc:124)
    assert np.all(np.diff(batch.times) >= 0)
    # intensities zero-filled when absent (kDefaultIntensityValue)
    assert batch.intensities is not None
    np.testing.assert_array_equal(batch.intensities, 0.0)


def test_second_message_for_same_sensor_flushes_pending():
    c = RangeDataCollator(["a", "b"])
    assert c.add_range_data("a", _scan(1.0, [0, 0, 0])) == []
    out = c.add_range_data("a", _scan(1.1, [0, 0, 0]))
    # the pending "a" window is emitted before buffering the new message
    assert len(out) == 1
    assert out[0].time == from_seconds(1.0)


def test_crop_excludes_already_emitted_window():
    c = RangeDataCollator(["a", "b"])
    c.add_range_data("a", _scan(1.0, [0, 0, 0]))
    first = c.add_range_data("b", _scan(1.0, [0, 0, 0], span_s=0.3))[0]
    # sensor b had points before 0.7s..1.0s window? all points <= 1.0 kept
    n_first = first.ranges.shape[0]
    out = c.add_range_data("a", _scan(1.2, [0, 0, 0]))
    out += c.add_range_data("b", _scan(1.2, [0, 0, 0]))
    later = [b for batches in [out] for b in batches]
    for b in later:
        abs_times = b.time + (b.times * 1e6).astype(np.int64)
        assert np.all(abs_times > from_seconds(1.0))
    assert n_first == 10


def test_local_slam_2d_two_range_sensors():
    """End-to-end: two horizontally-offset lidars feed one 2D frontend."""
    from cartographer_tpu.mapping.local_trajectory_builder_2d import LocalTrajectoryBuilder2D
    from test_local_slam_2d import small_options, make_wall_points, scan_at

    opts = small_options()
    builder = LocalTrajectoryBuilder2D(opts, ["left", "right"])
    world = make_wall_points()
    results = []
    for i in range(10):
        x = 0.05 * i
        t = 1_000_000_000 + from_seconds(0.1 * i)
        scan = scan_at(world, np.array([x, 0.0]), 0.0)
        half = scan.shape[0] // 2
        for sid, pts, dt in (("left", scan[:half], 0.0), ("right", scan[half:], 0.02)):
            data = TimedPointCloudData(
                time=t + from_seconds(dt), origin=np.zeros(3, np.float32),
                ranges=pts.astype(np.float32),
                times=np.zeros(pts.shape[0], np.float32))
            r = builder.add_range_data(sid, data)
            if r is not None:
                results.append(r)
    assert len(results) >= 8
    final = results[-1].local_pose_translation[:2]
    # merged batches land between the two sensor stamps; the frontend should
    # still track the forward motion
    assert abs(final[0] - 0.05 * 9) < 0.1, final
    assert abs(final[1]) < 0.05
