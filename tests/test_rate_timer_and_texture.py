"""RateTimer + GetSubmapTexture RPC tests."""

import time

import numpy as np

from cartographer_tpu.core.rate_timer import RateTimer
from cartographer_tpu.core.time import from_seconds


class TestRateTimer:
    def test_event_rate(self):
        rt = RateTimer()
        t0 = 1_000_000_000
        for i in range(11):
            rt.pulse(t0 + from_seconds(i * 0.1))
        assert abs(rt.compute_rate() - 10.0) < 0.01

    def test_needs_two_events(self):
        rt = RateTimer()
        assert rt.compute_rate() == 0.0
        rt.pulse(0)
        assert rt.compute_rate() == 0.0


class TestSubmapTextureRpc:
    def test_texture_roundtrip(self):
        import grpc
        import pytest

        from cartographer_tpu.cloud.client import MapBuilderStub
        from test_cloud import drive_scans, make_server

        server = make_server()
        server.start()
        try:
            stub = MapBuilderStub(f"localhost:{server.port}")
            tid = stub.add_trajectory_builder(["laser"])
            # num_range_data=8 -> submap 0 finishes after 16 inserts.
            drive_scans(stub, tid, num=18)
            stub.finish_trajectory(tid)
            tex = stub.pose_graph.get_submap_texture(tid, 0)
            assert tex["width"] > 0 and tex["height"] > 0
            img = np.frombuffer(tex["cells"], np.uint8).reshape(
                tex["height"], tex["width"])
            assert img.min() < 100  # occupied
            assert tex["resolution"] == 0.05
            # Unknown submap -> NOT_FOUND.
            with pytest.raises(grpc.RpcError):
                stub.pose_graph.get_submap_texture(tid, 99)
            stub.close()
        finally:
            server.shutdown()
