"""DetectFloors + print_configuration CLI tests."""

import numpy as np

from cartographer_tpu.mapping.detect_floors import detect_floors


class TestDetectFloors:
    def test_single_floor(self):
        times = list(range(100))
        zs = list(0.02 * np.random.RandomState(0).randn(100))
        floors = detect_floors(times, zs)
        assert len(floors) == 1
        assert abs(floors[0].z) < 0.1

    def test_two_floors(self):
        rng = np.random.RandomState(1)
        zs = ([0.0 + 0.02 * rng.randn() for _ in range(50)]
              + [3.0 + 0.02 * rng.randn() for _ in range(50)]
              + [0.0 + 0.02 * rng.randn() for _ in range(50)])
        times = list(range(len(zs)))
        floors = detect_floors(times, zs)
        assert len(floors) == 2
        assert abs(floors[0].z - 0.0) < 0.2
        assert abs(floors[1].z - 3.0) < 0.2
        # Ground floor has two separate timespans (before and after).
        assert len(floors[0].timespans) == 2

    def test_empty(self):
        assert detect_floors([], []) == []


class TestPrintConfiguration:
    def test_defaults(self, capsys):
        from cartographer_tpu.core.print_configuration_main import main

        assert main(["--defaults"]) == 0
        out = capsys.readouterr().out
        assert "MAP_BUILDER" in out
        assert "optimize_every_n_nodes = 90" in out
        assert "num_range_data = 90" in out

    def test_resolves_reference_lua(self, capsys):
        import os
        ref = "/root/reference/configuration_files"
        if not os.path.isdir(ref):
            return
        from cartographer_tpu.core.print_configuration_main import main

        assert main(["--configuration_directory", ref,
                     "--configuration_basename", "map_builder.lua"]) == 0
        out = capsys.readouterr().out
        assert "huber_scale = 10.0" in out
