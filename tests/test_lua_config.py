"""Lua config importer tests — including the config-regression pattern of the
reference (common/configuration_files_test.cc): every shipped reference Lua
file must resolve into our options without error and with matching values."""

import math
import os

import pytest

from cartographer_tpu.core.lua_config import (
    load_lua_file,
    load_options,
    map_builder_from_lua,
    pose_graph_from_lua,
)

REF_DIR = "/root/reference/configuration_files"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference configs not available")


class TestInterpreter:
    def test_basic_table(self, tmp_path):
        f = tmp_path / "a.lua"
        f.write_text('X = { a = 1, b = 2.5, c = "s", d = true, e = { f = -3 } }\n')
        env = load_lua_file(str(f), [])
        assert env["X"] == {"a": 1, "b": 2.5, "c": "s", "d": True, "e": {"f": -3}}

    def test_math_rad_and_arithmetic(self, tmp_path):
        f = tmp_path / "a.lua"
        f.write_text("X = { w = math.rad(30.), y = 2. * 3. + 1. }\n")
        env = load_lua_file(str(f), [])
        assert abs(env["X"]["w"] - math.radians(30)) < 1e-12
        assert env["X"]["y"] == 7.0

    def test_include_and_reference(self, tmp_path):
        (tmp_path / "base.lua").write_text("BASE = { v = 5 }\n")
        f = tmp_path / "main.lua"
        f.write_text('include "base.lua"\nMAIN = { base = BASE, w = BASE.v }\n')
        env = load_lua_file(str(f), [str(tmp_path)])
        assert env["MAIN"]["w"] == 5
        assert env["MAIN"]["base"]["v"] == 5

    def test_field_assignment(self, tmp_path):
        f = tmp_path / "a.lua"
        f.write_text("X = { a = 1 }\nX.a = 2\nX.b = false\n")
        env = load_lua_file(str(f), [])
        assert env["X"] == {"a": 2, "b": False}

    def test_comments_ignored(self, tmp_path):
        f = tmp_path / "a.lua"
        f.write_text("-- a comment\nX = { a = 1, -- trailing\n}\n")
        assert load_lua_file(str(f), [])["X"] == {"a": 1}


@needs_reference
class TestReferenceConfigs:
    """configuration_files_test.cc equivalent: resolve the reference's
    shipped defaults and compare against our dataclass defaults."""

    def test_trajectory_builder_defaults_match(self):
        _, traj = load_options(
            os.path.join(REF_DIR, "trajectory_builder.lua"), [REF_DIR])
        from cartographer_tpu.core.config import (
            TrajectoryBuilder2DOptions,
            TrajectoryBuilder3DOptions,
        )
        d2 = traj.trajectory_builder_2d
        defaults2 = TrajectoryBuilder2DOptions()
        assert d2.max_range == defaults2.max_range == 30.0
        assert d2.submaps.num_range_data == defaults2.submaps.num_range_data == 90
        assert d2.ceres_scan_matcher.rotation_weight == 40.0
        assert d2.ceres_scan_matcher.max_num_iterations == 20
        d3 = traj.trajectory_builder_3d
        assert d3.max_range == 60.0
        assert d3.submaps.high_resolution == 0.10
        assert d3.ceres_scan_matcher.occupied_space_weight_1 == 6.0
        assert d3.rotational_histogram_size == 120

    def test_map_builder_defaults_match(self):
        env = load_lua_file(os.path.join(REF_DIR, "map_builder.lua"), [REF_DIR])
        mb = map_builder_from_lua(env["MAP_BUILDER"])
        assert mb.num_background_threads == 4
        pg = mb.pose_graph
        assert pg.optimize_every_n_nodes == 90
        assert pg.constraint_builder.min_score == 0.55
        assert pg.constraint_builder.sampling_ratio == 0.3
        assert pg.constraint_builder.fast_correlative_scan_matcher.linear_search_window == 7.0
        assert pg.constraint_builder.fast_correlative_scan_matcher_3d.min_rotational_score == 0.77
        assert pg.optimization_problem.huber_scale == 10.0
        assert pg.optimization_problem.odometry_translation_weight == 1e5
        assert pg.max_num_final_iterations == 200

    def test_server_config(self):
        env = load_lua_file(
            os.path.join(REF_DIR, "map_builder_server.lua"), [REF_DIR])
        s = env["MAP_BUILDER_SERVER"]
        assert s["server_address"] == "0.0.0.0:50051"
        assert s["upload_batch_size"] == 100
        # The file flips collate_by_trajectory after the table definition.
        assert env["MAP_BUILDER"]["collate_by_trajectory"] is True
