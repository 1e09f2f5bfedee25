"""Lua configuration importer.

Reference: cartographer/common/lua_parameter_dictionary.cc +
configuration_file_resolver.cc — configs are Lua files producing global
tables (MAP_BUILDER, TRAJECTORY_BUILDER, ...). This module implements a
small interpreter for the subset those files use (assignments, nested
tables, include "x.lua", math.rad, numeric/string/bool literals, variable
references, field assignments like `MAP_BUILDER.collate_by_trajectory =
true`) and converts the resulting dict trees into the dataclass options of
core.config. The reference's shipped configuration_files/ load unmodified.
"""

from __future__ import annotations

import dataclasses
import math
import os
import re
from typing import Any, Dict, List, Optional

from cartographer_tpu.core import config as cfg

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>--[^\n]*)
  | (?P<string>"[^"]*")
  | (?P<number>-?\d+\.?\d*(?:[eE][+-]?\d+)?|-?\.\d+)
  | (?P<name>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<op>[{}=,()\[\]*/+-])
  | (?P<ws>\s+)
  | (?P<semi>;)
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> List[str]:
    tokens = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"lua parse error at {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("comment", "ws", "semi"):
            continue
        tokens.append(m.group())
    return tokens


class _Parser:
    def __init__(self, tokens: List[str], env: Dict[str, Any]):
        self.tokens = tokens
        self.i = 0
        self.env = env

    def peek(self) -> Optional[str]:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> str:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise ValueError(f"expected {tok!r}, got {got!r}")

    # expression := term (('+'|'-') term)*
    def parse_expression(self):
        value = self.parse_term()
        while self.peek() in ("+", "-"):
            op = self.next()
            rhs = self.parse_term()
            value = value + rhs if op == "+" else value - rhs
        return value

    def parse_term(self):
        value = self.parse_atom()
        while self.peek() in ("*", "/"):
            op = self.next()
            rhs = self.parse_atom()
            value = value * rhs if op == "*" else value / rhs
        return value

    def parse_atom(self):
        tok = self.next()
        if tok == "{":
            return self.parse_table_body()
        if tok == "(":
            v = self.parse_expression()
            self.expect(")")
            return v
        if tok.startswith('"'):
            return tok[1:-1]
        if tok == "true":
            return True
        if tok == "false":
            return False
        if re.fullmatch(r"-?\d+", tok):
            return int(tok)
        if re.fullmatch(r"-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", tok):
            return float(tok)
        if tok == "math.rad":
            self.expect("(")
            v = self.parse_expression()
            self.expect(")")
            return math.radians(v)
        if tok == "math.pi":
            return math.pi
        # Variable reference (possibly dotted).
        value = self._lookup(tok)
        return value

    def _lookup(self, dotted: str):
        parts = dotted.split(".")
        if parts[0] not in self.env:
            raise KeyError(f"unknown lua variable {dotted}")
        value = self.env[parts[0]]
        for p in parts[1:]:
            value = value[p]
        return value

    def parse_table_body(self) -> Dict[str, Any]:
        table: Dict[str, Any] = {}
        index = 1
        while True:
            tok = self.peek()
            if tok == "}":
                self.next()
                return table
            if tok == ",":
                self.next()
                continue
            # key = value  |  ["key"] = value  |  positional value
            if tok == "[":
                self.next()
                key = self.next()[1:-1]
                self.expect("]")
                self.expect("=")
                table[key] = self.parse_expression()
            elif (re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", tok or "")
                  and self.i + 1 < len(self.tokens)
                  and self.tokens[self.i + 1] == "="):
                key = self.next()
                self.expect("=")
                table[key] = self.parse_expression()
            else:
                table[str(index)] = self.parse_expression()
                index += 1


def load_lua_file(filename: str, include_dirs: List[str],
                  env: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Evaluate a Lua config file; returns the global environment."""
    env = env if env is not None else {}
    path = None
    for d in [os.path.dirname(filename)] + list(include_dirs):
        candidate = filename if os.path.isabs(filename) else os.path.join(d, os.path.basename(filename))
        if os.path.exists(candidate):
            path = candidate
            break
    if path is None:
        raise FileNotFoundError(filename)
    text = open(path).read()

    # Handle include "x.lua" lines first (ConfigurationFileResolver).
    def do_include(m):
        load_lua_file(m.group(1), include_dirs + [os.path.dirname(path)], env)
        return ""

    text = re.sub(r'include\s+"([^"]+)"', do_include, text)
    tokens = _tokenize(text)
    parser = _Parser(tokens, env)
    while parser.peek() is not None:
        name = parser.next()
        parser.expect("=")
        value = parser.parse_expression()
        if "." in name:
            parts = name.split(".")
            target = env[parts[0]]
            for p in parts[1:-1]:
                target = target[p]
            target[parts[-1]] = value
        else:
            env[name] = value
    return env


# ---------------------------------------------------------------------------
# dict -> dataclass conversion
# ---------------------------------------------------------------------------

_RENAMES_2D = {
    # Lua name -> (dataclass path transformations handled in _apply below)
}


def _fill(options, values: Dict[str, Any], skip=()):
    """Recursively overlay a lua dict onto a frozen dataclass."""
    for key, value in values.items():
        if key in skip or not hasattr(options, key):
            continue
        current = getattr(options, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            options = dataclasses.replace(options, **{key: _fill(current, value)})
        elif not isinstance(value, dict):
            options = dataclasses.replace(options, **{key: value})
    return options


def _pose_extrapolator_from_lua(opts, pe: Dict[str, Any]):
    if "use_imu_based" in pe:
        opts = dataclasses.replace(opts, use_imu_based=pe["use_imu_based"])
    if "constant_velocity" in pe:
        opts = dataclasses.replace(
            opts, constant_velocity=_fill(opts.constant_velocity,
                                          pe["constant_velocity"]))
    if "imu_based" in pe:
        ib = pe["imu_based"]
        new_ib = _fill(opts.imu_based, ib, skip=("solver_options",))
        if "solver_options" in ib:
            new_ib = dataclasses.replace(
                new_ib, max_num_iterations=int(
                    ib["solver_options"].get("max_num_iterations",
                                             new_ib.max_num_iterations)))
        opts = dataclasses.replace(opts, imu_based=new_ib)
    return opts


def trajectory_builder_2d_from_lua(d: Dict[str, Any]) -> cfg.TrajectoryBuilder2DOptions:
    opts = cfg.TrajectoryBuilder2DOptions()
    opts = _fill(opts, d, skip=("submaps", "ceres_scan_matcher", "pose_extrapolator"))
    if "ceres_scan_matcher" in d:
        csm = d["ceres_scan_matcher"]
        new = _fill(opts.ceres_scan_matcher, csm, skip=("ceres_solver_options",))
        if "ceres_solver_options" in csm:
            cso = csm["ceres_solver_options"]
            # num_threads intentionally ignored: the TPU build batches work
            # on-device instead of threading the solver.
            new = dataclasses.replace(
                new,
                max_num_iterations=int(
                    cso.get("max_num_iterations", new.max_num_iterations)),
                use_nonmonotonic_steps=bool(
                    cso.get("use_nonmonotonic_steps",
                            new.use_nonmonotonic_steps)))
        opts = dataclasses.replace(opts, ceres_scan_matcher=new)
    if "pose_extrapolator" in d:
        opts = dataclasses.replace(opts, pose_extrapolator=_pose_extrapolator_from_lua(
            opts.pose_extrapolator, d["pose_extrapolator"]))
    if "submaps" in d:
        sm = d["submaps"]
        new_sm = _fill(opts.submaps, sm, skip=("grid_options_2d", "range_data_inserter"))
        if "grid_options_2d" in sm:
            g = sm["grid_options_2d"]
            new_sm = dataclasses.replace(
                new_sm, grid_type=g.get("grid_type", new_sm.grid_type),
                resolution=g.get("resolution", new_sm.resolution))
        if "range_data_inserter" in sm:
            rdi = sm["range_data_inserter"]
            new_sm = dataclasses.replace(
                new_sm,
                range_data_inserter_type=rdi.get(
                    "range_data_inserter_type", new_sm.range_data_inserter_type),
                probability_grid_range_data_inserter=_fill(
                    new_sm.probability_grid_range_data_inserter,
                    rdi.get("probability_grid_range_data_inserter", {})),
                tsdf_range_data_inserter=_fill(
                    new_sm.tsdf_range_data_inserter,
                    rdi.get("tsdf_range_data_inserter", {}),
                    skip=("normal_estimation_options",)))
        opts = dataclasses.replace(opts, submaps=new_sm)
    return opts


def trajectory_builder_3d_from_lua(d: Dict[str, Any]) -> cfg.TrajectoryBuilder3DOptions:
    opts = cfg.TrajectoryBuilder3DOptions()
    opts = _fill(opts, d, skip=("submaps", "ceres_scan_matcher", "pose_extrapolator"))
    if "ceres_scan_matcher" in d:
        csm = d["ceres_scan_matcher"]
        new = _fill(opts.ceres_scan_matcher, csm, skip=("ceres_solver_options",
                                                        "intensity_cost_function_options_0"))
        if "intensity_cost_function_options_0" in csm:
            new = dataclasses.replace(
                new, intensity_cost_function_options_0=_fill(
                    new.intensity_cost_function_options_0,
                    csm["intensity_cost_function_options_0"]))
        if "ceres_solver_options" in csm:
            cso = csm["ceres_solver_options"]
            new = dataclasses.replace(
                new,
                max_num_iterations=int(
                    cso.get("max_num_iterations", new.max_num_iterations)),
                use_nonmonotonic_steps=bool(
                    cso.get("use_nonmonotonic_steps",
                            new.use_nonmonotonic_steps)))
        opts = dataclasses.replace(opts, ceres_scan_matcher=new)
    if "pose_extrapolator" in d:
        opts = dataclasses.replace(opts, pose_extrapolator=_pose_extrapolator_from_lua(
            opts.pose_extrapolator, d["pose_extrapolator"]))
    if "submaps" in d:
        sm = d["submaps"]
        new_sm = _fill(opts.submaps, sm, skip=("range_data_inserter",))
        if "range_data_inserter" in sm:
            new_sm = dataclasses.replace(
                new_sm, range_data_inserter=_fill(
                    new_sm.range_data_inserter, sm["range_data_inserter"]))
        opts = dataclasses.replace(opts, submaps=new_sm)
    return opts


def pose_graph_from_lua(d: Dict[str, Any]) -> cfg.PoseGraphOptions:
    opts = cfg.PoseGraphOptions()
    opts = _fill(opts, d, skip=("constraint_builder", "optimization_problem"))
    if "constraint_builder" in d:
        cb = d["constraint_builder"]
        new_cb = _fill(opts.constraint_builder, cb,
                       skip=("fast_correlative_scan_matcher", "ceres_scan_matcher",
                             "fast_correlative_scan_matcher_3d", "ceres_scan_matcher_3d"))
        new_cb = dataclasses.replace(
            new_cb,
            fast_correlative_scan_matcher=_fill(
                new_cb.fast_correlative_scan_matcher,
                cb.get("fast_correlative_scan_matcher", {})),
            fast_correlative_scan_matcher_3d=_fill(
                new_cb.fast_correlative_scan_matcher_3d,
                cb.get("fast_correlative_scan_matcher_3d", {})))
        for lua_key, attr in [("ceres_scan_matcher", "ceres_scan_matcher"),
                              ("ceres_scan_matcher_3d", "ceres_scan_matcher_3d")]:
            if lua_key in cb:
                csm = cb[lua_key]
                new_matcher = _fill(getattr(new_cb, attr), csm,
                                    skip=("ceres_solver_options",))
                if "ceres_solver_options" in csm:
                    cso = csm["ceres_solver_options"]
                    new_matcher = dataclasses.replace(
                        new_matcher,
                        max_num_iterations=int(cso.get(
                            "max_num_iterations",
                            new_matcher.max_num_iterations)),
                        use_nonmonotonic_steps=bool(cso.get(
                            "use_nonmonotonic_steps",
                            new_matcher.use_nonmonotonic_steps)))
                new_cb = dataclasses.replace(new_cb, **{attr: new_matcher})
        opts = dataclasses.replace(opts, constraint_builder=new_cb)
    if "optimization_problem" in d:
        op = d["optimization_problem"]
        new_op = _fill(opts.optimization_problem, op, skip=("ceres_solver_options",))
        if "ceres_solver_options" in op:
            cso = op["ceres_solver_options"]
            new_op = dataclasses.replace(
                new_op,
                max_num_iterations=int(
                    cso.get("max_num_iterations", new_op.max_num_iterations)),
                use_nonmonotonic_steps=bool(
                    cso.get("use_nonmonotonic_steps",
                            new_op.use_nonmonotonic_steps)),
                num_threads=int(cso.get("num_threads", new_op.num_threads)))
        opts = dataclasses.replace(opts, optimization_problem=new_op)
    return opts


def map_builder_from_lua(d: Dict[str, Any]) -> cfg.MapBuilderOptions:
    opts = cfg.MapBuilderOptions()
    opts = _fill(opts, d, skip=("pose_graph",))
    if "pose_graph" in d:
        opts = dataclasses.replace(
            opts, pose_graph=pose_graph_from_lua(d["pose_graph"]))
    return opts


def load_options(filename: str, include_dirs: List[str]):
    """Resolve a top-level Lua config into (MapBuilderOptions,
    TrajectoryBuilderOptions)."""
    env = load_lua_file(filename, include_dirs)
    mb = map_builder_from_lua(env["MAP_BUILDER"]) if "MAP_BUILDER" in env else None
    traj = None
    if "TRAJECTORY_BUILDER" in env:
        t = env["TRAJECTORY_BUILDER"]
        traj = cfg.TrajectoryBuilderOptions(
            trajectory_builder_2d=trajectory_builder_2d_from_lua(
                t.get("trajectory_builder_2d", {})),
            trajectory_builder_3d=trajectory_builder_3d_from_lua(
                t.get("trajectory_builder_3d", {})),
            collate_fixed_frame=t.get("collate_fixed_frame", True),
            collate_landmarks=t.get("collate_landmarks", False))
    return mb, traj
