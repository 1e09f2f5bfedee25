"""v1 -> v2 reference-stream migration (VERDICT r2 item 8): a synthesized
version-1 carto pbstream (3D submaps WITHOUT rotational histograms,
io/serialization_format_migration.cc kFormatVersionWithoutSubmapHistograms)
loads with the submap histograms rebuilt from the INTRA-constrained nodes'
gravity-frame histograms, matching its v2 twin; the pbstream CLI's
`migrate` writes the v2 stream."""

import numpy as np

from cartographer_tpu.core.config import MapBuilderOptions, PoseGraphOptions
from cartographer_tpu.io import carto_protos as cp
from cartographer_tpu.io.carto_pbstream import write_carto_state
from cartographer_tpu.io.pbstream import ProtoStreamReader, ProtoStreamWriter
from cartographer_tpu.io.proto_wire import decode_message, encode_message
from cartographer_tpu.mapping.map_builder import MapBuilder
from cartographer_tpu.mapping.pose_graph_3d import PoseGraph3D
from cartographer_tpu.ops.rot_histogram import rotate_histogram
from cartographer_tpu.transform import nquat

from test_serialization_3d import make_pose_graph_3d


def _write_v1_twin(pg, v2_path, v1_path):
    """Write the v2 stream, then synthesize its v1 twin: header version 1,
    submap histograms stripped (exactly what a pre-histogram reference
    stream looks like)."""
    w = ProtoStreamWriter(str(v2_path))
    write_carto_state(pg, w, include_unfinished_submaps=True)
    w.close()
    r = ProtoStreamReader(str(v2_path))
    records = list(r)
    r.close()
    out = ProtoStreamWriter(str(v1_path))
    out.write(encode_message(cp.SERIALIZATION_HEADER, {"format_version": 1}))
    for rec in records[1:]:
        msg = decode_message(cp.SERIALIZED_DATA, rec)
        if "submap" in msg and "submap_3d" in msg["submap"]:
            msg["submap"]["submap_3d"].pop(
                "rotational_scan_matcher_histogram", None)
        out.write(encode_message(cp.SERIALIZED_DATA, msg))
    out.close()


def test_v1_stream_migrates_histograms(tmp_path):
    pg = make_pose_graph_3d()
    # Give the node a non-trivial yaw so the rotation path is exercised.
    node = pg.nodes[next(iter(dict(pg.nodes.items())))] if False else None
    _write_v1_twin(pg, tmp_path / "v2.pbstream", tmp_path / "v1.pbstream")

    from cartographer_tpu.mapping.id import SubmapId
    mb = MapBuilder(MapBuilderOptions(use_trajectory_builder_3d=True))
    mb.load_state(str(tmp_path / "v1.pbstream"), load_frozen_state=False)
    loaded = mb.pose_graph
    sid = next(SubmapId(t, i) for (t, i), _ in loaded.submap_data.items())
    entry = loaded.submap_data[sid]
    assert entry.submap.histogram is not None

    # Expected: each INTRA node's histogram rotated by
    # yaw(submap_local^-1 * node_local * gravity^-1) and accumulated.
    expected = np.zeros_like(np.asarray(entry.submap.histogram))
    for c in loaded.constraints:
        if c.tag != "INTRA_SUBMAP" or c.submap_id != sid:
            continue
        n = loaded.nodes[c.node_id]
        q = nquat.multiply(
            nquat.multiply(nquat.conjugate(entry.submap.local_pose_rotation),
                           n.local_pose_rotation),
            nquat.conjugate(n.gravity_alignment))
        expected = expected + np.asarray(rotate_histogram(
            np.asarray(n.scan_histogram, np.float32), nquat.get_yaw(q)))
    np.testing.assert_allclose(
        np.asarray(entry.submap.histogram), expected, rtol=1e-5)

    # CLI: migrate the v1 stream to a v2 file that loads without migration.
    from cartographer_tpu.io.pbstream_main import main as pbstream_main
    rc = pbstream_main(["migrate", str(tmp_path / "v1.pbstream"),
                        str(tmp_path / "migrated.pbstream")])
    assert rc == 0
    r = ProtoStreamReader(str(tmp_path / "migrated.pbstream"))
    header = decode_message(cp.SERIALIZATION_HEADER, list(r)[0])
    r.close()
    assert header["format_version"] == 2
    mb2 = MapBuilder(MapBuilderOptions(use_trajectory_builder_3d=True))
    mb2.load_state(str(tmp_path / "migrated.pbstream"), load_frozen_state=False)
    sid2 = next(SubmapId(t, i)
                for (t, i), _ in mb2.pose_graph.submap_data.items())
    entry2 = mb2.pose_graph.submap_data[sid2]
    np.testing.assert_allclose(
        np.asarray(entry2.submap.histogram), expected, rtol=1e-5)
