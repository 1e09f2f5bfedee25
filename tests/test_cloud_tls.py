"""Secure (TLS) channels on the cloud edge (reference:
local_trajectory_uploader.cc:112-118 SSL channel credentials + the server
credential path): loopback TLS for server<->stub and for the two-tier
uplink channel."""

import datetime

import numpy as np
import pytest

from cartographer_tpu.cloud.client import MapBuilderStub
from cartographer_tpu.cloud.server import MapBuilderServer
from cartographer_tpu.core.config import (
    MapBuilderOptions,
    MapBuilderServerOptions,
    TrajectoryBuilderOptions,
    apply_overrides,
)

from test_cloud import drive_scans
from test_local_slam_2d import small_options


@pytest.fixture(scope="module")
def loopback_cert(tmp_path_factory):
    """Self-signed cert for CN=localhost written as PEM files."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(minutes=5))
            .not_valid_after(now + datetime.timedelta(days=1))
            .add_extension(x509.SubjectAlternativeName(
                [x509.DNSName("localhost")]), critical=False)
            .sign(key, hashes.SHA256()))
    d = tmp_path_factory.mktemp("tls")
    key_path = d / "server.key"
    cert_path = d / "server.crt"
    key_path.write_bytes(key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption()))
    cert_path.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    return str(key_path), str(cert_path)


def make_tls_server(loopback_cert, port=0, uplink=""):
    key_path, cert_path = loopback_cert
    tb2 = small_options(**{"submaps.num_range_data": 8,
                           "motion_filter.max_distance_meters": 0.01})
    traj = TrajectoryBuilderOptions(trajectory_builder_2d=tb2)
    mb = apply_overrides(
        MapBuilderOptions(use_trajectory_builder_2d=True,
                          collate_by_trajectory=True),
        {"pose_graph.optimize_every_n_nodes": 0})
    opts = MapBuilderServerOptions(
        map_builder=mb, server_address=f"localhost:{port}",
        uplink_server_address=uplink, upload_batch_size=2,
        enable_ssl_encryption=True,
        ssl_private_key_path=key_path,
        ssl_certificate_path=cert_path,
        ssl_root_certs_path=cert_path)  # self-signed: trust our own cert
    return MapBuilderServer(opts, trajectory_options=traj)


def test_tls_loopback_roundtrip(loopback_cert):
    _, cert_path = loopback_cert
    server = make_tls_server(loopback_cert)
    server.start()
    try:
        stub = MapBuilderStub(f"localhost:{server.port}",
                              ssl_root_certs_path=cert_path)
        tid = stub.add_trajectory_builder(["laser"])
        drive_scans(stub, tid, num=6)
        stub.finish_trajectory(tid)
        assert len(server.map_builder.pose_graph.nodes) >= 4
        stub.close()
    finally:
        server.shutdown()


def test_tls_rejects_unverified_client(loopback_cert):
    """A plaintext client against the TLS port must fail, proving the
    channel is actually encrypted (not silently falling back)."""
    import grpc

    server = make_tls_server(loopback_cert)
    server.start()
    try:
        stub = MapBuilderStub(f"localhost:{server.port}")  # insecure channel
        with pytest.raises(grpc.RpcError):
            stub.add_trajectory_builder(["laser"])
        stub.close()
    finally:
        server.shutdown()


def test_tls_two_tier_uplink(loopback_cert):
    """Lower-tier server uploads over a TLS uplink channel
    (local_trajectory_uploader.cc:112-118)."""
    import time

    _, cert_path = loopback_cert
    uplink = make_tls_server(loopback_cert)
    uplink.start()
    try:
        lower = make_tls_server(loopback_cert,
                                uplink=f"localhost:{uplink.port}")
        lower.start()
        try:
            stub = MapBuilderStub(f"localhost:{lower.port}",
                                  ssl_root_certs_path=cert_path)
            tid = stub.add_trajectory_builder(["laser"])
            drive_scans(stub, tid, num=18)
            stub.finish_trajectory(tid)
            deadline = time.time() + 30
            while time.time() < deadline:
                if len(uplink.map_builder.pose_graph.nodes) > 0:
                    break
                time.sleep(0.2)
            assert len(uplink.map_builder.pose_graph.nodes) > 0, \
                "no local SLAM results arrived over the TLS uplink"
            stub.close()
        finally:
            lower.shutdown()
    finally:
        uplink.shutdown()
