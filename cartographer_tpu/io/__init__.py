"""Serialization & map post-processing (reference: cartographer/io/, SURVEY.md §2.7)."""

from cartographer_tpu.io.pbstream import ProtoStreamReader, ProtoStreamWriter
from cartographer_tpu.io.serialization import (
    SERIALIZATION_FORMAT_VERSION,
    load_state,
    serialize_state,
)
