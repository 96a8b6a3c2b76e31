"""Property tests for the deletion-vector codec layer (Z85, Delta
RoaringBitmapArray, DV file framing) — pure Python, no Spark."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_glue_data_lake_spark.roaring64 import (
    _serialize_rb32,
    deserialize_positions,
    read_dv_blob,
    serialize_positions,
    write_dv_file,
    z85_decode,
    z85_encode,
)


# -- Z85 --------------------------------------------------------------------
@given(st.binary(min_size=0, max_size=64).map(lambda b: b[: len(b) - len(b) % 4]))
def test_z85_roundtrip(data):
    assert z85_decode(z85_encode(data)) == data


def test_z85_rfc_vector():
    # ZeroMQ RFC 32's worked example
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )


def test_z85_rejects_bad_length_and_chars():
    with pytest.raises(ValueError):
        z85_encode(b"abc")
    with pytest.raises(ValueError):
        z85_decode("abcd")
    with pytest.raises(ValueError):
        z85_decode('abcd"')  # '"' is not in the alphabet


# -- RoaringBitmapArray -----------------------------------------------------
@settings(max_examples=200)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**33),  # spans >1 high bucket
        min_size=0,
        max_size=300,
    )
)
def test_positions_roundtrip(positions):
    blob = serialize_positions(positions)
    assert deserialize_positions(blob) == sorted(set(positions))


def test_dense_container_roundtrip():
    # >4096 values in one 16-bit chunk forces the bitset container path
    vals = list(range(0, 10000, 2)) + [1 << 32, (1 << 32) + 5]
    assert deserialize_positions(serialize_positions(vals)) == sorted(vals)


def test_empty_bucket_gap_roundtrip():
    # high-bucket 0 empty, members only in bucket 2: indices stay aligned
    vals = [2 << 32, (2 << 32) + 1]
    assert deserialize_positions(serialize_positions(vals)) == vals


def test_run_container_decodes():
    """The encoder never emits run containers, but a conforming reader
    must accept them (cookie 12347 + run flag): hand-build one."""
    # one container, key 0, run [5, 14] (10 values)
    buf = bytearray()
    buf += struct.pack("<I", 12347 | (0 << 16))  # cookie, n_containers-1=0
    buf += bytes([0b1])  # run flag for container 0
    buf += struct.pack("<HH", 0, 9)  # key 0, cardinality-1
    # < NO_OFFSET_THRESHOLD containers with the run cookie: no offsets
    buf += struct.pack("<H", 1)  # 1 run
    buf += struct.pack("<HH", 5, 9)  # start 5, length-1 9
    blob = struct.pack("<I", 1681511377) + struct.pack("<Q", 1) + bytes(buf)
    assert deserialize_positions(blob) == list(range(5, 15))


def test_rb32_array_form_is_canonical():
    # a small container serializes as cookie 12346 with an offset header
    raw = _serialize_rb32([1, 2, 70000])
    (cookie,) = struct.unpack_from("<I", raw, 0)
    assert cookie == 12346


def test_rejects_bad_magic():
    with pytest.raises(ValueError):
        deserialize_positions(b"\x00\x00\x00\x00" + b"\x00" * 8)


# -- DV file framing --------------------------------------------------------
def test_dv_file_roundtrip(tmp_path):
    p = str(tmp_path / "deletion_vector_test.bin")
    b1 = serialize_positions([1, 2, 3])
    b2 = serialize_positions(range(0, 9000))
    spans = write_dv_file(p, [b1, b2])
    assert spans[0][0] == 1  # first blob right after the version byte
    for (off, size), blob in zip(spans, [b1, b2]):
        assert read_dv_blob(p, off, size) == blob


def test_dv_file_checksum_guard(tmp_path):
    p = str(tmp_path / "deletion_vector_bad.bin")
    blob = serialize_positions([7])
    ((off, size),) = write_dv_file(p, [blob])
    data = bytearray(open(p, "rb").read())
    data[off + 4 + 1] ^= 0xFF  # corrupt a payload byte
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="checksum"):
        read_dv_blob(p, off, size)
