"""Deletion-vector decoder (ops/delta_dv.py) pinned against a
REFERENCE SERIALIZER written in this test from the public format specs
(Delta PROTOCOL.md DV layout; RoaringFormatSpec portable encoding;
ZeroMQ Z85). The serializer shares no code with the decoder, so a
misread of either spec fails loudly instead of cancelling out."""

from __future__ import annotations

import os
import struct
import uuid
import zlib

import pytest

from e02_spark.ops.delta_dv import (
    ROARING_ARRAY_MAGIC,
    dv_positions,
    read_dv_bytes,
    roaring_array_positions,
    z85_decode,
    z85_encode,
)


def _serialize_roaring32(values, force_runs=False):
    """One 32-bit roaring bitmap, portable format (RoaringFormatSpec):
    array containers <=4096 cardinality, bitmap above, runs on demand."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    size = len(keys)
    out = bytearray()
    # an EMPTY bitmap (gap high-word in a sparse 64-bit set) cannot be
    # run-encoded: the run cookie stores size-1 in its upper 16 bits, so
    # size 0 is unrepresentable — the reference RoaringBitmap serializer
    # likewise always writes an empty bitmap with the no-run cookie
    if force_runs and size:
        out += struct.pack("<I", 12347 | ((size - 1) << 16))
        run_flags = bytearray((size + 7) // 8)
        for i in range(size):
            run_flags[i // 8] |= 1 << (i % 8)
        out += run_flags
    else:
        out += struct.pack("<II", 12346, size)
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    # container offsets (present when no-run cookie, or >=4 containers)
    bodies = []
    for k in keys:
        vals = by_key[k]
        if force_runs:
            runs = []
            start = prev = vals[0]
            for v in vals[1:]:
                if v == prev + 1:
                    prev = v
                    continue
                runs.append((start, prev - start))
                start = prev = v
            runs.append((start, prev - start))
            body = struct.pack("<H", len(runs))
            for s, ln in runs:
                body += struct.pack("<HH", s, ln)
        elif len(vals) <= 4096:
            body = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            body = struct.pack("<1024Q", *words)
        bodies.append(body)
    if (not force_runs) or size >= 4:
        off = len(out) + 4 * size
        for b in bodies:
            out += struct.pack("<I", off)
            off += len(b)
    for b in bodies:
        out += b
    return bytes(out)


def serialize_dv(positions, force_runs=False):
    """RoaringBitmapArray portable bytes for 64-bit row indexes."""
    by_high: dict[int, list[int]] = {}
    for p in sorted(positions):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n = (max(by_high) + 1) if by_high else 0
    out = struct.pack("<iq", ROARING_ARRAY_MAGIC, n)
    for i in range(n):
        out += _serialize_roaring32(by_high.get(i, []),
                                    force_runs=force_runs)
    return out


def write_dv_file(path, blobs):
    """On-disk DV file: version byte + per-blob <i32 BE size><data>
    <i32 BE crc>. Returns the byte offset of each blob's size word."""
    offsets = []
    with open(path, "wb") as fh:
        fh.write(b"\x01")
        for data in blobs:
            offsets.append(fh.tell())
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return offsets


def test_z85_roundtrip_and_spec_vector():
    # the Z85 spec's own reference vector (rfc.zeromq.org/spec/32)
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F,
                             0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    for n in (4, 16, 64):
        data = bytes(range(n))
        assert z85_decode(z85_encode(data)) == data


@pytest.mark.parametrize("force_runs", [False, True])
def test_roaring_array_roundtrip_all_container_kinds(force_runs):
    # array container (sparse), bitmap container (dense, card > 4096),
    # a second 16-bit key block, and a second BITMAP (high-32 bits set)
    positions = (
        [3, 17, 4095]
        + list(range(65536, 65536 + 5000))        # dense block, key 1
        + [1 << 20, (1 << 20) + 7]
        + [(1 << 32) + 42, (1 << 32) + 43, (1 << 32) + 44]
    )
    data = serialize_dv(positions, force_runs=force_runs)
    assert list(roaring_array_positions(data)) == sorted(positions)


def test_roaring_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        list(roaring_array_positions(struct.pack("<iq", 99, 0)))


def test_dv_file_read_with_offsets_and_crc(tmp_path):
    d1 = serialize_dv([1, 5, 9])
    d2 = serialize_dv(list(range(100, 200)), force_runs=True)
    path = str(tmp_path / "deletion_vector_test.bin")
    off1, off2 = write_dv_file(path, [d1, d2])
    desc2 = {"storageType": "p", "pathOrInlineDv": path,
             "offset": off2, "sizeInBytes": len(d2), "cardinality": 100}
    assert dv_positions(str(tmp_path), desc2) == list(range(100, 200))
    desc1 = {"storageType": "p", "pathOrInlineDv": path,
             "offset": off1, "sizeInBytes": len(d1), "cardinality": 3}
    assert dv_positions(str(tmp_path), desc1) == [1, 5, 9]
    # corrupt one data byte -> CRC refusal
    with open(path, "r+b") as fh:
        fh.seek(off1 + 4 + 2)
        b = fh.read(1)
        fh.seek(off1 + 4 + 2)
        fh.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="CRC"):
        dv_positions(str(tmp_path), desc1)


def test_dv_uuid_storage_type(tmp_path):
    """storageType 'u': pathOrInlineDv = <prefix><Z85 uuid>, file at
    <table>/<prefix>/deletion_vector_<uuid>.bin."""
    u = uuid.UUID(int=0x123456789ABCDEF0FEDCBA9876543210)
    prefix = "ab"
    os.makedirs(tmp_path / prefix)
    data = serialize_dv([0, 2, 4])
    (off,) = write_dv_file(
        str(tmp_path / prefix / f"deletion_vector_{u}.bin"), [data]
    )
    desc = {"storageType": "u",
            "pathOrInlineDv": prefix + z85_encode(u.bytes),
            "offset": off, "sizeInBytes": len(data), "cardinality": 3}
    assert dv_positions(str(tmp_path), desc) == [0, 2, 4]


def test_dv_inline_storage_type():
    data = serialize_dv([7, 8, 9])
    # writers zero-pad to Z85's 4-byte alignment; sizeInBytes records
    # the true length and the decoder truncates the padding away
    padded = data + b"\x00" * (-len(data) % 4)
    desc = {"storageType": "i", "pathOrInlineDv": z85_encode(padded),
            "sizeInBytes": len(data), "cardinality": 3}
    assert dv_positions("/nonexistent", desc) == [7, 8, 9]


def test_dv_refusals_by_name(tmp_path):
    with pytest.raises(ValueError, match="storageType"):
        read_dv_bytes(str(tmp_path), {"storageType": "x"})
    data = serialize_dv([1])
    path = str(tmp_path / "dv.bin")
    (off,) = write_dv_file(path, [data])
    with open(path, "r+b") as fh:
        fh.write(b"\x02")  # unsupported format version
    with pytest.raises(ValueError, match="version"):
        read_dv_bytes(str(tmp_path), {
            "storageType": "p", "pathOrInlineDv": path, "offset": off,
            "sizeInBytes": len(data)})
    # cardinality mismatch is a refusal, not a silent partial read
    (off,) = write_dv_file(path, [data])
    with pytest.raises(ValueError, match="cardinality"):
        dv_positions(str(tmp_path), {
            "storageType": "p", "pathOrInlineDv": path, "offset": off,
            "sizeInBytes": len(data), "cardinality": 5})


# ---------------------------------------------------------------------------
# Property tests: codec roundtrips over adversarial position sets.
# ---------------------------------------------------------------------------

from hypothesis import example, given, settings
from hypothesis import strategies as st

from e02_spark.ops.delta_dv import serialize_roaring_array


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 33) - 1),
                max_size=400))
def test_product_serializer_roundtrips_any_position_set(positions):
    expect = sorted(set(positions))
    data = serialize_roaring_array(positions)
    assert list(roaring_array_positions(data)) == expect


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 33) - 1),
                max_size=400),
       st.booleans())
@example(positions=[4_294_967_296], force_runs=True)  # empty gap bucket
def test_reference_serializer_decodes_identically(positions, force_runs):
    """The test-file reference serializer (runs optional) and the
    product serializer agree with the product decoder on every set —
    and byte-identically with each other in the no-run form."""
    expect = sorted(set(positions))
    ref = serialize_dv(expect, force_runs=force_runs)
    assert list(roaring_array_positions(ref)) == expect
    if not force_runs:
        assert ref == serialize_roaring_array(positions)


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=4, max_size=64).map(
    lambda b: b + b"\x00" * (-len(b) % 4)))
def test_z85_roundtrips_any_padded_bytes(data):
    assert z85_decode(z85_encode(data)) == data
