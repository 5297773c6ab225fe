"""Delta Lake DELETION VECTOR decoding — the read side of the format
delta-spark >= 3.x writes by default for MERGE/DELETE/UPDATE.

Everything here is implemented from PUBLIC format documents:

* Descriptor schema + storage codecs: Delta PROTOCOL.md §"Deletion
  Vector Descriptor Schema" (github.com/delta-io/delta PROTOCOL.md).
  `storageType` 'u' (UUID-named file relative to the table dir, the
  UUID carried Z85-encoded inside `pathOrInlineDv` after an optional
  random prefix), 'p' (absolute path), 'i' (the serialized bitmap
  itself, Z85-encoded inline).
* On-disk DV file layout (storage 'u'/'p'): 1-byte format version (=1)
  at offset 0; each vector at its descriptor `offset` as <int32 BE
  size><data bytes><int32 BE CRC-32 of the data>.
* The data bytes are a "RoaringBitmapArray" in PORTABLE serialization:
  <int32 LE magic 1681511377><int64 LE bitmap count><each 32-bit
  roaring bitmap in the standard interoperable roaring format
  (github.com/RoaringBitmap/RoaringFormatSpec)>; bitmap i holds the low
  32 bits of 64-bit row indexes whose high 32 bits equal i.
* Z85: the ZeroMQ base-85 codec (rfc.zeromq.org/spec/32) — NOT
  python's base64.b85 alphabet.

The decoder is pure-Python stdlib (struct + zlib.crc32) so executors
can run it inside mapInPandas without extra dependencies: the import
path distributes DV decoding per file rather than funneling every
bitmap through the driver.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib
from typing import Iterator

ROARING_ARRAY_MAGIC = 1681511377
_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUNCONTAINER = 12346
_NO_OFFSET_THRESHOLD = 4

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_decode(s: str) -> bytes:
    """ZeroMQ Z85: 5 chars -> 4 bytes, big-endian base-85."""
    if len(s) % 5:
        raise ValueError(f"Z85 length {len(s)} is not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for c in s[i:i + 5]:
            try:
                acc = acc * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, r = divmod(acc, 85)
            chunk.append(_Z85_ALPHABET[r])
        out += reversed(chunk)
    return "".join(out)


def _roaring32_values(buf: memoryview, pos: int) -> tuple[list[int], int]:
    """Decode ONE 32-bit roaring bitmap in the portable interoperable
    format starting at `pos`; returns (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        nbytes = (size + 7) // 8
        run_flags = bytes(buf[pos:pos + nbytes])
        pos += nbytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUNCONTAINER:
        (size,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap: cookie {cookie}")
    keys_cards = []
    for _ in range(size):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * size  # container offsets — sequential read skips them
    values: list[int] = []
    for idx, (key, card) in enumerate(keys_cards):
        high = key << 16
        is_run = bool(run_flags) and bool(
            run_flags[idx // 8] & (1 << (idx % 8))
        )
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(high | start, (high | start) + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(high | v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                base = high | (wi << 6)
                while w:
                    low = w & -w
                    values.append(base | low.bit_length() - 1)
                    w ^= low
    return values, pos


def roaring_array_positions(data: bytes) -> Iterator[int]:
    """All 64-bit row indexes of a serialized RoaringBitmapArray, in
    ascending order (bitmaps are stored by ascending high-32 key and
    each 32-bit bitmap decodes sorted)."""
    buf = memoryview(data)
    (magic,) = struct.unpack_from("<i", buf, 0)
    if magic != ROARING_ARRAY_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} "
            f"(expected {ROARING_ARRAY_MAGIC})"
        )
    (n_bitmaps,) = struct.unpack_from("<q", buf, 4)
    pos = 12
    for i in range(n_bitmaps):
        values, pos = _roaring32_values(buf, pos)
        high = i << 32
        for v in values:
            yield high | v


def dv_absolute_path(delta_dir: str, descriptor: dict) -> str | None:
    """Filesystem path of an on-disk DV ('u'/'p'); None for inline."""
    storage = descriptor.get("storageType")
    p = descriptor.get("pathOrInlineDv") or ""
    if storage == "p":
        return p
    if storage == "u":
        # <random prefix><20-char Z85 UUID>; the file lives at
        # <table>/<prefix>/deletion_vector_<canonical uuid>.bin
        prefix, enc = p[:-20], p[-20:]
        u = _uuid.UUID(bytes=z85_decode(enc))
        name = f"deletion_vector_{u}.bin"
        return os.path.join(delta_dir, prefix, name) if prefix else (
            os.path.join(delta_dir, name)
        )
    return None


def read_dv_bytes(delta_dir: str, descriptor: dict) -> bytes:
    """The serialized RoaringBitmapArray bytes for one descriptor,
    CRC-verified for on-disk storage. Raises ValueError, BY NAME, for
    storage types or layouts outside the claimed subset."""
    storage = descriptor.get("storageType")
    size = int(descriptor.get("sizeInBytes") or 0)
    if storage == "i":
        data = z85_decode(descriptor.get("pathOrInlineDv") or "")
        if size and len(data) < size:
            raise ValueError(
                f"inline DV decodes to {len(data)} bytes, descriptor "
                f"says {size}"
            )
        return data[:size] if size else data
    if storage not in ("u", "p"):
        raise ValueError(
            f"deletion vector storageType {storage!r} is outside the "
            "claimed subset ('u', 'i', 'p')"
        )
    path = dv_absolute_path(delta_dir, descriptor)
    with open(path, "rb") as fh:
        version = fh.read(1)
        if version != b"\x01":
            raise ValueError(
                f"DV file {path} has format version "
                f"{version and version[0]} — only version 1 is claimed"
            )
        off = descriptor.get("offset")
        if off is not None:
            fh.seek(int(off))
        (stored_size,) = struct.unpack(">i", fh.read(4))
        if size and stored_size != size:
            raise ValueError(
                f"DV at {path} offset {off}: stored size {stored_size} "
                f"!= descriptor sizeInBytes {size}"
            )
        data = fh.read(stored_size)
        (crc,) = struct.unpack(">I", fh.read(4))
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV at {path} offset {off}: CRC mismatch")
        return data


def dv_positions(delta_dir: str, descriptor: dict) -> list[int]:
    """Sorted deleted row indexes for one add's deletionVector."""
    data = read_dv_bytes(delta_dir, descriptor)
    out = list(roaring_array_positions(data))
    card = descriptor.get("cardinality")
    if card is not None and int(card) != len(out):
        raise ValueError(
            f"DV decodes to {len(out)} positions, descriptor cardinality "
            f"says {card}"
        )
    return out


# ---------------------------------------------------------------------------
# WRITE side (round-14): serialize position sets so snapshot_export_delta
# can express outstanding positional tombstones as genuine Delta DVs
# (protocol 3 + readerFeatures=[deletionVectors]) instead of forcing a
# materializing data rewrite. Array/bitmap containers only — the
# portable spec's no-run cookie (12346) makes run containers optional
# for writers; readers (ours included) must handle all three.
# ---------------------------------------------------------------------------


def _serialize_roaring32(values: list[int]) -> bytes:
    """One 32-bit roaring bitmap (portable, no run containers): values
    must be sorted, deduplicated, < 2**32."""
    by_key: dict[int, list[int]] = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    out = bytearray(struct.pack("<II", _SERIAL_COOKIE_NO_RUNCONTAINER,
                                len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    bodies = []
    for k in keys:
        vals = by_key[k]
        if len(vals) <= 4096:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
    off = len(out) + 4 * len(keys)
    for b in bodies:
        out += struct.pack("<I", off)
        off += len(b)
    for b in bodies:
        out += b
    return bytes(out)


def serialize_roaring_array(positions: list[int]) -> bytes:
    """RoaringBitmapArray portable bytes for sorted 64-bit row indexes
    (the exact encoding roaring_array_positions reads back)."""
    by_high: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n = (max(by_high) + 1) if by_high else 0
    out = bytearray(struct.pack("<iq", ROARING_ARRAY_MAGIC, n))
    for i in range(n):
        out += _serialize_roaring32(by_high.get(i, []))
    return bytes(out)


def write_dv_file(
    path: str, blobs: dict[str, bytes]
) -> dict[str, tuple[int, int]]:
    """Write ONE on-disk DV file holding every blob (keyed by an
    arbitrary id): 1-byte format version, then per blob <int32 BE size>
    <data><int32 BE CRC-32>. Returns {id: (offset of the size word,
    size)} for descriptor construction. Written tmp+rename (data
    plane)."""
    import uuid as _uuid_mod

    tmp = path + f".tmp-{_uuid_mod.uuid4().hex}"
    offsets: dict[str, tuple[int, int]] = {}
    try:
        with open(tmp, "wb") as fh:
            fh.write(b"\x01")
            for key in sorted(blobs):
                data = blobs[key]
                offsets[key] = (fh.tell(), len(data))
                fh.write(struct.pack(">i", len(data)))
                fh.write(data)
                fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return offsets
