"""Per-file BLOOM FILTERS in the manifest entries (point-lookup file
skipping the min/max stats cannot do).

Why: two-level [min,max] pruning (ops/snapshot._plan_files) is exact for
RANGE probes on clustered layouts, but a point probe on an UNCLUSTERED
key keeps almost every file — each file's raw key range spans the whole
domain, so `lo <= v <= hi` holds everywhere even though only one file
actually contains the key. Iceberg solves this with bloom filters in
puffin sidecars; Delta with file-level bloom indexes. Here each manifest
ENTRY optionally carries a small bloom per declared column:

    entry["bloom"] = {col: [m_bits, k_hashes, b64(zlib(bitset))]}

A bloom "no" is DEFINITIVE (no false negatives — the filter was built
from every non-null value in the file), so planning may drop the file; a
"maybe" keeps it, so a false positive only costs an extra scan task,
never a wrong result. The filter applies ONLY to equality probes
(lo == hi); range probes stay on min/max.

Placement trade (vs a sidecar file): blooms ride INSIDE the manifest
shard entries, so every path that already tracks shards — expire/GC,
branch adoption, write-audit-publish, replication clone — carries them
with zero new object kinds and zero new GC edges. The cost is shard
size: m is sized to the file's observed NDV (~10 bits/key ≈ 1% FPP) and
hard-capped at 2^18 bits = 32 KB raw (zlib-compressed in practice), so a
file with more distinct keys than the cap degrades to a coarser FPP,
never to an unbounded manifest. At 100 TB the intended layout is
bucketed/clustered files whose per-file NDV is bounded by design; blooms
there stay near the floor (64-byte minimum) and close exactly the gap
min/max leaves on non-cluster key columns.

Determinism: values hash through a CANONICAL STRING encoding with a type
tag (int/str/bool/date/timestamp/bytes). Types whose Python and JVM
string forms diverge (float, Decimal) are refused on BOTH sides — the
build skips the column, the probe reports "no bloom" — pruning silently
off, never silently wrong (the same posture as _pt_probe for
bucket/truncate transforms, snapshot.py:391).
"""

from __future__ import annotations

import base64
import hashlib
import zlib

_BLOOM_MAX_BITS = 1 << 18  # 32 KB raw per file per column, hard cap
_BLOOM_MIN_BITS = 1 << 9  # 64 bytes — floor so tiny files stay cheap
_BITS_PER_KEY = 10  # ~1% FPP at the classic k = 0.693 * m/n

# INTEGER FAST PATH: plain ints (the overwhelmingly common key type —
# and the one whose per-file NDV is large enough for hashing to matter)
# hash through splitmix64 instead of md5, because the build vectorizes
# over numpy uint64 (~10x the md5 loop). Both sides dispatch on
# `type(v) is int` — bools are NOT ints here (type, not isinstance) and
# keep the tagged md5 path, so True never collides with 1. Negative /
# unsigned values mask to two's-complement uint64 identically in the
# vector build and the scalar probe.
_M64 = (1 << 64) - 1
_SALT1 = 0x243F6A8885A308D3  # pi digits — nothing up the sleeve
_SALT2 = 0x13198A2E03707344


def _mix64(x: int) -> int:
    """Scalar splitmix64 finalizer (probe-side twin of _mix64_vec)."""
    x = x & _M64
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & _M64
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & _M64
    return x ^ (x >> 31)


def _int_hashes(v: int) -> tuple[int, int]:
    x = v & _M64
    return _mix64(x ^ _SALT1), _mix64(x ^ _SALT2) | 1


def bloom_key(v) -> bytes | None:
    """Canonical tagged bytes for a value, or None when the type has no
    cross-engine-stable string form (float/Decimal/unknown) — the caller
    must then skip bloom build/probe for that value's column."""
    import datetime as _dt

    if isinstance(v, bool):  # BEFORE int: bool is an int subclass
        return b"b:true" if v else b"b:false"
    if isinstance(v, int):
        return b"i:" + str(v).encode()
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8")
    if isinstance(v, bytes):
        return b"y:" + v
    if isinstance(v, _dt.datetime):  # BEFORE date: datetime is a date
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return b"t:" + v.isoformat().encode()
    if isinstance(v, _dt.date):
        return b"d:" + v.isoformat().encode()
    return None


def probe_forms(v) -> list:
    """Every encoding a point-probe value may have been STORED under.

    The filter hashes values as pyarrow materialized them (timestamp
    columns -> datetime objects, tag t:), while min/max pruning compares
    the _stat_value-coerced form (isoformat strings) — so a probe that
    PASSES range pruning can still carry a different Python type than
    the built filter and hash under the wrong tag, turning a bloom
    "maybe" into a false "no" that silently drops a file holding the
    key. Canonicalizing one side is not enough (we don't know the
    file's column type at plan time); instead the probe tests EVERY
    plausible encoding and a file survives if ANY says maybe:

    - iso-parsable str  <-> datetime/date object (temporal column probed
      with the string form range pruning itself uses, or vice versa)
    - bool              <-> int 0/1 (bool probing an int column hashes
      b:, the ints hashed the splitmix64 path; True == 1 in min/max)

    A couple of extra bloom tests per probe, only for ambiguous types —
    never a lost file."""
    import datetime as _dt

    forms = [v]
    if isinstance(v, bool):
        forms.append(int(v))
    elif isinstance(v, int):
        if v in (0, 1):
            forms.append(bool(v))
    elif isinstance(v, str):
        try:
            forms.append(_dt.datetime.fromisoformat(v))
        except ValueError:
            pass
        try:
            forms.append(_dt.date.fromisoformat(v))
        except ValueError:
            pass
    elif isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        forms.append(v.isoformat())
    elif isinstance(v, _dt.date):
        forms.append(v.isoformat())
    return forms


def _hashes(key: bytes) -> tuple[int, int]:
    d = hashlib.md5(key).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd: never a degenerate stride
    return h1, h2


def _size_for(ndv: int) -> tuple[int, int]:
    """(m_bits, k) sized to the observed distinct count: power-of-two m
    near _BITS_PER_KEY bits/key within [min, max] caps, k re-derived from
    the ACTUAL m/ndv ratio so a capped m keeps the optimal hash count."""
    target = max(_BLOOM_MIN_BITS, ndv * _BITS_PER_KEY)
    m = _BLOOM_MIN_BITS
    while m < target and m < _BLOOM_MAX_BITS:
        m <<= 1
    k = max(1, min(8, round(0.693 * m / max(ndv, 1))))
    return m, k


def bloom_build(values) -> list | None:
    """[m, k, b64] bloom over an iterable of PYTHON values (one file's
    column, pre-deduplicated by the caller). Returns None — no filter,
    pruning off for this file/column — if ANY value has no canonical
    encoding: a partial bloom would produce false negatives, which are
    wrong results, not degraded ones. Nulls are skipped (an equality
    probe is never `= NULL`). Int values take the vectorized
    splitmix64 path; everything else the tagged-md5 loop."""
    ints: list[int] = []
    keys: list[bytes] = []
    for v in values:
        if v is None:
            continue
        if type(v) is int:
            ints.append(v & _M64)
            continue
        kb = bloom_key(v)
        if kb is None:
            return None
        keys.append(kb)
    m, k = _size_for(len(ints) + len(keys))
    bits = bytearray(m >> 3)
    if ints:
        import numpy as np

        x = np.array(ints, dtype=np.uint64)
        h1 = _mix64_vec(x ^ np.uint64(_SALT1))
        h2 = _mix64_vec(x ^ np.uint64(_SALT2)) | np.uint64(1)
        arr = np.zeros(m >> 3, dtype=np.uint8)  # ints set bits first
        mask = np.uint64(m - 1)  # m is a power of two
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(
                arr,
                (idx >> np.uint64(3)).astype(np.int64),
                np.left_shift(
                    np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)
                ),
            )
        bits = bytearray(arr.tobytes())
    for kb in keys:
        h1, h2 = _hashes(kb)
        for i in range(k):
            idx = (h1 + i * h2) % m
            bits[idx >> 3] |= 1 << (idx & 7)
    return [m, k, base64.b64encode(zlib.compress(bytes(bits), 6)).decode()]


def _mix64_vec(x):
    """Vector splitmix64 finalizer over numpy uint64 (wraparound
    arithmetic == the scalar's explicit 64-bit masking)."""
    import numpy as np

    x = x ^ (x >> np.uint64(30))
    x = x * np.uint64(0xBF58476D1CE4E5B9)
    x = x ^ (x >> np.uint64(27))
    x = x * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _one_probe(bits, m: int, k: int, v) -> bool:
    """Test a SINGLE encoding of v against a decompressed bitset.
    True = maybe present (including unencodable values — can't prune)."""
    if type(v) is int:
        h1, h2 = _int_hashes(v)
    else:
        kb = bloom_key(v)
        if kb is None:
            return True
        h1, h2 = _hashes(kb)
    for i in range(k):
        idx = (h1 + i * h2) % m
        if not (bits[idx >> 3] & (1 << (idx & 7))):
            return False
    return True


def bloom_maybe_contains(bloom: list, v) -> bool:
    """True unless the filter PROVES v absent under EVERY encoding the
    value may have been stored as (probe_forms — the type-tag ambiguity
    fix). A value with no canonical encoding returns True (cannot prune
    — same safe direction as a file with no bounds)."""
    m, k, b64 = bloom
    bits = zlib.decompress(base64.b64decode(b64))
    return any(_one_probe(bits, m, k, f) for f in probe_forms(v))


def bloom_maybe_contains_any(bloom: list, values) -> bool:
    """True unless the filter proves EVERY probe value absent — the
    merge-candidate test (file is a candidate iff any source key might
    live in it). Decompresses once for the whole probe set."""
    m, k, b64 = bloom
    bits = zlib.decompress(base64.b64decode(b64))
    return any(
        _one_probe(bits, m, k, f) for v in values for f in probe_forms(v)
    )


def harvest_blooms(path: str, bloom_cols: list[str]) -> dict:
    """{col: [m, k, b64]} for one parquet file — the bloom twin of
    snapshot._harvest_one, called from the same sequential OR distributed
    harvest path (pure function of the file: both paths produce identical
    filters). Reads ONLY the requested columns and dedups executor-fast
    in Arrow before the Python hashing loop, so the loop is O(ndv), not
    O(rows). Columns absent from the file, of float/decimal type, or
    containing an unencodable value are skipped (no bloom = no pruning =
    safe)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out: dict[str, list] = {}
    pf = pq.ParquetFile(path)
    names = set(pf.schema_arrow.names)
    want = [c for c in bloom_cols if c in names]
    if not want:
        return out
    tbl = pq.read_table(path, columns=want)
    for col in want:
        typ = tbl.schema.field(col).type
        if (
            pa.types.is_floating(typ)
            or pa.types.is_decimal(typ)
            or pa.types.is_nested(typ)
        ):
            continue
        uniq = pc.unique(tbl.column(col))
        b = bloom_build(uniq.to_pylist())
        if b is not None:
            out[col] = b
    return out
