"""Mini-catalog: MULTI-TABLE atomic commits on one conditional PUT.

Every snapshot table commits independently (ops/snapshot.py), which is
single-table snapshot isolation. Workloads that pair tables — an MV and
its source, a replica and its upstream, a fact and its dimension cut —
need a reader to see a CONSISTENT pair: source-at-vN with the MV state
that was derived FROM vN, never a torn (vN, state-of-vN-1) combination
assembled from two independent latest-reads. This is what a catalog
commit gives Iceberg/Nessie deployments; here it is one JSON manifest
committed through the same conditional-PUT protocol as table manifests
(ops/store.py — object-store safe, fuzz-tested primitives):

    catalog manifest vK = {"version": K, "tables":
        {name: {"dir": <table path>, "version": <pinned table version>}}}

- `catalog_set` updates ANY NUMBER of entries in ONE compare-and-swap
  commit — the atomic two-table swap. A lost race re-reads and retries
  (entries it didn't touch carry forward).
- `catalog_resolve` reads ONE manifest and returns every requested
  entry from it — the multi-table snapshot. Two resolves may see
  different catalog versions, but a single resolve is internally
  consistent by construction (it IS one immutable JSON object).
- Tables keep committing on their own; the catalog pins which of their
  versions belong together. Publishing to the catalog is the LAST step
  of a multi-table update (write tables first, swap pointers once) —
  a crash before the swap leaves readers on the previous consistent
  pair, exactly like a crashed single-table commit.

The catalog is deliberately tiny: names to (dir, version). It is not a
metastore (no schemas — tables carry their own) and not a lock service
(writers race through CAS like table commits do).
"""

from __future__ import annotations

import os

from .store import store_for

_CATALOG = "_catalog"


def _manifest_path(catalog: str, version: int) -> str:
    return os.path.join(catalog, _CATALOG, f"v{version:012d}.json")


def _gc_marker_path(catalog: str, version: int) -> str:
    return os.path.join(catalog, _CATALOG, f"gc-below-{version:012d}.marker")


def _gc_floor(catalog: str, st) -> int:
    """Highest version ever expired (0 when none). Markers are
    append-only-then-pruned: an expire writes its marker BEFORE deleting
    any manifest and only removes markers strictly below a higher one,
    so the max visible marker never decreases — see catalog_expire."""
    floor = 0
    for p in st.list_glob(os.path.join(catalog, _CATALOG, "gc-below-*.marker")):
        stem = os.path.basename(p)[len("gc-below-"):-len(".marker")]
        if stem.isdigit():
            floor = max(floor, int(stem))
    return floor


def catalog_versions(catalog: str) -> list[int]:
    out = []
    for p in store_for(catalog).list_glob(
        os.path.join(catalog, _CATALOG, "v*.json")
    ):
        stem = os.path.basename(p)[1:-5]
        if stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _read(catalog: str, version: int) -> dict:
    return store_for(catalog).get_json(_manifest_path(catalog, version))


def catalog_create(catalog: str) -> None:
    """Create an empty catalog (v1). Raises if one already exists —
    creation is itself a conditional put."""
    os.makedirs(os.path.join(catalog, _CATALOG), exist_ok=True)
    ok = store_for(catalog).put_json_if_absent(
        _manifest_path(catalog, 1), {"version": 1, "tables": {}}
    )
    if not ok:
        raise FileExistsError(f"catalog already exists at {catalog}")


def catalog_set(
    catalog: str,
    updates: dict[str, tuple[str, int | None]],
    drops: list[str] | None = None,
    max_retries: int = 10,
) -> int:
    """Atomically update MULTIPLE entries in one catalog commit:
    `updates` maps name -> (table dir, pinned table version); a None
    version pins the table's CURRENT latest (resolved here, once, so
    the pin is still a fixed number in the manifest). `drops` removes
    names. All changes land in ONE conditional put — the atomic
    multi-table swap. Returns the new catalog version."""
    from .snapshot import snapshot_versions

    resolved: dict[str, dict] = {}
    for name, (tdir, ver) in updates.items():
        tdir = os.path.abspath(tdir)
        if ver is None:
            versions = snapshot_versions(tdir)
            if not versions:
                raise FileNotFoundError(
                    f"catalog_set: no committed snapshots under {tdir}"
                )
            ver = versions[-1]
        resolved[name] = {"dir": tdir, "version": int(ver)}
    st = store_for(catalog)
    for _ in range(max_retries):
        versions = catalog_versions(catalog)
        if not versions:
            raise FileNotFoundError(f"no catalog at {catalog}")
        base = versions[-1]
        try:
            cur = _read(catalog, base)
        except FileNotFoundError:
            # a racing catalog_expire dropped the version we listed
            # (only possible when newer versions already exist) —
            # re-list and retry against the new latest
            continue
        tables = dict(cur.get("tables") or {})
        for name in drops or []:
            tables.pop(name, None)
        tables.update(resolved)
        if st.put_json_if_absent(
            _manifest_path(catalog, base + 1),
            {"version": base + 1, "tables": tables},
        ):
            # Version numbers CAN be observed again after catalog_expire
            # deletes old manifests: a writer whose listing went stale
            # (latest advanced past base+1 AND expire collected base+1)
            # "wins" a conditional put at a RECREATED dead version — its
            # swap would never be read by anyone (readers and writers
            # only consume the true latest) and is silently lost. Expire
            # writes a monotone gc-floor marker BEFORE deleting, so a
            # successful put at or below the floor is exactly that case:
            # undo it and retry against a fresh listing. A genuinely
            # fresh latest+1 can never be at or below the floor (expire
            # always keeps at least one version above everything it
            # deletes), so this never fires on the happy path.
            if base + 1 <= _gc_floor(catalog, st):
                st.delete(_manifest_path(catalog, base + 1))
                continue
            return base + 1
    raise RuntimeError(
        f"catalog_set lost {max_retries} consecutive commit races on "
        f"{catalog}"
    )


def catalog_expire(catalog: str, keep_last: int = 10) -> dict:
    """Retention for the catalog plane: every `catalog_set` CAS appends
    one immutable JSON manifest, so a long-lived catalog otherwise grows
    one object per swap forever. Drop all but the newest `keep_last`
    manifests (floor 1 — the latest always survives; it is the CAS base
    every writer and the resolve every reader depends on).

    Safe against concurrent writers: writers only read the LATEST
    version (catalog_set re-lists before each CAS attempt) and commit at
    latest+1, which expire never touches from ITS snapshot — but a
    writer with a STALE listing can conditional-put onto a version
    number this expire just deleted (a recreated dead version no reader
    would ever consume). The gc-floor marker written below, published
    BEFORE any manifest delete, lets catalog_set detect and undo exactly
    that case post-CAS. A reader that listed before a racing expire may
    fail one read of an already-dropped OLD version and simply re-lists
    — the same torn-read posture the table plane's expire documents.
    Returns {'manifests_dropped': n, 'kept': [versions]}."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    st = store_for(catalog)
    versions = catalog_versions(catalog)
    if not versions:
        raise FileNotFoundError(f"no catalog at {catalog}")
    keep = versions[-keep_last:]
    victims = [v for v in versions if v not in keep]
    if victims:
        # Publish the gc floor BEFORE any delete: catalog_set checks it
        # after a successful CAS to detect (and undo) a put that landed
        # on a recreated expired version number — the lost-swap race the
        # concurrent-swapper test pins. put_bytes_if_absent keeps a
        # repeated expire of the same range idempotent.
        hi = max(victims)
        st.put_bytes_if_absent(_gc_marker_path(catalog, hi), b"")
        for v in victims:
            st.delete(_manifest_path(catalog, v))
        # Prune markers strictly below ours — the max marker visible to
        # any concurrent reader never decreases (a marker is only ever
        # deleted while a higher one already exists).
        for p in st.list_glob(
            os.path.join(catalog, _CATALOG, "gc-below-*.marker")
        ):
            stem = os.path.basename(p)[len("gc-below-"):-len(".marker")]
            if stem.isdigit() and int(stem) < hi:
                st.delete(p)
    return {"manifests_dropped": len(victims), "kept": keep}


def catalog_resolve(
    catalog: str, names: list[str] | None = None
) -> dict[str, tuple[str, int]]:
    """One consistent multi-table snapshot: read the LATEST catalog
    manifest ONCE and return {name: (dir, pinned version)} from it.
    Unknown requested names raise KeyError (naming the known set)."""
    tables = None
    for _ in range(10):
        versions = catalog_versions(catalog)
        if not versions:
            raise FileNotFoundError(f"no catalog at {catalog}")
        try:
            tables = _read(catalog, versions[-1]).get("tables") or {}
            break
        except FileNotFoundError:
            # racing expire dropped the listed version; a newer one
            # exists by the expire invariant — re-list
            continue
    if tables is None:  # pragma: no cover — needs 10 racing expires
        raise RuntimeError(
            f"catalog_resolve lost 10 consecutive list/read races on "
            f"{catalog}"
        )
    if names is None:
        names = sorted(tables)
    out = {}
    for name in names:
        e = tables.get(name)
        if e is None:
            raise KeyError(
                f"catalog {catalog} has no table {name!r} "
                f"(known: {sorted(tables)})"
            )
        out[name] = (e["dir"], int(e["version"]))
    return out


def catalog_read(spark, catalog: str, name: str):
    """snapshot_read of a cataloged table AT ITS PINNED VERSION. For a
    consistent multi-table read, catalog_resolve once and snapshot_read
    each (dir, version) pair yourself — calling catalog_read twice is
    two resolves and may straddle a swap."""
    from .snapshot import snapshot_read

    tdir, ver = catalog_resolve(catalog, [name])[name]
    return snapshot_read(spark, tdir, version=ver)


def catalog_register(
    spark, catalog: str, prefix: str, names: list[str] | None = None
) -> list[str]:
    """Register every cataloged table (or just `names`) as a temp view
    `<prefix>_<name>`, all pinned from ONE catalog resolve — the
    multi-table snapshot as a SQL surface:

        catalog_register(spark, "/cat", "c")
        spark.sql("SELECT ... FROM c_fact JOIN c_dim USING (k)")

    Every view reads its table AT THE VERSION the same catalog manifest
    pinned, so the join can never mix a new fact with a stale dim (or
    vice versa). Views are frozen at registration — re-register after a
    catalog_set to move the whole family forward atomically."""
    from .snapshot import snapshot_read

    out = []
    for name, (tdir, ver) in sorted(catalog_resolve(catalog, names).items()):
        view = f"{prefix}_{name}"
        snapshot_read(spark, tdir, version=ver).createOrReplaceTempView(view)
        out.append(view)
    return out


def mv_refresh_cataloged(
    spark,
    src_table: str,
    mv_table: str,
    catalog: str,
    src_name: str = "src",
    mv_name: str = "mv",
) -> dict:
    """mv_refresh + one atomic catalog swap publishing the CONSISTENT
    (source version, MV version) pair. External readers who resolve both
    tables through the catalog can never observe the torn combination
    of a new source version with the previous MV state (or vice versa):
    the pins move together or not at all. A crash between the refresh
    and the swap leaves the catalog on the previous consistent pair —
    the refresh itself stays exactly-once (ops/mv.py), so the next call
    just re-publishes. Returns mv_refresh's result + {'catalog_version'}.

    The published pair comes from the refresh's OWN result (the MV
    version it committed, the source version it folded to) — never from
    re-reading latest, which a racing refresher could have moved."""
    from .mv import mv_refresh

    r = mv_refresh(spark, src_table, mv_table)
    cv = catalog_set(
        catalog,
        {
            src_name: (src_table, r["refreshed_to"]),
            mv_name: (mv_table, r["version"]),
        },
    )
    return {**r, "catalog_version": cv}
