"""Property-based test (hypothesis) for the manifest LOG-SEGMENT
encoding: for ANY history of file-set mutations — appends, rewrites,
optimizes, with per-file sizes/stats/partition values riding along —
every version resolved through ``storage.read_manifest`` (raw form +
delta-chain walk + checkpoint cuts) must equal the ground-truth
manifest the writer handed ``_try_commit``. The encoder picks full or
delta form per commit (rewrite-shaped commits and every
``MANIFEST_CHECKPOINT_EVERY``-th version store full); resolution must
be form-blind.

This pins the invariant every reader in the engine leans on — scans,
DataSource halves, stream walks, vacuum's reference accounting — at the
protocol layer itself, against adversarial histories no fixture would
think to write.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_logs_parquet_converter_spark.plans.snapshots import _try_commit
from aws_logs_parquet_converter_spark.storage import (
    read_manifest,
    read_raw_manifest,
    storage_for_root,
)

SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}}
        ],
    }
)

#: one step of a history: (n_added, n_removed, optimize?, size_unit)
STEPS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=4),
        st.booleans(),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(steps=STEPS)
def test_any_history_resolves_to_ground_truth(
    spark, tmp_path_factory, steps
):
    root = str(tmp_path_factory.mktemp("mprop")) + "/t"
    storage = storage_for_root(root)
    live: list[str] = []
    sizes: dict[str, int] = {}
    stats: dict[str, dict] = {}
    parts: dict[str, list] = {}
    truth: dict[int, dict] = {}
    prev = None
    v = 0
    serial = 0
    for n_add, n_rm, optimize, unit in steps:
        v += 1
        action = "optimize" if optimize else "append"
        # removals first (rewrite/optimize shapes), then fresh files
        rm = live[:n_rm] if optimize or n_rm else []
        live = [f for f in live if f not in rm]
        fresh = []
        for _ in range(n_add):
            serial += 1
            fresh.append(f"data/{v:08d}/part-{serial:04d}.parquet")
        live = sorted(live + fresh)
        for f in fresh:
            sizes[f] = unit * 1000
            stats[f] = {"id": [serial, serial + 10]}
            parts[f] = [str(serial % 3)]
        for f in rm:
            sizes.pop(f, None)
            stats.pop(f, None)
            parts.pop(f, None)
        m = {
            "version": v,
            "action": action,
            "schema": SCHEMA,
            "files": list(live),
            "sizes": {f: sizes[f] for f in live},
            "stats_cols": ["id"],
            "stats": {f: stats[f] for f in live},
            "partition_by": ["p"],
            "partitions": {f: parts[f] for f in live},
        }
        assert _try_commit(spark, root, m, prev=prev)
        prev = m
        truth[v] = {
            "files": list(live),
            "sizes": {f: sizes[f] for f in live},
            "stats": {f: stats[f] for f in live},
            "partitions": {f: parts[f] for f in live},
        }
    # EVERY version must resolve to its ground truth, form-blind
    forms = set()
    for ver, want in truth.items():
        raw = read_raw_manifest(storage, root, ver)
        forms.add("full" if "files" in raw else "delta")
        got = read_manifest(storage, root, ver)
        assert sorted(got["files"]) == want["files"], ver
        assert got.get("sizes", {}) == want["sizes"], ver
        assert got.get("stats", {}) == want["stats"], ver
        assert got.get("partitions", {}) == want["partitions"], ver
        assert got["schema"] == SCHEMA


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    steps=STEPS,
    thresholds=st.lists(
        st.sampled_from([1, 400, 10**9]), min_size=14, max_size=14
    ),
    formats=st.lists(
        st.sampled_from(["parquet", "gzip"]), min_size=14, max_size=14
    ),
)
def test_any_history_resolves_across_mixed_encodings(
    spark, tmp_path_factory, steps, thresholds, formats
):
    """r10 twin of the property above with the big encodings in play:
    each commit draws its own MANIFEST_COMPACT_MIN_BYTES (always-big /
    sometimes / never) AND its big form (r11 parquet vs r10 gzip
    compact), so arbitrary histories interleave plain-JSON, gzip, and
    parquet manifests version-by-version — and every version must still
    resolve to ground truth, form- AND encoding-blind (lazy parquet
    sections compare equal to plain dicts). Pins the magic-byte sniff
    and both columnar round-trips at the protocol layer against
    histories no fixture would write."""
    from aws_logs_parquet_converter_spark import storage as stmod

    root = str(tmp_path_factory.mktemp("mpropc")) + "/t"
    storage = storage_for_root(root)
    live: list[str] = []
    sizes: dict[str, int] = {}
    stats: dict[str, dict] = {}
    truth: dict[int, dict] = {}
    prev = None
    v = 0
    serial = 0
    old_min = stmod.MANIFEST_COMPACT_MIN_BYTES
    old_fmt = stmod.MANIFEST_BIG_FORMAT
    try:
        for (n_add, n_rm, optimize, unit), thr, fmt in zip(
            steps, thresholds, formats
        ):
            stmod.MANIFEST_COMPACT_MIN_BYTES = thr
            stmod.MANIFEST_BIG_FORMAT = fmt
            v += 1
            rm = live[:n_rm] if optimize or n_rm else []
            live = [f for f in live if f not in rm]
            fresh = []
            for _ in range(n_add):
                serial += 1
                fresh.append(f"data/{v:08d}/part-{serial:04d}.parquet")
            live = sorted(live + fresh)
            for f in fresh:
                sizes[f] = unit * 1000
                stats[f] = {"id": [serial, serial + 10]}
            for f in rm:
                sizes.pop(f, None)
                stats.pop(f, None)
            m = {
                "version": v,
                "action": "optimize" if optimize else "append",
                "schema": SCHEMA,
                "files": list(live),
                "sizes": {f: sizes[f] for f in live},
                "stats_cols": ["id"],
                "stats": {f: stats[f] for f in live},
            }
            assert _try_commit(spark, root, m, prev=prev)
            prev = m
            truth[v] = {
                "files": list(live),
                "sizes": {f: sizes[f] for f in live},
                "stats": {f: stats[f] for f in live},
            }
    finally:
        stmod.MANIFEST_COMPACT_MIN_BYTES = old_min
        stmod.MANIFEST_BIG_FORMAT = old_fmt
    encodings = set()
    for ver, want in truth.items():
        data = storage.read_manifest_bytes(root, ver)
        encodings.add(
            "parquet"
            if data[:4] == b"PAR1"
            else ("compact" if data[:2] == b"\x1f\x8b" else "plain")
        )
        got = read_manifest(storage, root, ver)
        assert sorted(got["files"]) == want["files"], ver
        assert got.get("sizes", {}) == want["sizes"], ver
        assert got.get("stats", {}) == want["stats"], ver


def test_compact_codec_absent_vs_none_convention():
    """The compact form spells "no entry for this file" as null in the
    parallel array, so an EXPLICIT ``None`` value in a per-file dict
    cannot round-trip — the encoder must REFUSE it loudly (r10 verdict
    hardening note: the convention was implicit; a future writer could
    have violated it silently). Residual out-of-list entries, the other
    half of the convention, must keep merging on decode."""
    import pytest

    from aws_logs_parquet_converter_spark import storage as stmod

    files = [f"data/c/{i:04d}.parquet" for i in range(40)]
    base = {
        "version": 3,
        "schema": SCHEMA,
        "files": files,
        "stats_cols": ["id"],
        "committed_at": 1.0,
    }
    old_min = stmod.MANIFEST_COMPACT_MIN_BYTES
    stmod.MANIFEST_COMPACT_MIN_BYTES = 1
    try:
        # explicit-None per-file entries refuse at encode, naming the key
        for key, val in (
            ("stats", None),
            ("sizes", None),
            ("partitions", None),
        ):
            raw = {**base, key: {files[0]: val, files[1]: {"id": [1, 2]}}}
            with pytest.raises(ValueError, match=key):
                stmod.encode_manifest_bytes(raw)
        # absence (the legal spelling) round-trips exactly
        raw = {
            **base,
            "stats": {f: {"id": [i, i + 1]} for i, f in enumerate(files[1:])},
            "sizes": {f: 10 for f in files},
        }
        dec = stmod.decode_manifest_bytes(stmod.encode_manifest_bytes(raw))
        assert dec["stats"] == raw["stats"]  # files[0] stays absent
        assert dec["sizes"] == raw["sizes"]
        # residual entries (keys beyond the aligning list — the sizes
        # backfill shape) still merge back on decode
        delta = {
            "version": 4,
            "base": 3,
            "adds": files[:5],
            "removes": [],
            "sizes_adds": {f: 99 for f in files},  # all live, not just adds
            "committed_at": 2.0,
        }
        dec = stmod.decode_manifest_bytes(stmod.encode_manifest_bytes(delta))
        assert dec["sizes_adds"] == delta["sizes_adds"]
    finally:
        stmod.MANIFEST_COMPACT_MIN_BYTES = old_min


@settings(max_examples=400, deadline=None)
@given(data=st.data())
def test_batch_pruner_equals_per_file_loop(data):
    """`_prune_survivors` (the r11 batch pruner with hoisted filter
    encoding and no per-file dict merge) must make EXACTLY the decisions
    of the original `_survives_all` per-file loop over adversarial
    manifests — missing stats, all-NULL ranges, partition overrides, the
    NULL/'' string-partition ambiguity, IN lists with NULL and
    un-encodable elements, un-encodable filter values."""
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        _prune_survivors,
        _survives_all,
    )

    n = data.draw(st.integers(min_value=0, max_value=30))
    files = [f"data/c/{i:03d}.parquet" for i in range(n)]
    # stats/filters share each column's type, like the engine guarantees
    # (stats are gathered FROM the column; filter values are the user's
    # typed predicates) — mismatched types would TypeError in both paths
    num = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
    pby = data.draw(
        st.sampled_from([[], ["p"], ["p", "q"]])
    )
    types = {"x": "long", "p": data.draw(st.sampled_from(["string", "long"])),
             "q": "string"}
    m: dict = {"files": files, "stats_cols": ["x"]}
    stats = {}
    for f in files:
        if data.draw(st.booleans()):
            entry = {}
            if data.draw(st.booleans()):
                a, b = data.draw(st.lists(num, min_size=2, max_size=2))
                if a is not None and b is not None and a > b:
                    a, b = b, a
                entry["x"] = [a, b]
            stats[f] = entry
    if stats:
        m["stats"] = stats
    if pby:
        m["partition_by"] = pby
        parts = {}
        for f in files:
            if data.draw(st.booleans()):
                vals = []
                for c in pby:
                    v = data.draw(st.one_of(st.none(), st.sampled_from(
                        ["1", "2", "a", ""] if types.get(c) == "string" else ["1", "2", "7"]
                    )))
                    vals.append(v)
                parts[f] = vals
        if parts:
            m["partitions"] = parts
    ops = ["=", "<", "<=", ">", ">=", "in"]

    def _val_strategy(c):
        # typed per column: ints for long columns, strings for string
        # columns, plus NULL and an un-encodable object everywhere
        if types.get(c, "string") == "long" or c == "x":
            base = st.integers(min_value=-3, max_value=3)
        else:
            base = st.sampled_from(["1", "2", "a", "zz", ""])
        return st.one_of(st.none(), base, st.just(object()))

    n_filters = data.draw(st.integers(min_value=0, max_value=3))
    filters = []
    for _ in range(n_filters):
        c = data.draw(st.sampled_from(["x", "p", "q", "nostats"]))
        op = data.draw(st.sampled_from(ops))
        if op == "in":
            v = data.draw(st.lists(_val_strategy(c), max_size=4))
        else:
            v = data.draw(_val_strategy(c))
        filters.append((c, op, v))
    want = [f for f in files if _survives_all(m, f, types, filters)]
    got = _prune_survivors(m, files, types, filters)
    if got != want:
        import pprint

        with open("/tmp/pruner_repro.txt", "w") as fh:
            pprint.pprint({"m": m, "types": types, "filters": filters,
                           "want": want, "got": got}, stream=fh, width=100)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_arrow_pruner_equals_per_file_loop(data):
    """The vectorized parquet-form pruner (`_prune_survivors_arrow`,
    r11) must make EXACTLY the decisions of the `_survives_all` per-file
    loop over adversarial PARQUET-ENCODED manifests — direct full reads
    AND checkpoint-crossing delta chains (removes, re-adds with and
    without fresh stats, overlay entries updating base rows), partition
    overrides, all-NULL ranges, IN lists with NULL and un-encodable
    elements. Also pins ENGAGEMENT: for these shapes (typed int stats,
    type-matched filters) the arrow path must never silently fall back
    to the scalar loop — a fallback here means the fast path rotted
    while the suite stayed green."""
    from aws_logs_parquet_converter_spark import storage as stmod
    from aws_logs_parquet_converter_spark.plans import snapshots as snap

    n = data.draw(st.integers(min_value=0, max_value=25))
    files = [f"data/c/{i:03d}.parquet" for i in range(n)]
    num = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
    pby = data.draw(st.sampled_from([[], ["p"], ["p", "q"]]))
    types = {
        "x": "long",
        "p": data.draw(st.sampled_from(["string", "long"])),
        "q": "string",
    }

    def _draw_entry():
        entry = {}
        if data.draw(st.booleans()):
            a, b = data.draw(st.lists(num, min_size=2, max_size=2))
            if a is not None and b is not None and a > b:
                a, b = b, a
            entry["x"] = [a, b]
        return entry

    full: dict = {"version": 0, "files": files, "stats_cols": ["x"]}
    stats = {f: _draw_entry() for f in files if data.draw(st.booleans())}
    if stats:
        full["stats"] = stats
    if pby:
        full["partition_by"] = pby
        parts = {}
        for f in files:
            if data.draw(st.booleans()):
                vals = []
                for c in pby:
                    v = data.draw(st.one_of(st.none(), st.sampled_from(
                        ["1", "2", "a", ""]
                        if types.get(c) == "string"
                        else ["1", "2", "7"]
                    )))
                    vals.append(v)
                parts[f] = vals
        if parts:
            full["partitions"] = parts
    old_min = stmod.MANIFEST_COMPACT_MIN_BYTES
    old_fmt = stmod.MANIFEST_BIG_FORMAT
    stmod.MANIFEST_COMPACT_MIN_BYTES = 1
    stmod.MANIFEST_BIG_FORMAT = "parquet"
    try:
        raws = [stmod.decode_manifest_bytes(stmod.encode_manifest_bytes(full))]
    finally:
        stmod.MANIFEST_COMPACT_MIN_BYTES = old_min
        stmod.MANIFEST_BIG_FORMAT = old_fmt
    live = list(files)
    removed_pool: list[str] = []
    for v in range(data.draw(st.integers(min_value=0, max_value=2))):
        removes = (
            data.draw(st.lists(st.sampled_from(live), unique=True, max_size=6))
            if live
            else []
        )
        n_new = data.draw(st.integers(min_value=0, max_value=4))
        adds = [f"data/d{v}/{i:02d}.parquet" for i in range(n_new)]
        removed_pool = [f for f in removed_pool if f not in adds] + removes
        if removed_pool and data.draw(st.booleans()):
            # RE-ADD a previously removed file (with or without stats)
            adds.append(data.draw(st.sampled_from(removed_pool)))
        live = [f for f in live if f not in removes] + [
            f for f in adds if f not in live
        ]
        stats_adds = {}
        for f in adds:
            if data.draw(st.booleans()):
                stats_adds[f] = _draw_entry()
        # a delta may also REWRITE an existing file's stats entry
        if live and data.draw(st.booleans()):
            stats_adds[data.draw(st.sampled_from(live))] = _draw_entry()
        delta: dict = {
            "version": v + 1,
            "base": v,
            "adds": adds,
            "removes": removes,
            "stats_cols": ["x"],
        }
        if stats_adds:
            delta["stats_adds"] = stats_adds
        if pby:
            delta["partition_by"] = pby
            padds = {}
            for f in adds:
                if not data.draw(st.booleans()):
                    continue
                # a tuple may be SHORT (recorded before a partition-
                # layout evolution widened partition_by): pruning must
                # fall back to the stats entry for the missing slots,
                # never IndexError (r12, advisor finding)
                n = data.draw(st.integers(min_value=0, max_value=len(pby)))
                padds[f] = [
                    data.draw(st.sampled_from(["1", "2"])) for _ in range(n)
                ]
            if padds:
                delta["partitions_adds"] = padds
        raws.append(delta)
    m = stmod.resolve_manifest_chain(raws) if len(raws) > 1 else raws[0]

    ops = ["=", "<", "<=", ">", ">=", "in"]

    def _val_strategy(c):
        if types.get(c, "string") == "long" or c == "x":
            base = st.integers(min_value=-3, max_value=3)
        else:
            base = st.sampled_from(["1", "2", "a", "zz", ""])
        return st.one_of(st.none(), base, st.just(object()))

    filters = []
    for _ in range(data.draw(st.integers(min_value=0, max_value=3))):
        c = data.draw(st.sampled_from(["x", "p", "q", "nostats"]))
        op = data.draw(st.sampled_from(ops))
        if op == "in":
            val = data.draw(st.lists(_val_strategy(c), max_size=4))
        else:
            val = data.draw(_val_strategy(c))
        filters.append((c, op, val))

    engaged = []
    orig = snap._prune_survivors_arrow

    def spy(*a, **k):
        r = orig(*a, **k)
        engaged.append(r is not None)
        return r

    snap._prune_survivors_arrow = spy
    try:
        got = snap._prune_survivors(m, m["files"], types, filters)
    finally:
        snap._prune_survivors_arrow = orig
    handle = getattr(m.get("stats"), "arrow", None)
    if handle is not None and filters:
        assert engaged and all(engaged), "arrow fast path silently fell back"
        # FULL laziness through pruning: neither per-file section may
        # have materialized — every shape this generator draws is
        # columnar-provable (stats masks; partition overrides via the
        # r11 vectorized override pass, whose tell is exactly that the
        # partitions dict is never built)
        sec = m.get("stats")
        if isinstance(sec, stmod.LazySection):
            assert sec._d is None, "stats materialized despite arrow path"
        psec = m.get("partitions")
        if (
            isinstance(psec, stmod.LazySection)
            and getattr(psec, "arrow", None) is handle
        ):
            assert psec._d is None, "partitions materialized despite arrow path"

    # the MIXED path too (stats columnar, partition overrides from the
    # materialized dict — what unvectorizable partition shapes fall back
    # to): force it by hiding the handle's partition columns and demand
    # the same decisions
    got_mixed = None
    if handle is not None and handle.part_kinds is not None:
        saved = handle.part_kinds
        handle.part_kinds = None
        try:
            got_mixed = snap._prune_survivors(m, m["files"], types, filters)
        finally:
            handle.part_kinds = saved

    # ground truth from the per-file loop over a fully MATERIALIZED copy
    # (computed AFTER `got` so truth-side materialization cannot mask a
    # laziness regression above)
    mm = stmod.materialize_manifest(m)
    want = [f for f in mm["files"] if snap._survives_all(mm, f, types, filters)]
    assert got == want
    if got_mixed is not None:
        assert got_mixed == want


@settings(max_examples=150, deadline=None)
@given(data=st.data())
def test_vacuum_referenced_equals_per_version_union(data):
    """`_vacuum_referenced` (r11: one incremental walk) must equal the
    naive per-kept-version resolved-list union — the set vacuum's
    deletions are complemented against, where any divergence is data
    loss — over adversarial histories: removes, re-adds, mid-range FULL
    checkpoints, dv/bloom sidecars, delta chains, and BOTH contiguous
    and arbitrary kept subsets."""
    import os
    import tempfile

    from aws_logs_parquet_converter_spark import storage as stmod
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        _vacuum_referenced,
    )

    base_dir = tempfile.mkdtemp(prefix="vacref_")
    root = os.path.join(base_dir, "t")
    sd = os.path.join(root, "_snapshots")
    os.makedirs(sd)
    store = stmod.LocalSnapshotStorage()
    n_versions = data.draw(st.integers(min_value=1, max_value=8))
    live: list[str] = []
    removed_pool: list[str] = []
    all_versions = []
    for v in range(1, n_versions + 1):
        removes = (
            data.draw(st.lists(st.sampled_from(live), unique=True, max_size=4))
            if live
            else []
        )
        n_new = data.draw(st.integers(min_value=0, max_value=4))
        adds = [f"data/c{v}/{i:02d}.parquet" for i in range(n_new)]
        if removed_pool and data.draw(st.booleans()):
            adds.append(data.draw(st.sampled_from(removed_pool)))
        removed_pool = [f for f in removed_pool + removes if f not in adds]
        live = [f for f in live if f not in removes] + [
            f for f in adds if f not in live
        ]
        m: dict = {"version": v, "schema": "{}", "committed_at": 100.0 + v}
        if data.draw(st.booleans()):
            m["dv"] = [f"data/dv{v}/d.parquet"]
        if v == 1 or data.draw(st.integers(0, 3)) == 0:  # FULL form
            m["files"] = sorted(live)
        else:
            m.update({"base": v - 1, "adds": adds, "removes": removes})
        with open(os.path.join(sd, f"v{v:08d}.json"), "wb") as fh:
            fh.write(stmod.encode_manifest_bytes(m))
        all_versions.append(v)
    kept = sorted(
        data.draw(
            st.sets(st.sampled_from(all_versions), min_size=1)
        )
    )
    got_ref, got_chain = _vacuum_referenced(store, root, kept)
    want_ref: set = set()
    want_chain: set = set()
    for v in kept:
        km = stmod.read_manifest(store, root, v)
        want_ref.update(km["files"])
        want_ref.update(km.get("dv", ()))
        want_ref.update(km.get("bloom", {}).get("files", ()))
        raw = stmod.read_raw_manifest(store, root, v)
        while "files" not in raw:
            b = int(raw["base"])
            want_chain.add(b)
            raw = stmod.read_raw_manifest(store, root, b)
    assert got_ref == want_ref, (kept, got_ref ^ want_ref)
    assert got_chain == want_chain
    import shutil

    shutil.rmtree(base_dir, ignore_errors=True)


@settings(max_examples=150, deadline=None)
@given(data=st.data())
def test_vacuum_referenced_sparse_history(data):
    """A PRIOR vacuum leaves the version sequence SPARSE: it preserves
    ``chain_needed`` base manifests below its window while deleting the
    versions between them and its kept set. A later vacuum whose
    retention pulls such a base into ``kept`` must not crash on (or
    silently misread through) the deleted mid-range versions — it walks
    only versions that exist, re-baselining at gaps (r12, advisor
    finding). Oracle: per-kept-version resolved union, same as the
    dense property."""
    import os
    import shutil
    import tempfile

    from aws_logs_parquet_converter_spark import storage as stmod
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        _vacuum_referenced,
    )

    base_dir = tempfile.mkdtemp(prefix="vacref_sp_")
    root = os.path.join(base_dir, "t")
    sd = os.path.join(root, "_snapshots")
    os.makedirs(sd)
    store = stmod.LocalSnapshotStorage()
    n_versions = data.draw(st.integers(min_value=3, max_value=10))
    live: list[str] = []
    all_versions = []
    for v in range(1, n_versions + 1):
        removes = (
            data.draw(st.lists(st.sampled_from(live), unique=True, max_size=3))
            if live
            else []
        )
        n_new = data.draw(st.integers(min_value=0, max_value=3))
        adds = [f"data/c{v}/{i:02d}.parquet" for i in range(n_new)]
        live = [f for f in live if f not in removes] + adds
        m: dict = {"version": v, "schema": "{}", "committed_at": 100.0 + v}
        if v == 1 or data.draw(st.integers(0, 3)) == 0:  # FULL form
            m["files"] = sorted(live)
        else:
            m.update({"base": v - 1, "adds": adds, "removes": removes})
        with open(os.path.join(sd, f"v{v:08d}.json"), "wb") as fh:
            fh.write(stmod.encode_manifest_bytes(m))
        all_versions.append(v)

    def _chain_closure(vs: set[int]) -> set[int]:
        out = set(vs)
        frontier = list(vs)
        while frontier:
            raw = stmod.read_raw_manifest(store, root, frontier.pop())
            while "files" not in raw:
                b = int(raw["base"])
                if b not in out:
                    out.add(b)
                    frontier.append(b)
                raw = stmod.read_raw_manifest(store, root, b)
        return out

    # simulate the PRIOR vacuum: keep an arbitrary subset that includes
    # the tip (keep_last >= 1 always keeps it), preserve full chains,
    # physically delete everything else
    prior_kept = set(
        data.draw(st.sets(st.sampled_from(all_versions), min_size=1))
    ) | {n_versions}
    surviving = _chain_closure(prior_kept)
    for v in all_versions:
        if v not in surviving:
            os.unlink(os.path.join(sd, f"v{v:08d}.json"))
    versions = sorted(surviving)
    kept = sorted(
        data.draw(st.sets(st.sampled_from(versions), min_size=1))
    )
    got_ref, got_chain = _vacuum_referenced(store, root, kept, versions)
    want_ref: set = set()
    want_chain: set = set()
    for v in kept:
        km = stmod.read_manifest(store, root, v)
        want_ref.update(km["files"])
        raw = stmod.read_raw_manifest(store, root, v)
        while "files" not in raw:
            b = int(raw["base"])
            want_chain.add(b)
            raw = stmod.read_raw_manifest(store, root, b)
    assert got_ref == want_ref, (kept, versions, got_ref ^ want_ref)
    assert got_chain == want_chain
    shutil.rmtree(base_dir, ignore_errors=True)


@settings(max_examples=120, deadline=None)
@given(data=st.data())
def test_rebase_encoder_equals_scalar_encoder(data):
    """The arrow-to-arrow checkpoint encoder (r12: `_to_parquet_rebase`,
    commit encode O(changed) Python) must produce a payload that DECODES
    to exactly what the scalar encoder produces for the same logical
    manifest — over adversarial shapes: delta chains with stats/partition
    rewrites, re-adds, removes, multiple commit layers, missing entries,
    json-kind stat values, and hive-null partition values. Engagement is
    asserted whenever the shape is one the fast path claims (base
    parquet-form, no residuals): silently rotting back to scalar is the
    regression mode the suite exists to pin."""
    import random as _random

    from aws_logs_parquet_converter_spark import storage as stmod

    old_min = stmod.MANIFEST_COMPACT_MIN_BYTES
    old_fmt = stmod.MANIFEST_BIG_FORMAT
    stmod.MANIFEST_COMPACT_MIN_BYTES = 1
    stmod.MANIFEST_BIG_FORMAT = "parquet"
    try:
        n = data.draw(st.integers(min_value=5, max_value=40))
        files = [f"data/c0/{i:05d}.parquet" for i in range(n)]
        types = data.draw(st.sampled_from(["int", "str", "mixed"]))

        def _stat_val(rng_key):
            if types == "int" or (types == "mixed" and data.draw(st.booleans())):
                a = data.draw(st.integers(-5, 5))
                return [a, a + data.draw(st.integers(0, 3))]
            return [
                data.draw(st.sampled_from(["a", "b", ""])),
                data.draw(st.sampled_from(["x", "zz"])),
            ]

        with_parts = data.draw(st.booleans())
        with_stats = data.draw(st.booleans())
        with_sizes = data.draw(st.booleans())
        full: dict = {
            "version": 10,
            "schema": "{}",
            "committed_at": 1.0,
            "files": files,
        }
        if with_stats:
            full["stats_cols"] = ["x"]
            full["stats"] = {
                f: (
                    {"x": _stat_val(i), "#rows": data.draw(st.integers(0, 9))}
                    if data.draw(st.integers(0, 3))
                    else {}
                )
                for i, f in enumerate(files)
                if data.draw(st.integers(0, 4))
            }
        if with_parts:
            full["partition_by"] = ["g"]
            full["partitions"] = {
                f: [data.draw(st.one_of(st.none(), st.sampled_from(["1", "2"])))]
                for f in files
                if data.draw(st.integers(0, 4))
            }
        if with_sizes:
            full["sizes"] = {f: 100 + i for i, f in enumerate(files)}
        base = stmod.decode_manifest_bytes(
            stmod.encode_manifest_bytes(dict(full))
        )
        if not isinstance(base.get("files"), stmod.LazyFiles):
            return  # tiny-JSON fallback: nothing to rebase against

        # a chain of deltas (resolution overlays)
        raws = [base]
        live = list(files)
        removed_pool: list[str] = []
        for v in range(11, 11 + data.draw(st.integers(0, 2))):
            removes = (
                data.draw(
                    st.lists(st.sampled_from(live), unique=True, max_size=3)
                )
                if live
                else []
            )
            adds = [
                f"data/d{v}/{i:02d}.parquet"
                for i in range(data.draw(st.integers(0, 3)))
            ]
            if removed_pool and data.draw(st.booleans()):
                adds.append(data.draw(st.sampled_from(removed_pool)))
            if live and data.draw(st.booleans()):
                # add of a file ALREADY LIVE (no remove): resolution
                # keeps its untouched entries — the r12 self-review
                # shape the encoder must not drop
                adds.append(data.draw(st.sampled_from(live)))
            removed_pool = [
                f for f in removed_pool + removes if f not in adds
            ]
            live = [f for f in live if f not in removes] + [
                f for f in adds if f not in live
            ]
            d: dict = {
                "version": v,
                "base": v - 1,
                "schema": "{}",
                "committed_at": float(v),
                "adds": adds,
                "removes": removes,
            }
            if with_stats:
                d["stats_cols"] = ["x"]
                d["stats_adds"] = {
                    f: {"x": _stat_val(0)}
                    for f in adds
                    if data.draw(st.booleans())
                }
                if live and data.draw(st.booleans()):  # REWRITE an entry
                    d["stats_adds"][data.draw(st.sampled_from(live))] = {
                        "x": _stat_val(1),
                        "#rows": 3,
                    }
            if with_parts:
                d["partition_by"] = ["g"]
                d["partitions_adds"] = {
                    f: [data.draw(st.sampled_from(["1", "3"]))]
                    for f in adds
                    if data.draw(st.booleans())
                }
            if with_sizes:
                d["sizes_adds"] = {f: 7 for f in adds}
            raws.append(d)
        resolved = (
            stmod.resolve_manifest_chain(raws) if len(raws) > 1 else base
        )

        # one or two COMMIT layers on top (the snapshot_write shape)
        cur = resolved
        for layer in range(data.draw(st.integers(1, 2))):
            new_files = [
                f"data/e{layer}/{i:02d}.parquet"
                for i in range(data.draw(st.integers(0, 3)))
            ]
            if live and data.draw(st.integers(0, 3)) == 0:
                new_files.append(data.draw(st.sampled_from(live)))
            rem = (
                set(
                    data.draw(
                        st.lists(st.sampled_from(live), unique=True, max_size=2)
                    )
                )
                if live and data.draw(st.booleans())
                else set()
            )
            live = [f for f in live if f not in rem] + new_files
            commit: dict = {
                "version": 20 + layer,
                "schema": "{}",
                "committed_at": 20.0 + layer,
                "action": "append",
                "files": stmod.rebase_files(cur["files"], new_files, rem),
            }
            if with_stats:
                commit["stats_cols"] = ["x"]
                commit["stats"] = stmod.rebase_section(
                    cur.get("stats", {}),
                    {
                        f: {"x": _stat_val(2), "#rows": 1}
                        for f in new_files
                        if data.draw(st.booleans())
                    },
                    rem,
                    commit["files"],
                )
            if with_parts:
                commit["partition_by"] = ["g"]
                commit["partitions"] = stmod.rebase_section(
                    cur.get("partitions", {}),
                    {
                        f: [data.draw(st.sampled_from(["1", "2"]))]
                        for f in new_files
                        if data.draw(st.booleans())
                    },
                    rem,
                    commit["files"],
                )
            if with_sizes:
                commit["sizes"] = stmod.rebase_section(
                    cur.get("sizes", {}),
                    {f: 11 for f in new_files},
                    rem,
                    commit["files"],
                )
            cur = commit

        blob = stmod._to_parquet_rebase(dict(cur))
        # ENGAGEMENT: the fast path must take every shape it claims.
        # Degenerate bases legitimately fall back: a value-typed column
        # the base encoder could only infer as the arrow NULL type (no
        # non-None partition value anywhere / no "x" stat entry at all)
        # cannot absorb a later real value, and a zero-width partitions
        # dict has no columns for tuples to land in.
        typed_parts = not with_parts or any(
            v[0] is not None for v in (full.get("partitions") or {}).values()
        )
        typed_stats = not with_stats or any(
            "x" in e for e in (full.get("stats") or {}).values()
        )
        # "mixed" draws can produce an all-int base column that a later
        # string value cannot land in — a correct fallback, not rot.
        # An EMPTY final live set is also a correct fallback: the size
        # gate (est * 40 < MANIFEST_COMPACT_MIN_BYTES) routes a 0-file
        # manifest to the plain-JSON encoder, which always wins there.
        if typed_parts and typed_stats and types != "mixed" and live:
            assert blob is not None, "rebase encoder silently fell back"
        if blob is None:
            return  # scalar path: covered by the resolution properties
        got = stmod.materialize_manifest(stmod.decode_manifest_bytes(blob))
        truth_m = stmod.materialize_manifest(dict(cur))
        want = stmod.materialize_manifest(
            stmod.decode_manifest_bytes(stmod._to_parquet(truth_m))
        )
        assert got == want, {
            k: (got.get(k), want.get(k))
            for k in set(got) | set(want)
            if got.get(k) != want.get(k)
        }
    finally:
        stmod.MANIFEST_COMPACT_MIN_BYTES = old_min
        stmod.MANIFEST_BIG_FORMAT = old_fmt
