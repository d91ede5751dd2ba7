"""Property-based tests (hypothesis) for rate-limited stream admission
over the snapshot-manifest log: for ANY commit structure (arbitrary
per-version file counts and sizes, optimize commits sprinkled in) and
ANY limits (maxFilesPerTrigger, maxBytesPerTrigger, either, both,
neither), driving the reader the way MicroBatchExecution does must
satisfy:

1. **Exactness** — the concatenated batches plan every delta file
   exactly once, in the deterministic walk order, regardless of where
   the sub-version offsets land.
2. **Boundedness** — no batch exceeds maxFilesPerTrigger; byte batches
   stop at the first file that crosses maxBytesPerTrigger (and always
   admit at least one file).
3. **Restart-stability** — cutting the drain at ANY batch boundary and
   resuming with a FRESH reader (the engine's replay-then-poll restart
   contract) yields the same remaining batches.

Tables are synthetic manifests committed through the real
``_try_commit`` (delta + checkpoint encoding, in-commit stamps), so the
walk exercises the raw delta forms exactly as production does — no data
bytes are needed: admission and planning are pure metadata.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import LongType, StructField, StructType

from aws_logs_parquet_converter_spark.plans.snapshots import _try_commit
from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
    _SnapshotStreamReader,
)

#: a table shape: per-version (n_files, optimize?) with tiny size spreads
VERSIONS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),  # fresh files this commit
        st.booleans(),  # commit an optimize AFTER it?
        st.integers(min_value=1, max_value=100),  # per-file size unit
    ),
    min_size=1,
    max_size=12,
)
LIMITS = st.tuples(
    st.one_of(st.none(), st.integers(min_value=1, max_value=9)),
    st.one_of(st.none(), st.integers(min_value=1, max_value=600)),
)


def _build_table(spark, tmpdir, shape) -> tuple[str, list[str]]:
    """Commit the shape through the real encoder; returns (root, the
    expected delta-file order a full drain must produce)."""
    root = f"{tmpdir}/t"
    files: list[str] = []
    sizes: dict[str, int] = {}
    expected: list[str] = []
    prev = None
    v = 0
    for i, (n, opt, unit) in enumerate(shape):
        v += 1
        fresh = sorted(
            f"data/{v:08d}/part-{j}.parquet" for j in range(n)
        )
        files = files + fresh
        expected.extend(fresh)
        sizes = {**sizes, **{f: unit * 1024 for f in fresh}}
        m = {
            "version": v,
            "action": "append",
            "schema": json.dumps(
                {"type": "struct", "fields": [
                    {"name": "id", "type": "long",
                     "nullable": True, "metadata": {}}]}
            ),
            "files": sorted(files),
            "sizes": dict(sizes),
        }
        assert _try_commit(spark, root, m, prev=prev)
        prev = m
        if opt:
            v += 1
            m = {**{k: val for k, val in prev.items()
                    if k not in ("version", "action", "committed_at")},
                 "version": v, "action": "optimize"}
            assert _try_commit(spark, root, m, prev=prev)
            prev = m
    return root, expected


def _reader(root, max_files, max_bytes):
    opts = {"root": root}
    if max_files is not None:
        opts["maxfilespertrigger"] = str(max_files)
    if max_bytes is not None:
        opts["maxbytespertrigger"] = str(max_bytes)
    return _SnapshotStreamReader(
        StructType([StructField("id", LongType())]), opts
    )


def _drain(reader, start, max_polls=400):
    """(batches, offsets): drive initial/latest/partitions to the end."""
    batches, offsets = [], []
    cur = start
    for _ in range(max_polls):
        nxt = reader.latestOffset()
        if json.dumps(nxt, sort_keys=True) == json.dumps(cur, sort_keys=True):
            return batches, offsets
        batches.append([p.entry for p in reader.partitions(cur, nxt)])
        offsets.append(nxt)
        reader.commit(nxt)
        cur = nxt
    raise AssertionError("admission never converged")


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(shape=VERSIONS, limits=LIMITS)
def test_rate_limited_drain_is_exact_bounded_and_restartable(
    spark, tmp_path_factory, shape, limits
):
    max_files, max_bytes = limits
    tmpdir = str(tmp_path_factory.mktemp("rlprop"))
    root, expected = _build_table(spark, tmpdir, shape)

    r = _reader(root, max_files, max_bytes)
    start = r.initialOffset()
    batches, offsets = _drain(r, start)
    got = [f for b in batches for f in b]
    # exactness: every delta file once, in walk order
    assert got == expected, (got, expected)
    # boundedness
    if max_files is not None:
        assert all(len(b) <= max_files for b in batches), batches
    if max_files is None and max_bytes is None:
        assert len(batches) <= 1  # unlimited: one batch covers all
    # restart-stability: resume at EVERY boundary with a fresh reader
    for cut in range(len(offsets)):
        r2 = _reader(root, max_files, max_bytes)
        prev = offsets[cut - 1] if cut else start
        r2.partitions(prev, offsets[cut])  # the engine's replay call
        rest, _ = _drain(r2, offsets[cut])
        assert [f for b in rest for f in b] == [
            f for b in batches[cut + 1:] for f in b
        ], f"restart at boundary {cut} diverged"
