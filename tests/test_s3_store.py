"""S3ConditionalPutStorage contract tests (r9 VERDICT task 3).

No AWS access exists in this sandbox, so the class runs against two
in-memory client doubles:

* ``_ConditionalS3Double`` — enforces real S3 conditional-put semantics
  (``If-None-Match: *`` -> atomic create-or-412) under a lock, plus
  paginated ListObjectsV2 and 409 conflict injection. The store must
  PASS the exactly-one-winner contention gate on it.
* ``_ClobberingS3Double`` — silently ignores ``IfNoneMatch`` (a store
  with no conditional put, e.g. pre-2024 S3). The SAME contention gate
  must FAIL on it — proving the contract test can actually catch a
  broken backend, not just bless a working one.

Reference parity: the conditional-put mapping (200/412/409) follows the
public S3 PutObject API docs; the LogStore contract is Delta's
(Armbrust VLDB'20 §3.2)."""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from aws_logs_parquet_converter_spark import storage as st

ROOT = "s3://test-bucket/tables/t1"


class _S3Error(Exception):
    def __init__(self, code: str):
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


class _Body:
    def __init__(self, data: bytes):
        self._data = data

    def read(self) -> bytes:
        return self._data


class _ConditionalS3Double:
    """Minimal in-memory S3: put/get/head/delete/list_v2 with honest
    ``If-None-Match: *`` semantics (atomic create under a lock)."""

    page_size = 3  # tiny, to force ListObjectsV2 pagination

    def __init__(self):
        self.objects: dict[tuple[str, str], tuple[bytes, float]] = {}
        self.lock = threading.Lock()
        self.clock = 1000.0
        self.conflicts_to_inject = 0  # raise N 409s before honoring a put

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        with self.lock:
            if IfNoneMatch == "*":
                if self.conflicts_to_inject > 0:
                    self.conflicts_to_inject -= 1
                    raise _S3Error("ConditionalRequestConflict")
                if (Bucket, Key) in self.objects:
                    raise _S3Error("PreconditionFailed")
            self.clock += 1.0
            self.objects[(Bucket, Key)] = (bytes(Body), self.clock)
        return {}

    def get_object(self, Bucket, Key):
        try:
            data, _ = self.objects[(Bucket, Key)]
        except KeyError:
            raise _S3Error("NoSuchKey") from None
        return {"Body": _Body(data)}

    def head_object(self, Bucket, Key):
        try:
            data, ts = self.objects[(Bucket, Key)]
        except KeyError:
            raise _S3Error("404") from None
        return {"ContentLength": len(data), "LastModified": ts}

    def delete_object(self, Bucket, Key):
        self.objects.pop((Bucket, Key), None)
        return {}

    def list_objects_v2(self, Bucket, Prefix="", ContinuationToken=None):
        keys = sorted(
            k for b, k in self.objects if b == Bucket and k.startswith(Prefix)
        )
        start = int(ContinuationToken or 0)
        page = keys[start : start + self.page_size]
        more = start + self.page_size < len(keys)
        out = {
            "Contents": [{"Key": k} for k in page],
            "IsTruncated": more,
        }
        if more:
            out["NextContinuationToken"] = str(start + self.page_size)
        return out


class _ClobberingS3Double(_ConditionalS3Double):
    """A backend WITHOUT conditional put: IfNoneMatch is ignored and the
    last writer always wins — the failure mode the contract must catch."""

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        with self.lock:
            self.clock += 1.0
            self.objects[(Bucket, Key)] = (bytes(Body), self.clock)
        return {}


def _store(double) -> st.S3ConditionalPutStorage:
    return st.S3ConditionalPutStorage(client=double)


def _race_one_key(store, rnd: int) -> list[bytes]:
    """12 threads slam one manifest key with distinct payloads; returns
    the payloads whose put reported True."""
    key = f"{st.SNAP_DIR}/{st.manifest_name(100 + rnd)}"

    def attempt(w: int):
        payload = f'{{"round": {rnd}, "writer": {w}}}'.encode()
        return store.put_if_absent_bytes(ROOT, key, payload), payload

    with ThreadPoolExecutor(max_workers=12) as ex:
        results = list(ex.map(attempt, range(12)))
    return [p for won, p in results if won]


def test_put_if_absent_exactly_one_winner_under_contention():
    """The LogStore gate, on the honest double: one winner per round and
    the stored object is byte-identical to that winner's payload."""
    store = _store(_ConditionalS3Double())
    for rnd in range(6):
        winners = _race_one_key(store, rnd)
        assert len(winners) == 1, f"round {rnd}: {len(winners)} winners"
        assert store.read_manifest_bytes(ROOT, 100 + rnd) == winners[0]


def test_contract_gate_catches_a_clobbering_backend():
    """The same gate on a backend that ignores If-None-Match MUST
    detect the violation — multiple writers report victory. If this
    test ever starts passing the exactly-one assertion, the gate has
    lost its teeth."""
    store = _store(_ClobberingS3Double())
    violated = False
    for rnd in range(6):
        if len(_race_one_key(store, rnd)) > 1:
            violated = True
            break
    assert violated, (
        "a clobbering backend slipped through the contention gate"
    )


def test_conflict_409_retries_then_wins():
    """409 ConditionalRequestConflict means a concurrent conditional
    write is in flight — the store must RETRY, never report False (a
    False with no committed winner is a lost commit)."""
    double = _ConditionalS3Double()
    double.conflicts_to_inject = 2
    store = _store(double)
    assert store.put_if_absent_bytes(ROOT, "_snapshots/v00000001.json", b"x")
    assert store.read_manifest_bytes(ROOT, 1) == b"x"


def test_conflict_409_exhausted_raises_not_false():
    double = _ConditionalS3Double()
    double.conflicts_to_inject = 99
    store = _store(double)
    store._CONFLICT_BACKOFFS = (0.0, 0.0)  # fast schedule for the test
    with pytest.raises(Exception, match="ConditionalRequestConflict"):
        store.put_if_absent_bytes(ROOT, "_snapshots/v00000001.json", b"x")


def test_verbs_roundtrip_and_pagination():
    store = _store(_ConditionalS3Double())
    for v in (1, 2, 3, 4, 5):
        assert store.put_if_absent_bytes(
            ROOT, f"{st.SNAP_DIR}/{st.manifest_name(v)}", b"{}"
        )
    store.put_bytes(ROOT, "data/c1/part-0.parquet", b"PAR1")
    store.put_bytes(ROOT, f"{st.SNAP_DIR}/.tmp-residue", b"x")
    # pagination: page_size=3 forces two+ ListObjectsV2 pages
    assert store.list_versions(ROOT) == [1, 2, 3, 4, 5]
    keys = store.list_keys(ROOT)
    assert "data/c1/part-0.parquet" in keys
    assert not [k for k in keys if k.rsplit("/", 1)[-1].startswith(".")]
    assert store.key_size(ROOT, "data/c1/part-0.parquet") == 4
    assert store.open_data_file(ROOT, "data/c1/part-0.parquet").read() == b"PAR1"
    assert store.manifest_exists(ROOT, 3)
    assert not store.manifest_exists(ROOT, 9)
    with pytest.raises(FileNotFoundError, match="no version 9"):
        store.read_manifest_bytes(ROOT, 9)
    m1 = store.manifest_mtime(ROOT, 1)
    m5 = store.manifest_mtime(ROOT, 5)
    assert m5 > m1
    store.delete_key(ROOT, "data/c1/part-0.parquet")
    assert "data/c1/part-0.parquet" not in store.list_keys(ROOT)
    # tip pointer: advisory write + tolerant read
    assert store.read_pointer(ROOT) is None
    store.write_pointer(ROOT, 5)
    assert store.read_pointer(ROOT) == 5
    assert st.current_version_fast(store, ROOT) == 5


def test_s3_scheme_registered_with_actionable_offline_error():
    """``storage_for_root`` dispatches s3:// to the class; without
    boto3 (this sandbox), the first real operation raises an actionable
    error naming the fix — never a silent fallback."""
    store = st.storage_for_root("s3://bucket/path")
    assert isinstance(store, st.S3ConditionalPutStorage)
    try:
        import boto3  # noqa: F401

        pytest.skip("boto3 present: the offline-error leg is moot")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="boto3"):
        store.list_versions("s3://bucket/path")


def test_store_is_picklable_without_client():
    import pickle

    double = _ConditionalS3Double()
    store = _store(double)
    store.put_bytes(ROOT, "a/b", b"z")
    clone = pickle.loads(pickle.dumps(store))
    assert isinstance(clone, st.S3ConditionalPutStorage)
    assert clone._client is None  # rebuilt lazily on first use


def test_bucket_key_mapping():
    bk = st.S3ConditionalPutStorage._bucket_key
    assert bk("s3://b/pre/fix", "data/x") == ("b", "pre/fix/data/x")
    assert bk("s3://b/pre/fix") == ("b", "pre/fix")
    assert bk("s3://b", "data/x") == ("b", "data/x")
    assert bk("s3://b/") == ("b", "")