"""Persistent BAM read-index cache (io.read_index).

The whole-file index scan was ~3s of spinup per streaming-infer run on
production-scale BAMs; the pre-filter scan columns now persist under the
user cache dir keyed by (path hash, size, mtime, required tags) so
repeat runs over the same file skip the scan entirely.
"""

import os
import shutil

import pytest

DATA = "/root/reference/tests/data"


@pytest.fixture
def cached_env(tmp_path, monkeypatch):
    """Writable BAM copy + isolated cache dir."""
    bam = tmp_path / "reads.bam"
    shutil.copy(f"{DATA}/can_mappings.bam", bam)
    monkeypatch.setenv(
        "REMORA_TPU_BAM_INDEX_CACHE_DIR", str(tmp_path / "idx_cache")
    )
    return str(bam)


def test_cache_round_trip(cached_env):
    from remora_tpu.io.read_index import ReadIndexedBam, _index_cache_path

    first = ReadIndexedBam(cached_env, req_tags={"mv"})
    assert os.path.exists(_index_cache_path(cached_env))
    second = ReadIndexedBam(cached_env, req_tags={"mv"})
    assert second._bam_idx == first._bam_idx
    assert second.skip_reasons == first.skip_reasons
    # runtime-only filters share the cache (pre-filter columns stored)
    loose = ReadIndexedBam(
        cached_env, skip_non_primary=False, req_tags={"mv"}
    )
    assert loose.num_records >= first.num_records
    # records fetched through the cached offsets decode correctly
    rid = first.read_ids[0]
    rec = second.get_first_alignment(rid)
    assert rec.query_name == rid or rec.get_tag("pi") == rid


def test_cache_invalidation_on_mtime(cached_env):
    from remora_tpu.io.read_index import ReadIndexedBam, _index_cache_path

    first = ReadIndexedBam(cached_env, req_tags={"mv"})
    cache = _index_cache_path(cached_env)
    stamp0 = os.stat(cache).st_mtime_ns
    os.utime(cached_env)  # simulate a rewrite
    again = ReadIndexedBam(cached_env, req_tags={"mv"})
    assert again._bam_idx == first._bam_idx
    assert os.stat(cache).st_mtime_ns != stamp0  # rescanned + rewritten


def test_cache_keyed_by_req_tags(cached_env):
    from remora_tpu.io.read_index import ReadIndexedBam

    with_tags = ReadIndexedBam(cached_env, req_tags={"mv"})
    without = ReadIndexedBam(cached_env)
    # the no-tag-requirement index admits at least as many records
    assert without.num_records >= with_tags.num_records


def test_cache_never_writes_beside_the_bam(cached_env):
    from remora_tpu.io.read_index import ReadIndexedBam

    ReadIndexedBam(cached_env, req_tags={"mv"})
    beside = [
        p
        for p in os.listdir(os.path.dirname(cached_env))
        if "rtidx" in p
    ]
    assert beside == []


def test_cache_kill_switch(cached_env, monkeypatch):
    from remora_tpu.io.read_index import ReadIndexedBam, _index_cache_path

    monkeypatch.setenv("REMORA_TPU_BAM_INDEX_CACHE", "0")
    ReadIndexedBam(cached_env, req_tags={"mv"})
    assert not os.path.exists(_index_cache_path(cached_env))
