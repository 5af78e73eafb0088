"""GenerationStore — the manifest-pointer commit protocol under
object-store semantics (no atomic directory rename anywhere).

Every test runs the store under ObjectStoreSimStorage, which RAISES on
any directory rename — passing proves the protocol never depends on
the primitive object stores lack.  The contrast test pins that the
rename-based bucketed store genuinely needs that primitive (why this
class exists)."""

from __future__ import annotations

import os

import pytest

from ydb_cdc_processor_spark import storage
from ydb_cdc_processor_spark.operators.generation_store import (
    GenerationStore)
from ydb_cdc_processor_spark.storage import ObjectStoreSimStorage


@pytest.fixture
def objstore():
    with storage.backend_scope(ObjectStoreSimStorage()) as b:
        yield b


def _rows(spark, triples):
    return spark.createDataFrame(triples, "k int, grp string, v int")


def test_lifecycle_under_object_store_semantics(spark, tmp_path, objstore):
    gs = GenerationStore(spark, str(tmp_path / "gs"), ["k"], n_buckets=4)
    gs.apply(_rows(spark, [(i, "a", i * 10) for i in range(20)]),
             batch_token="g:0")
    gs.apply(_rows(spark, [(3, "b", 999), (21, "b", 210)]),
             batch_token="g:1")                       # update + insert
    gs.apply(spark.createDataFrame([(5,), (6,)], "k int"),
             action="deleteFrom", batch_token="g:2")
    got = {(r["k"], r["grp"], r["v"]) for r in gs.read().collect()}
    want = ({(i, "a", i * 10) for i in range(20) if i not in (3, 5, 6)}
            | {(3, "b", 999), (21, "b", 210)})
    assert got == want


def test_replay_token_skips_whole_batch(spark, tmp_path, objstore):
    gs = GenerationStore(spark, str(tmp_path / "gs"), ["k"], n_buckets=4)
    b = _rows(spark, [(1, "a", 1), (2, "a", 2)])
    gs.apply(b, batch_token="g:0")
    gens_before = gs.gens()
    gs.apply(b, batch_token="g:0")        # checkpoint replay
    assert gs.gens() == gens_before       # no new generation minted
    assert gs.read().count() == 2


def test_crash_before_manifest_swap_is_invisible_then_converges(
        spark, tmp_path, objstore):
    """The only crash window: generations uploaded, manifest swap never
    ran.  Readers must see the OLD state (nothing references the new
    generation), vacuum must GC the strays, and the replay must land
    the batch exactly once."""
    gs = GenerationStore(spark, str(tmp_path / "gs"), ["k"], n_buckets=4)
    gs.apply(_rows(spark, [(i, "a", i) for i in range(8)]),
             batch_token="g:0")
    before = {(r["k"], r["v"]) for r in gs.read().select("k", "v")
              .collect()}
    orig = gs._commit

    def boom(mutate):
        raise RuntimeError("crash at the commit point")
    gs._commit = boom
    try:
        with pytest.raises(RuntimeError, match="crash at the commit"):
            gs.apply(_rows(spark, [(0, "a", 100), (99, "a", 99)]),
                     batch_token="g:1")
    finally:
        gs._commit = orig
    # torn upload is invisible — the reader plan comes from the manifest
    assert {(r["k"], r["v"]) for r in gs.read().select("k", "v")
            .collect()} == before
    assert gs.vacuum() > 0                      # strays GC'd
    gs.apply(_rows(spark, [(0, "a", 100), (99, "a", 99)]),
             batch_token="g:1")                 # replay converges
    after = {(r["k"], r["v"]) for r in gs.read().select("k", "v")
             .collect()}
    assert after == (before - {(0, 0)}) | {(0, 100), (99, 99)}


def test_superseded_generations_unreachable_even_if_delete_fails(
        spark, tmp_path, objstore):
    """Correctness never depends on the GC delete landing: leave the
    old generation dirs on disk and the reader must still see only the
    manifest's current generations."""
    gs = GenerationStore(spark, str(tmp_path / "gs"), ["k"], n_buckets=2)
    orig_rm = storage.get_backend().remove_tree
    storage.get_backend().remove_tree = lambda p: None   # deletes fail
    try:
        gs.apply(_rows(spark, [(1, "a", 1), (2, "a", 2)]),
                 batch_token="g:0")
        gs.apply(_rows(spark, [(1, "a", 11)]), batch_token="g:1")
    finally:
        storage.get_backend().remove_tree = orig_rm
    got = {(r["k"], r["v"]) for r in gs.read().select("k", "v").collect()}
    assert got == {(1, 11), (2, 2)}
    # stale generation dirs ARE on disk, just unreachable
    root = str(tmp_path / "gs")
    stale = [g for e in os.listdir(root) if e.startswith("b=")
             for g in os.listdir(os.path.join(root, e))]
    assert len(stale) > len(gs.gens())
    gs.vacuum()


def test_reopen_reads_manifest_layout(spark, tmp_path, objstore):
    gs = GenerationStore(spark, str(tmp_path / "gs"), ["k"], n_buckets=8)
    gs.apply(_rows(spark, [(1, "a", 1)]), batch_token="g:0")
    again = GenerationStore(spark, str(tmp_path / "gs"), ["k"],
                            n_buckets=64)      # stale constructor default
    assert again.n_buckets == 8                # manifest wins
    assert again.read().count() == 1


def test_bucketed_store_needs_the_rename_object_stores_lack(
        spark, tmp_path, objstore):
    """The contrast pin: the rename-promotion bucketed store CANNOT run
    under object-store semantics — exactly the gap GenerationStore's
    manifest-pointer commit closes (SCALING.md round-14)."""
    from ydb_cdc_processor_spark.operators.bucketed_view import (
        BucketedMaterializedView)
    mv = BucketedMaterializedView(spark, str(tmp_path / "mv"), ["k"],
                                  n_buckets=4)
    with pytest.raises(OSError, match="no atomic directory rename"):
        mv.apply(spark.createDataFrame([(1, 1)], "k int, v int"),
                 action="upsertInto")          # promotion needs rename
