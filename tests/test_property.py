"""Property-based tests (SURVEY.md §5): hypothesis-generated random data
through the real engine.

1. Round-trip: random typed rows → JSON envelope (positional key, named
   payload, base64 Bytes, ISO instants) → decode_cdc → values equal.
2. Ordering: random U/D interleavings per key → engine's last-wins merge
   result equals a sequential per-key apply.

Each hypothesis example drives a full Spark job, so example counts are
deliberately small — the *width* of each generated batch does the work.
"""

import base64
import math
from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from ydb_cdc_processor_spark.operators.decode import decode_cdc
from ydb_cdc_processor_spark.operators.last_wins import (
    collapse_last_wins, split_upsert_delete)
from ydb_cdc_processor_spark.sources.cdc_json import envelope

MEMBERS = {
    "id": "Int64",
    "flag": "Optional<Bool>",
    "small": "Optional<Int8>",
    "big": "Optional<Uint64>",
    "ratio": "Optional<Double>",
    "name": "Text",
    "blob": "Optional<Bytes>",
    "num": "Optional<Decimal(22,9)>",
    "at": "Optional<Timestamp>",
}

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    max_size=40)
doubles = st.floats(allow_nan=False, allow_infinity=False,
                    min_value=-1e12, max_value=1e12)
timestamps = st.datetimes(
    min_value=datetime(1971, 1, 1), max_value=datetime(2100, 1, 1)) \
    .map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000))

row_strategy = st.fixed_dictionaries({
    "flag": st.none() | st.booleans(),
    "small": st.none() | st.integers(-128, 127),
    "big": st.none() | st.integers(0, 2**63 - 1),
    "ratio": st.none() | doubles,
    "name": texts,
    "blob": st.none() | st.binary(max_size=32),
    "num": st.none() | st.decimals(
        min_value=-10**12, max_value=10**12, places=9, allow_nan=False),
    "at": st.none() | timestamps,
})


def _wire(v):
    """Python value → JSON-envelope wire value (the producer side the
    reference's YDB changefeed implements)."""
    if isinstance(v, bytes):
        return base64.b64encode(v).decode()
    if isinstance(v, datetime):
        return v.replace(tzinfo=timezone.utc).isoformat().replace("+00:00", "Z")
    import decimal
    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(row_strategy, min_size=1, max_size=30))
def test_decode_round_trip(spark, rows):
    lines = [
        envelope([i], {k: _wire(v) for k, v in r.items()})
        for i, r in enumerate(rows)]
    raw = spark.createDataFrame([(ln,) for ln in lines], "value string")
    out = decode_cdc(raw, MEMBERS, pk=["id"]).orderBy("id").collect()
    assert len(out) == len(rows)
    for i, (got, want) in enumerate(zip(out, rows)):
        assert got.id == i
        assert got.flag == want["flag"]
        assert got.small == want["small"]
        assert got.big == want["big"]
        if want["ratio"] is None:
            assert got.ratio is None
        else:
            assert got.ratio == pytest.approx(want["ratio"], rel=1e-15)
        assert got.name == want["name"]
        assert got.blob == (None if want["blob"] is None
                            else bytearray(want["blob"]))
        if want["num"] is None:
            assert got.num is None
        else:
            assert got.num == want["num"]
        if want["at"] is None:
            assert got.at is None
        else:
            assert got.at == want["at"]


ops = st.lists(
    st.tuples(st.integers(0, 5),                 # key
              st.sampled_from(["U", "D"]),       # kind
              st.integers(0, 10**6)),            # payload value
    min_size=1, max_size=60)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seq=ops)
def test_last_wins_matches_sequential_apply(spark, seq):
    """The engine's last-wins collapse + U/D split must reproduce a strict
    sequential apply of the interleaving (the reference's single-threaded
    per-partition writer, YqlWriter.java:117-120,184-207)."""
    state: dict[int, int] = {}
    for key, kind, val in seq:
        if kind == "U":
            state[key] = val
        else:
            state.pop(key, None)

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("val", T.LongType()),
        T.StructField("_offset", T.LongType()),
    ])
    df = spark.createDataFrame(
        [(k, kind, v, off) for off, (k, kind, v) in enumerate(seq)], schema)
    collapsed = collapse_last_wins(df, ["id"], order_col="_offset")
    ups, dels = split_upsert_delete(collapsed)
    got_up = {r.id: r.val for r in ups.collect()}
    got_del = {r.id for r in dels.collect()}
    assert got_up == state
    # deleted keys: exactly those whose LAST op was D
    last_kind = {}
    for key, kind, _v in seq:
        last_kind[key] = kind
    assert got_del == {k for k, kind in last_kind.items() if kind == "D"}
    assert not (got_del & set(got_up))


engine_ops = st.lists(
    st.tuples(st.integers(0, 7),                  # key
              st.sampled_from(["U", "D"]),        # kind
              st.integers(0, 10**6)),             # value
    min_size=1, max_size=40)


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=st.lists(engine_ops, min_size=1, max_size=3),
       config=st.sampled_from(["both", "no_delete", "no_update"]))
def test_engine_matches_sequential_apply(spark, tmp_path_factory,
                                         batches, config):
    """Full-engine property: random U/D envelope interleavings applied in
    several micro-batches equal a strict sequential per-message apply —
    including the skip semantics when a kind is unconfigured (a skipped
    message is a NO-OP, not a cancellation)."""
    import json
    import tempfile

    from pyspark.sql import types as T
    from ydb_cdc_processor_spark.engine import CdcBatchEngine
    from ydb_cdc_processor_spark.plans.pipeline import CdcPipeline

    # python sequential oracle
    state: dict[int, int] = {}
    for batch in batches:
        for key, kind, val in batch:
            if kind == "U" and config != "no_update":
                state[key] = val
            elif kind == "D" and config != "no_delete":
                state.pop(key, None)

    source_schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("val", T.LongType(), True),
    ])
    p = CdcPipeline(
        name="prop", source_schema=source_schema, pk=["id"],
        members={"id": "Int64", "val": "Optional<Int64>"},
        update_sql=None if config == "no_update"
        else "SELECT id, val FROM rows",
        delete_sql=None if config == "no_delete"
        else "SELECT id FROM rows").validate(spark)

    work = tempfile.mkdtemp(dir=str(tmp_path_factory.mktemp("engprop")))
    eng = CdcBatchEngine(spark, p, work + "/view")
    for batch in batches:
        lines = []
        for off, (key, kind, val) in enumerate(batch):
            env = ({"key": [key], "erase": {}} if kind == "D"
                   else {"key": [key], "update": {"val": val}})
            lines.append((json.dumps(env), 0, off))
        raw = spark.createDataFrame(
            lines, "value string, _partition int, _offset long")
        eng.apply_raw_batch(raw)

    if not state and not eng._target(None).exists():
        return  # nothing ever written — consistent with empty state
    got = {r.id: r.val for r in eng.read_view().collect()}
    assert got == state


# ---------------------------------------------------------------------------
# 4. IVM invariant: over ANY random sequence of upsert/delete batches, the
#    incrementally-maintained rollup equals a full recompute of the final
#    row state (operators/agg_view.py).
# ---------------------------------------------------------------------------

ivm_batches = st.lists(
    st.lists(
        st.tuples(st.integers(0, 15),              # key
                  st.integers(0, 3),               # group
                  st.none() | st.integers(-100, 100),  # measure (nullable)
                  st.booleans()),                  # True = delete
        min_size=1, max_size=12),
    min_size=1, max_size=4)


@pytest.mark.parametrize("backend", ["flat", "bucketed"])
@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(batches=ivm_batches)
def test_agg_view_random_batches(spark, tmp_path_factory, backend, batches):
    """Both store backends; every batch is applied under a replay fence
    token and immediately REPLAYED with the same token — the replay must
    be a no-op (flat: meta-file fence; bucketed: per-bucket tokens), so
    the final rollup still equals a full recompute."""
    from pyspark.sql import functions as F

    from ydb_cdc_processor_spark.operators.agg_view import AggregateView
    from ydb_cdc_processor_spark.operators.merge import (
        merge_delete, merge_upsert)

    root = str(tmp_path_factory.mktemp("ivm"))
    schema = "k long, g long, v double"
    state = spark.createDataFrame([], schema)
    av = AggregateView(spark, root + "/agg", ["g"], {"sv": "v"},
                       count_col="n", backend=backend, n_buckets=4)
    for bi, batch in enumerate(batches):
        # last occurrence of a key wins inside a batch (B4 semantics)
        final = {}
        for k, g, v, is_del in batch:
            final[k] = (k, g, v, is_del)
        ups = [(k, g, float(v) if v is not None else None)
               for k, g, v, d in final.values() if not d]
        dels = [(k,) for k, g, v, d in final.values() if d]
        keys = [r[0] for r in final.values()]
        old = state.where(F.col("k").isin(keys)).localCheckpoint(eager=True)
        new_rows = spark.createDataFrame(ups, schema) if ups else None
        # one contribution step per batch covers both kinds: -old for
        # every touched key, +new for the upserted rows
        av.apply_delta(new_rows=new_rows, old_rows=old,
                       batch_token=f"b{bi}")
        # at-least-once delivery: the same batch redelivered must not
        # double-count (±deltas are not idempotent; the fence is)
        av.apply_delta(new_rows=new_rows, old_rows=old,
                       batch_token=f"b{bi}")
        if ups:
            state = merge_upsert(state, spark.createDataFrame(ups, schema),
                                 ["k"])
        if dels:
            state = merge_delete(
                state, spark.createDataFrame(dels, "k long"), ["k"])
        state = state.localCheckpoint(eager=True)
    got = {(r.g, r.n, None if r.sv is None else round(r.sv, 6))
           for r in av.read().collect()}
    exp = {(r.g, r.n, None if r.sv is None else round(r.sv, 6))
           for r in state.groupBy("g")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(38,6)"))
                 .cast("double").alias("sv")).collect()}
    assert got == exp


# ---------------------------------------------------------------------------
# 4. As-of join: random (probe, build) sets vs a driver-side reference.
# ---------------------------------------------------------------------------

@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_asof_join_matches_reference(spark, data):
    """operators/temporal.as_of_join equals the per-row definition
    (latest build with ts <= probe ts per key; ties match) on random
    key/timestamp mixes with duplicate probe timestamps and keys that
    exist on only one side."""
    from ydb_cdc_processor_spark.operators.temporal import as_of_join

    keys = ["k0", "k1", "k2"]
    probe_rows = data.draw(st.lists(
        st.tuples(st.integers(0, 99), st.sampled_from(keys),
                  st.integers(0, 50)),
        min_size=1, max_size=25))
    build_rows = data.draw(st.lists(
        st.tuples(st.sampled_from(keys + ["only_build"]),
                  st.integers(0, 50), st.integers(0, 9)),
        min_size=0, max_size=25, unique_by=lambda r: (r[0], r[1])))

    probe = spark.createDataFrame(probe_rows, "id long, k string, ts long")
    build = spark.createDataFrame(build_rows, "k string, ts long, val long")
    got = {(r.id, r.k, r.ts): r.val_asof
           for r in as_of_join(probe, build, keys=["k"]).collect()}

    def ref(k, ts):
        cands = [(bts, v) for bk, bts, v in build_rows
                 if bk == k and bts <= ts]
        return max(cands)[1] if cands else None

    exp = {(i, k, ts): ref(k, ts) for i, k, ts in probe_rows}
    assert got == exp


# ---------------------------------------------------------------------------
# Prefix-filtered set-similarity join: lossless vs brute force
# ---------------------------------------------------------------------------

_simjoin_corpus = st.lists(
    st.lists(st.integers(min_value=0, max_value=24), min_size=1,
             max_size=18).map(lambda xs: " ".join(f"t{x}" for x in xs)),
    min_size=2, max_size=25)


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_simjoin_corpus,
       thr=st.sampled_from([0.5, 0.66, 0.8, 0.9, 0.99, 1.0]))
def test_jaccard_simjoin_lossless(spark, texts, thr):
    """The prefix filter must find EVERY pair with J >= t — including
    duplicate token sets (J = 1.0), threshold 1.0, and prefix lengths
    at the float-boundary ceil cases the ε-guard protects."""
    import itertools

    from ydb_cdc_processor_spark.operators.dedup import (
        jaccard_similarity_join)

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): (r.n_inter, r.jaccard)
           for r in jaccard_similarity_join(docs, threshold=thr).collect()}
    sets = {i: set(t.split()) for i, t in enumerate(texts)}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        j = inter / len(sets[a] | sets[b])
        if j >= thr:
            want[(a, b)] = inter
    assert set(got) == set(want)
    for k, inter in want.items():
        assert got[k][0] == inter
