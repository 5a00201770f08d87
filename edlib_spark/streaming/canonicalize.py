"""Custom stateful streaming operator: incremental conversation
canonicalization with ``applyInPandasWithState``.

Turns for one conv_id may be spread across micro-batches (and arrive
out of order).  State per conv_id accumulates (turn_idx, text) pairs;
the canonical row — turns sorted by turn_idx, joined with the engine's
separator — is emitted when the conversation's end marker arrives
(``role == end_role``), with a processing-time timeout as the fallback
for conversations whose marker never shows (late/lost data).

This is the streaming twin of operators.canonicalize: same separator,
same ordering invariant (per-turn text equality under stable
(conv_id, turn_idx) ordering), state bounded per conversation.

Production state-store note: the default HDFSBackedStateStoreProvider
keeps every state row on the executor HEAP (plus checkpoint copies).
At deployment scale — millions of in-flight conversations, each
holding its accumulated turns — configure the RocksDB provider so
state lives off-heap on local disk with incremental checkpointing:

    spark.sql.streaming.stateStore.providerClass =
        org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled = true

Both stateful operators here (applyInPandasWithState and
dropDuplicatesWithinWatermark in scorer.dedup_pair_stream) run
unchanged on either provider — the RocksDB path is exercised by
tests/test_streaming.py::test_stream_canonicalize_on_rocksdb_state_store
(same output as the default provider).  Timeout/tombstone behavior
under a continuous processing-time trigger is soaked in
tests/test_streaming.py::test_stream_canonicalize_continuous_soak.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..operators.canonicalize import TURN_SEP

CANONICAL_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("full_text", StringType()),
    StructField("n_turns", LongType()),
    StructField("complete", StringType()),  # 'end' | 'timeout'
])

_STATE_SCHEMA = StructType([
    StructField("idxs", ArrayType(IntegerType())),
    StructField("texts", ArrayType(StringType())),
    # 1 after the conversation has been emitted: the state row becomes a
    # TOMBSTONE that swallows post-marker stragglers, so a conv_id is
    # emitted at most once (late turns would otherwise recreate fresh
    # state and eventually emit a duplicate partial row)
    StructField("done", IntegerType()),
])


def stream_canonicalize(turns: DataFrame, end_role: str = "end",
                        timeout_ms: int | None = None,
                        sep: str = TURN_SEP) -> DataFrame:
    """(conv_id, turn_idx, role, text) stream -> canonical conversation
    stream.  Marker turns (role == end_role) trigger emission and are
    excluded from the canonical text.

    ``timeout_ms``: optional processing-time timeout that flushes
    conversations whose end marker never arrives.  Leave None (default)
    for availableNow/backfill runs: with ProcessingTimeTimeout set,
    Spark's availableNow trigger keeps scheduling no-data batches and
    the query never self-terminates (observed on Spark 4.1); enable it
    only for continuously-running deployments.

    Emission is AT-MOST-ONCE per conv_id: after the end marker fires,
    the state row stays behind as a tombstone that swallows late turns
    (they would otherwise recreate fresh state and emit a duplicate
    partial row).  With ``timeout_ms`` set, tombstones expire with the
    same timeout; with NoTimeout they are retained for the lifetime of
    the (availableNow/backfill) run."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if state.hasTimedOut:
            idxs, texts, done = state.get
            if done:
                state.remove()  # tombstone expiry: emit nothing
                return
            # timeout flush EMITS, and must leave a tombstone exactly
            # like the end-marker path — otherwise a late straggler
            # recreates fresh state and a second (duplicate) partial
            # row is eventually emitted for the same conv_id
            state.update(([], [], 1))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            yield _emit(conv_id, idxs, texts, sep, "timeout")
            return
        idxs, texts, done = state.get if state.exists else ([], [], 0)
        if done:
            # already emitted: swallow stragglers, keep the tombstone
            for _ in pdfs:
                pass
            state.update(([], [], 1))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            return
        idxs, texts = list(idxs), list(texts)
        saw_end = False
        for pdf in pdfs:
            saw_end |= bool((pdf["role"] == end_role).any())
            keep = pdf[pdf["role"] != end_role]
            idxs.extend(keep["turn_idx"].astype("int64").tolist())
            texts.extend(keep["text"].fillna("").tolist())
        if saw_end:
            state.update(([], [], 1))  # tombstone against late turns
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            yield _emit(conv_id, idxs, texts, sep, "end")
        else:
            state.update((idxs, texts, 0))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if timeout_ms is not None
                    else GroupStateTimeout.NoTimeout)
    return (turns.groupBy("conv_id")
            .applyInPandasWithState(fn, CANONICAL_SCHEMA, _STATE_SCHEMA,
                                    "append", timeout_conf))


def make_tws_canonicalize_processor(end_role: str = "end",
                                    timeout_ms: int | None = None,
                                    sep: str = TURN_SEP):
    """Build the StatefulProcessor behind :func:`stream_canonicalize_tws`
    (factory so tests can drive the processor directly with fake state
    handles — the live transformWithStateInPandas path needs the
    ``protobuf`` package, see stream_canonicalize_tws)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class _Canon(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._turns = handle.getListState(
                "turns", "turn_idx integer, text string")
            self._done = handle.getValueState("done", "done integer")

        def _arm(self, timer_values) -> None:
            if timeout_ms is None:
                return
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timer_values.getCurrentProcessingTimeInMs() + timeout_ms)

        def _flush(self, conv_id, how, timer_values):
            pairs = list(self._turns.get())
            idxs = [int(p[0]) for p in pairs]
            texts = [p[1] for p in pairs]
            self._turns.clear()
            self._done.update((1,))
            self._arm(timer_values)  # tombstone expiry clock
            return iter([_emit(conv_id, idxs, texts, sep, how)])

        def handleInputRows(self, key, rows, timerValues):
            conv_id = key[0]
            if self._done.exists():
                for _ in rows:     # swallow post-emission stragglers
                    pass
                self._arm(timerValues)
                return iter(())
            new = []
            saw_end = False
            for pdf in rows:
                saw_end |= bool((pdf["role"] == end_role).any())
                keep = pdf[pdf["role"] != end_role]
                new.extend(
                    zip(keep["turn_idx"].astype("int64").tolist(),
                        keep["text"].fillna("").tolist()))
            if new:
                self._turns.appendList(
                    [(int(i), t) for i, t in new])
            if saw_end:
                return self._flush(conv_id, "end", timerValues)
            self._arm(timerValues)
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if self._done.exists():
                # tombstone expiry: drop all state, emit nothing
                self._done.clear()
                self._turns.clear()
                return iter(())
            return self._flush(key[0], "timeout", timerValues)

        def close(self) -> None:
            pass

    return _Canon()


def stream_canonicalize_tws(turns: DataFrame, end_role: str = "end",
                            timeout_ms: int | None = None,
                            sep: str = TURN_SEP) -> DataFrame:
    """``transformWithStateInPandas`` twin of :func:`stream_canonicalize`
    — the Spark 4.x successor stateful API (StatefulProcessor + typed
    state handles + explicit timers), semantically identical (the
    processor logic is pinned by tests/test_streaming.py::
    test_tws_processor_logic_matches_semantics; the live-query
    equivalence test runs wherever the protobuf dependency exists).

    Migration evaluation (round-4 verdict item 8) — DECISION: keep
    ``stream_canonicalize`` (applyInPandasWithState) the default,
    ship this twin ready for deployments that can run it:

    * The new API is a genuine fit: ``ListState`` lets stragglers
      APPEND in O(delta) where applyInPandasWithState rewrites the
      whole accumulated array every micro-batch, and the tombstone is
      a separate ``ValueState`` instead of a sentinel packed into one
      state row.
    * ``transformWithStateInPandas`` requires the RocksDB state-store
      provider (already this engine's documented production config)
      AND the ``protobuf`` Python package — its state server speaks
      protobuf (pyspark/sql/streaming/proto/StateMessage_pb2), and the
      import error crashes the TWS driver worker
      (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).  protobuf is
      not installed in this container, so the old operator remains
      the default; revisit when applyInPandasWithState is formally
      deprecated and protobuf is a standard dependency.
    * Timers are absolute and survive re-registration, so the
      per-batch re-arm DELETES stale timers first; with
      ``timeMode='none'`` (the availableNow/backfill default) no
      timers exist, mirroring the NoTimeout default and sidestepping
      the availableNow+ProcessingTimeTimeout hang documented on the
      old operator.
    """
    proc = make_tws_canonicalize_processor(end_role, timeout_ms, sep)
    time_mode = "processingTime" if timeout_ms is not None else "none"
    return (turns.groupBy("conv_id")
            .transformWithStateInPandas(proc, CANONICAL_SCHEMA,
                                        "append", time_mode))


def _emit(conv_id: str, idxs: list, texts: list, sep: str,
          how: str) -> pd.DataFrame:
    order = sorted(range(len(idxs)), key=lambda i: (idxs[i], texts[i]))
    full = sep.join(texts[i] for i in order)
    return pd.DataFrame({"conv_id": [conv_id], "full_text": [full],
                         "n_turns": [len(idxs)], "complete": [how]})
