"""Custom stateful streaming operator (``applyInPandasWithState``).

The reference's record state machine is driver-side bookkeeping; its
Spark-native generalisation is keyed state inside the stream: here a
running per-user activity profile (event count, value sum, last event type)
maintained across micro-batches in the state store, surviving restarts via
the stream checkpoint.  This is the pattern for any custom sessionization /
incremental-dedup / rate-limit operator the built-in windowed aggregations
cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, last_type string"
)
STATE_SCHEMA = "n long, total double, last string"


def _update_user_profile(key, pdfs, state: GroupState):
    import pandas as pd

    n, total, last = (state.get if state.exists else (0, 0.0, None))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = str(pdf.sort_values("ts")["event_type"].iloc[-1])
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [round(total, 4)],
            "last_type": [last],
        }
    )


def user_profiles_stream(events: DataFrame) -> DataFrame:
    """Streaming keyed-state profile per user (update output mode)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming exact dedup: the incremental analog of dedup.exact_duplicates.
# A training-data ingest stream must drop re-crawled/duplicate documents
# the moment they arrive — batch dedup over the full corpus cannot keep up
# with a continuous feed.  Keyed state holds (keeper, n_seen) per content
# hash: the first-seen document is emitted once, every later duplicate is
# suppressed and counted.  State persists across micro-batches AND query
# restarts via the stream checkpoint; at cluster scale the state store
# shards by hash exactly like the batch groupBy would.

DEDUP_OUTPUT_SCHEMA = "content_hash string, doc_id string, text string"
DEDUP_STATE_SCHEMA = "keeper string, n_seen long"


def _dedup_update(key, pdfs, state: GroupState):
    import pandas as pd

    keeper, n_seen = (state.get if state.exists else (None, 0))
    first_rows = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        n_seen += len(pdf)
        if keeper is None:
            # deterministic within the batch: min doc_id wins
            first = pdf.sort_values("doc_id").iloc[0]
            keeper = str(first["doc_id"])
            first_rows = pd.DataFrame(
                {
                    "content_hash": [key[0]],
                    "doc_id": [keeper],
                    "text": [first["text"]],
                }
            )
    state.update((keeper, n_seen))
    if first_rows is not None:
        yield first_rows


def exact_dedup_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming exact dedup keyed by content hash (append semantics):
    each distinct text is emitted exactly once — the first-seen document
    survives (min ``doc_id`` within its arrival batch); later duplicates
    are dropped inside the state store, across restarts."""
    from pyspark.sql import functions as F

    hashed = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _dedup_update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
