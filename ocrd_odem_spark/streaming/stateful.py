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
