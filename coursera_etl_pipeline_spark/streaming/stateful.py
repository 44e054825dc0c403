"""Custom stateful streaming operator via applyInPandasWithState:
a per-user running profile (event count, value sum, last event time)
maintained across micro-batches.

This is the escape hatch for stateful semantics the built-in window/
dedup operators can't express (SURVEY §2.2 streaming note). State is
partitioned by key across executors. The operator here runs with
NoTimeout — right for the bounded availableNow parity runs, where
every key's profile must survive to the last tick; an unbounded
production deployment would pass GroupStateTimeout.ProcessingTimeTimeout
and call state.setTimeoutDuration per update so idle keys evict,
bounding memory exactly like a watermark bounds window state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total_micros long, last_ts timestamp"


def _update_profile(key, batches: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total_micros, last_ts = state.get
    else:
        n, total_micros, last_ts = 0, 0, None
    for pdf in batches:
        n += len(pdf)
        # integer micro-units via the SAME per-row IEEE ops as
        # registry.dsum (x*1e6 + 0.5, floor): the accumulated total is
        # order-independent and bit-identical to the batch dsum oracle,
        # where a raw float sum would drift with pandas' batch order.
        import numpy as np

        # sum with dtype=object -> arbitrary-precision Python ints, so
        # the reduction itself can NEVER wrap (np int64 sums wrap
        # silently — the batch-side dsum moved to DECIMAL(38,0) for
        # exactly this reason).
        total_micros += int(
            np.floor(pdf["value"].to_numpy() * 1e6 + 0.5)
            .astype("int64").sum(dtype=object))
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    # The STATE column is int64 (state schemas have no DECIMAL(38,0)
    # equivalent), so the per-user running total has a hard bound of
    # ~9.2e12 currency units — per KEY, not per table, so vastly wider
    # than dsum's per-group sf~200 bound; a key that reaches it fails
    # LOUDLY here instead of wrapping into a corrupt profile.
    if total_micros > 0x7FFF_FFFF_FFFF_FFFF:
        raise OverflowError(
            f"user {user_id}: running total {total_micros} micros exceeds "
            "the int64 state bound (~9.2e12 units per key); shard the key "
            "or widen the state encoding before this point")
    state.update((n, total_micros, last_ts))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "total_value": [total_micros / 1e6], "last_ts": [last_ts]})


def user_profiles(events: DataFrame) -> DataFrame:
    """Running per-user profile emitted each micro-batch (update mode).
    Input needs columns: user_id, ts, value."""
    return (events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))
