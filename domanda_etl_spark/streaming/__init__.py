from .incremental import (
    foreach_batch_latest_wins_overwrite,
    incremental_lookback,
    stream_dedup,
)

__all__ = [
    "incremental_lookback",
    "stream_dedup",
    "foreach_batch_latest_wins_overwrite",
]
