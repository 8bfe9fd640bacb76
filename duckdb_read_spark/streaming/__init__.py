"""Streaming mode (SURVEY §7 P5): Structured Streaming over the events log.

The reference notes' WAL→apply→frontier flow (/root/reference/neon:51-59:
safekeeper streams WAL, pageserver applies in LSN order, last_record_lsn is
the consistency frontier) maps onto Structured Streaming: the events table
is the append log, micro-batch apply is the WAL apply, and the watermark is
the frontier below which state can be finalized and emitted.
"""

from .sink import write_stream_versioned
from .source import events_stream
from .stateful import running_totals, stream_dedup
from .windows import (
    session_aggs,
    sliding_counts,
    stream_stream_interval_join,
    tumbling_counts,
)

__all__ = [
    "events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_aggs",
    "running_totals",
    "stream_dedup",
    "write_stream_versioned",
]
