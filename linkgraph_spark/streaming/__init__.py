"""Structured Streaming surface: incremental transcript ingestion.

The reference is strictly batch (SURVEY.md §2.9: no streaming, no
watermarks, no state store); production transcript tables grow
continuously, so the engine adds the streaming half: tool-edge extraction
on the stream, watermarked windowed activity, and incremental degree
maintenance into the same checkpoint-table layout the batch kernels use.
"""

from linkgraph_spark.streaming.dedup_stream import (
    stream_dedup_turns,
    stream_exact_dedup,
)
from linkgraph_spark.streaming.transcript_stream import (
    incremental_degrees,
    merge_degree_batch,
    read_degree_state,
    read_transcript_stream,
    stream_adjacent_edges,
    stream_tool_edges,
    trending_tools,
    windowed_role_activity,
    windowed_tool_counts,
)

__all__ = [
    "read_transcript_stream",
    "stream_tool_edges",
    "trending_tools",
    "windowed_role_activity",
    "windowed_tool_counts",
    "incremental_degrees",
    "merge_degree_batch",
    "read_degree_state",
    "stream_adjacent_edges",
    "stream_dedup_turns",
    "stream_exact_dedup",
]
