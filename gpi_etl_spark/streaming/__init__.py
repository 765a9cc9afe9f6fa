"""Structured Streaming surface.

The reference has no streaming (SURVEY.md §2.9): its incrementality is
batch high-watermark. These helpers give the engine the streaming twins
of those semantics — ``Trigger.AvailableNow``-style batch-incremental,
watermarked late-data handling, tumbling/sliding/session windows.
"""
