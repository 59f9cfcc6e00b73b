"""Structured Streaming operators over the decoded event stream:
event-time windows with watermarks, stateful dedup, sessionization, and
exactly-once sinks (SURVEY.md §7 phase 3d)."""
