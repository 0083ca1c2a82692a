"""Structured Streaming operators (SURVEY.md §2.8) — filled in Phase 4.

Placeholder module so the registry import graph is stable; streaming
keys register here as they are implemented.
"""
