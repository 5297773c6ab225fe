"""Structured Streaming surfaces (SURVEY.md §2.E E10-E15) — thin wrappers
over batch-tested logic; the driver's oracle gate is batch-only, so these
are covered by smoke tests (tests/test_streaming.py)."""
