"""Dependency-graph / owner-mapping / review-gate declared queries
(SURVEY.md §2.A/B). Filled in M3."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict[str, str] = {}
