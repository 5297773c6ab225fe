"""LLM-data-pipeline declared queries (SURVEY.md §2.E). Filled in M4."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict[str, str] = {}
