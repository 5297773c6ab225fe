"""Kimball SQL-mart declared queries (SURVEY.md §2.C). Filled in M3."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict[str, str] = {}
