"""Kimball SQL-mart surface: SQL UDF definitions, UDF-over-UDF composition,
views, env-templated identifiers, versioned deploy ordering (SURVEY.md §2.C).
"""
