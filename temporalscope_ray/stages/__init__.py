"""Operator stages: each module is a Ray-Data-first re-expression of one
reference capability (SURVEY.md §2) or a scale extension the north rule
requires (as-of join, sessionize, rolling windows, dedup, similarity)."""
