"""Similarity-search operators over ``embeddings`` (north star; SURVEY.md
§7 Phase 4). Filled in Phase 4 — registry present so the package imports."""

from __future__ import annotations

from aws_glue_data_lake_spark.queries.base import Registry

REGISTRY = Registry()
