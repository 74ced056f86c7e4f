from .pipeline import KgPipeline, LINEAGE_SCHEMA

__all__ = ["KgPipeline", "LINEAGE_SCHEMA"]
