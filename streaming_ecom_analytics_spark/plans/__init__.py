"""Query registry — the engine's public query surface."""

from streaming_ecom_analytics_spark.plans.registry import REGISTRY, RegisteredQuery

__all__ = ["REGISTRY", "RegisteredQuery"]
