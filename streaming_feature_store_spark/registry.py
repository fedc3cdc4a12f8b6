"""Feature registry: entities, feature views, feature services.

Reference parity: Feast entity definitions (feast/entities.py:14-63), typed
TTL'd feature views (feast/feature_views.py:32-161), and named serving
bundles (feature_views.py:220-248) — re-expressed as plain metadata objects
over Spark tables. The registry is deliberately storage-agnostic: a feature
view binds a name + entity + schema + TTL to a builder function
(DataFrame → DataFrame), so batch materialization, streaming materialization
and PIT training reads all resolve through the same metadata.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Entity:
    """Named join key (card/user/device/session — entities.py:14-63)."""

    name: str
    join_key: str
    description: str = ""


@dataclass(frozen=True)
class FeatureView:
    """Named, typed, TTL'd feature set per entity (feature_views.py:32-93).

    ``builder`` computes the view from raw events; ``ttl_s`` drives the
    retention job (Redis 24 h TTL analog — redis_sink.py:135-151).
    """

    name: str
    entity: Entity
    builder: Callable[[DataFrame], DataFrame]
    ttl_s: int = 24 * 3600
    timestamp_field: str = "window_start_s"
    description: str = ""


@dataclass(frozen=True)
class FeatureService:
    """Serving bundle of feature views (fraud_detection_v1 /
    personalization_v1 — feature_views.py:220-248)."""

    name: str
    views: tuple[FeatureView, ...]


class Registry:
    def __init__(self):
        self.entities: dict[str, Entity] = {}
        self.views: dict[str, FeatureView] = {}
        self.services: dict[str, FeatureService] = {}

    def register_entity(self, e: Entity) -> Entity:
        self.entities[e.name] = e
        return e

    def register_view(self, v: FeatureView) -> FeatureView:
        self.views[v.name] = v
        return v

    def register_service(self, s: FeatureService) -> FeatureService:
        self.services[s.name] = s
        return s


def default_registry() -> Registry:
    """The reference's registry shape: card/user/device/session entities,
    transaction + engagement feature views, two services."""
    from streaming_feature_store_spark.operators.sessions import funnel_features
    from streaming_feature_store_spark.operators.windows import sliding_stats

    r = Registry()
    card = r.register_entity(Entity("card", "card_id", "payment card"))
    user = r.register_entity(Entity("user", "user_id", "user"))
    r.register_entity(Entity("device", "device_id", "device fingerprint"))
    r.register_entity(Entity("session", "session_id", "browsing session"))

    txn = r.register_view(
        FeatureView(
            name="transaction_stats_5m",
            entity=user,
            builder=lambda df: sliding_stats(df, "user_id"),
            description="5m/1m sliding per-entity stats (feature_views.py:32-93)",
        )
    )
    eng = r.register_view(
        FeatureView(
            name="user_engagement_session",
            entity=user,
            builder=lambda df: funnel_features(df, "user_id"),
            timestamp_field="session_start_us",
            description="session funnel/engagement (feature_views.py:121-161)",
        )
    )
    r.register_service(FeatureService("fraud_detection_v1", (txn,)))
    r.register_service(FeatureService("personalization_v1", (txn, eng)))
    return r
