from . import (
    aggregates,
    asof,
    dedup,
    events,
    multimodal,
    relational,
    similarity,
    textual,
    windows,
)

__all__ = [
    "aggregates",
    "asof",
    "dedup",
    "events",
    "multimodal",
    "relational",
    "similarity",
    "textual",
    "windows",
]
