from . import (
    aggregates,
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
    "dedup",
    "events",
    "multimodal",
    "relational",
    "similarity",
    "textual",
    "windows",
]
