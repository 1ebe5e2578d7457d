from .pipeline import canonicalize_actions, flagship_pipeline

__all__ = ["canonicalize_actions", "flagship_pipeline"]
