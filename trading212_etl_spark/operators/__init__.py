from . import aggregates, relational, windows

__all__ = ["aggregates", "relational", "windows"]
