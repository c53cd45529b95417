"""DBAPI 2.0 + (optional) SQLAlchemy adapter.

The SQLAlchemy dialect is only defined when sqlalchemy is importable —
the container may not ship it; the DBAPI shim has no such dependency.
"""

from . import dbapi
from .dbapi import Connection, Cursor, connect, escape

__all__ = ["dbapi", "connect", "Connection", "Cursor", "escape"]

try:  # pragma: no cover - optional dependency
    import sqlalchemy  # noqa: F401

    from .dialect import FrameQuerySparkDialect  # noqa: F401

    __all__.append("FrameQuerySparkDialect")
except ImportError:
    pass
