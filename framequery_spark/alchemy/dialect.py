"""SQLAlchemy dialect (only importable when sqlalchemy is installed).

Mirrors the reference dialect: subclass the postgres dialect so pg-speaking
clients work, URL `framequery_spark:///path/to/scope.json?basepath=...`
(reference: src/framequery/alchemy/dialect.py:13-62)."""

from __future__ import annotations

from sqlalchemy.dialects.postgresql.base import PGDialect

from . import dbapi


class FrameQuerySparkDialect(PGDialect):
    name = "framequery_spark"
    driver = "framequery_spark"
    supports_statement_cache = False

    @classmethod
    def import_dbapi(cls):
        return dbapi

    # SQLAlchemy <2 compatibility
    @classmethod
    def dbapi(cls):
        return dbapi

    def create_connect_args(self, url):
        spec = url.database or None
        kwargs = {}
        if spec:
            kwargs["scope_spec"] = spec
        q = dict(url.query)
        if "basepath" in q:
            kwargs["basepath"] = q["basepath"]
        return [], kwargs

    def get_table_names(self, connection, schema=None, **kw):
        return connection.connection.dbapi_connection.table_names()

    def has_table(self, connection, table_name, schema=None, **kw):
        return table_name in self.get_table_names(connection)

    def _get_server_version_info(self, connection):
        return (9, 6, 0)

    def initialize(self, connection):
        # skip the pg on-connect introspection queries
        self.server_version_info = (9, 6, 0)
        self.default_schema_name = "public"
