"""Identifier quoting, case-folding and metadata-pattern escaping for JDBC
targets.

Reference behavior re-expressed (`utils/Utils.java:94-115`,
`sync/M2H2SchemaConverter.java:56-60,83-87`):

- quoting doubles any embedded quote character then wraps
  (``a`b`` → ```a``b```);
- qualification joins quoted parts with ``.``, skipping empty parts;
- before emitting DDL/DML, identifiers are upper-cased (English locale)
  when the target's ``DatabaseMetaData.storesUpperCaseIdentifiers()`` is
  true — H2/Derby-class targets resolve unquoted names upper-cased, so a
  quoted mixed-case name created by a naive writer becomes unreachable to
  ordinary SQL on those systems;
- ``DatabaseMetaData`` name-pattern arguments treat ``_``/``%`` as
  wildcards, so literal names are escaped with the driver's search-string
  escape.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def quote_identifier(name: str, quote: str = '"') -> str:
    """Quote one identifier, doubling embedded quote characters
    (`utils/Utils.java:103-106`)."""
    return quote + name.replace(quote, quote + quote) + quote


def qualified_name(*parts: str | None, quote: str = '"') -> str:
    """Dotted qualified name from (catalog, schema, table)-style parts;
    empty/None parts are skipped (`utils/Utils.java:80-101`)."""
    kept = [p for p in parts if p]
    return ".".join(quote_identifier(p, quote) for p in kept)


def fold_case(name: str, stores_upper: bool) -> str:
    """Fold an identifier the way the target stores it
    (`sync/M2H2SchemaConverter.java:56-60`: toUpperCase(ENGLISH) when the
    target stores upper-case identifiers). Python's str.upper() is the
    locale-independent Unicode uppercase — the same mapping as Java's
    toUpperCase(Locale.ENGLISH) including accented letters (é→É) and
    immune to tr-TR dotless-i surprises ('i' always folds to 'I')."""
    if not stores_upper:
        return name
    return name.upper()


def stores_upper_case(spark: SparkSession, url: str) -> bool:
    """Probe the target's identifier storage via JDBC DatabaseMetaData —
    the reference's per-connection check
    (`sync/M2H2SchemaConverter.java:56`)."""
    conn = spark._sc._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
    try:
        return bool(conn.getMetaData().storesUpperCaseIdentifiers())
    finally:
        conn.close()


def escape_name_pattern(name: str | None, escape: str | None) -> str | None:
    """Escape ``_`` and ``%`` in a literal name for use as a
    DatabaseMetaData name pattern (`utils/Utils.java:108-115`)."""
    if name is None or escape is None:
        return name
    if escape in ("_", "%"):
        raise ValueError(f"escape string must not be {escape!r}")
    name = name.replace(escape, escape + escape)
    name = name.replace("_", escape + "_")
    name = name.replace("%", escape + "%")
    return name
