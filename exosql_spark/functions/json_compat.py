"""JSON compat: ``json()`` parse + ``jp()`` JSON-pointer navigation.

Reference: ``lib/exosql/builtins.ex :: ExoSQL.Builtins.json/1, jp/2`` —
``jp(json, "/a/b/0")`` walks a parsed map with JSON-pointer-ish paths.

Spark-side: translate the pointer to a JsonPath and use
``get_json_object`` (JVM, no UDF). ``json()`` itself is a no-op on the
string representation since get_json_object consumes JSON strings
directly; for typed access use ``from_json`` with a schema.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def jp_to_jsonpath(pointer: str) -> str:
    """``/a/b/0`` → ``$.a.b[0]`` (numeric segments become array idx)."""
    if pointer in ("", "/"):
        return "$"
    path = "$"
    for seg in pointer.strip("/").split("/"):
        if seg.isdigit():
            path += f"[{seg}]"
        else:
            path += f".{seg}"
    return path


def jp(col: Column | str, pointer: str) -> Column:
    """``jp(json_col, "/k")`` → string value at pointer (null if absent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, jp_to_jsonpath(pointer))
