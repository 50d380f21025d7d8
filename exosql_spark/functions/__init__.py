"""exosql builtin-function surface on Spark.

Reference: ``lib/exosql/builtins.ex :: ExoSQL.Builtins`` (name→function
dispatch map), ``lib/exosql/datetime.ex :: ExoSQL.DateTime``,
``lib/exosql/format.ex :: ExoSQL.Format``.

Most builtins map 1:1 to native ``pyspark.sql.functions`` (JVM-side,
codegen — the fast path). This package holds the compat shims for the
dialect-specific mini-languages that Spark lacks:

- :mod:`.datetime_compat` — C ``strftime`` pattern → Java pattern
  translation; duration strings (``"1D"``, ``"-30m"``) → intervals;
  permissive ``to_datetime``.
- :mod:`.json_compat` — JSON-pointer paths (``/a/b/0``) →
  ``get_json_object`` ``$.a.b[0]`` paths.
- :mod:`.format_compat` — printf ``format()`` incl. the dashboard ``%k``
  SI-suffix; pure-Column where possible.
- :mod:`.coercion` — exosql dynamic-typing helpers (string→number
  arithmetic via ``try_cast`` chains).

All shims are pure Column expressions (no Python row loop) except where
noted; :func:`register_all` additionally exposes SQL-callable names for
the federation SQL path.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string hints here

from pyspark.sql import SparkSession

from exosql_spark.functions.datetime_compat import (
    strftime,
    strftime_to_java,
    duration_interval,
    exo_to_datetime,
    exo_datediff,
)
from exosql_spark.functions.json_compat import jp, jp_to_jsonpath
from exosql_spark.functions.format_compat import exo_format, humanize_si
from exosql_spark.functions.coercion import to_number, exo_add, exo_compare

__all__ = [
    "strftime",
    "strftime_to_java",
    "duration_interval",
    "exo_to_datetime",
    "exo_datediff",
    "jp",
    "jp_to_jsonpath",
    "exo_format",
    "humanize_si",
    "to_number",
    "exo_add",
    "exo_compare",
    "register_all",
    "regex_map",
]


def register_all(spark: SparkSession) -> None:
    """Register SQL-callable wrappers (UDF path — convenience for the
    federation SQL API; DataFrame callers should use the Column
    functions above, which stay JVM-side)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from exosql_spark.functions.format_compat import _format_py
    from exosql_spark.functions.json_compat import jp_to_jsonpath as _jp2p

    spark.udf.register(
        "exo_format",
        lambda fmt, *args: _format_py(fmt, list(args)),
        T.StringType(),
    )
    # strftime / jp as SQL expressions via small SQL-macro style UDFs
    spark.udf.register("jp_path", _jp2p, T.StringType())


def regex_map(col, pattern: str):
    """Reference ``regex(str, re)`` capture-map form
    (``builtins.ex :: regex``): returns map<string,string> of named
    captures (or numbered captures when unnamed). The ONE builtin that
    genuinely needs Python (Java regex named-group enumeration isn't
    exposed to Spark SQL) — implemented as an Arrow-batched pandas UDF,
    not a row-at-a-time UDF."""
    import re as _re

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    compiled = _re.compile(pattern)
    names = list(compiled.groupindex)

    @pandas_udf(T.MapType(T.StringType(), T.StringType()))
    def _extract(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            m = compiled.search(v)
            if not m:
                return None
            if names:
                return {k: m.group(k) for k in names}
            return {str(i): g for i, g in enumerate(m.groups(), 1)}

        return s.map(one)

    c = F.col(col) if isinstance(col, str) else col
    return _extract(c)
