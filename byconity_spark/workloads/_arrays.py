"""Array/map output serialization helpers.

The verification driver hashes result cells with a pandas hash table, which
raises ``TypeError: unhashable type: 'list'`` on array-typed cells — so every
registered query must emit arrays as deterministic strings.  These helpers
produce identical text on the Spark side and (via the documented DuckDB
idioms) on the oracle side:

Spark                                  DuckDB oracle
-------------------------------------  -----------------------------------------
``arr_str(col)``                       ``array_to_string(arr, '|')``
(string/integer element types)
``arr_dbl_str(col, d)``                ``array_to_string(list_transform(arr,
(double elements, fixed %.{d}f)          x -> printf('%.{d}f', x)), '|')``

NULL arrays map to NULL on both sides; empty arrays map to ''.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SEP = "|"


def arr_str(col: Column) -> Column:
    """Serialize an array of strings/integers to 'a|b|c'."""
    return F.array_join(col.cast("array<string>"), SEP)


def arr_dbl_str(col: Column, digits: int = 6) -> Column:
    """Serialize an array of doubles with fixed-point formatting.

    Matches DuckDB ``list_transform(arr, x -> printf('%.{digits}f', x))``.
    """
    fmt = f"%.{digits}f"
    return F.array_join(
        F.transform(col, lambda x: F.format_string(fmt, x)), SEP
    )


def stringify_arrays(df, digits: int = 6):
    """Convert every top-level array column of a DataFrame to its string
    serialization (float elements via ``arr_dbl_str``, everything else via
    ``arr_str``).  Registered queries use this as a final wrapper so the
    verification driver never sees a Python list cell."""
    from pyspark.sql.types import ArrayType, DoubleType, FloatType

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, ArrayType):
            if isinstance(f.dataType.elementType, (DoubleType, FloatType)):
                cols.append(arr_dbl_str(F.col(f.name), digits).alias(f.name))
            else:
                cols.append(arr_str(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def duck_arr(expr: str) -> str:
    """DuckDB-side serializer for string/integer arrays."""
    return f"array_to_string({expr}, '{SEP}')"


def duck_arr_dbl(expr: str, digits: int = 6) -> str:
    """DuckDB-side serializer for double arrays (fixed-point)."""
    return (
        f"array_to_string(list_transform({expr}, "
        f"x -> printf('%.{digits}f', x)), '{SEP}')"
    )
