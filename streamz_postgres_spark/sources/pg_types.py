"""PostgreSQL -> Spark SQL type mapping (SURVEY §1.2).

The reference materializes PG values as Python objects via the DB
driver and infers the schema from the server catalog; the Spark
equivalent pins a ``customSchema`` on the JDBC read so every poll
gets identical types (no per-batch inference drift). ``custom_schema``
renders the option string for ``spark.read.jdbc``.
"""

from __future__ import annotations

#: PG type name (normalized, parameterless) -> Spark DDL type.
PG_TO_SPARK: dict[str, str] = {
    "smallint": "SHORT",
    "int2": "SHORT",
    "integer": "INT",
    "int4": "INT",
    "bigint": "BIGINT",
    "int8": "BIGINT",
    "real": "FLOAT",
    "float4": "FLOAT",
    "double precision": "DOUBLE",
    "float8": "DOUBLE",
    "boolean": "BOOLEAN",
    "text": "STRING",
    "varchar": "STRING",
    "character varying": "STRING",
    "char": "STRING",
    "bpchar": "STRING",
    "uuid": "STRING",
    "bytea": "BINARY",
    "date": "DATE",
    "timestamp": "TIMESTAMP_NTZ",
    "timestamp without time zone": "TIMESTAMP_NTZ",
    "timestamptz": "TIMESTAMP",
    "timestamp with time zone": "TIMESTAMP",
    "interval": "INTERVAL DAY TO SECOND",
    "json": "STRING",   # parse with from_json/parse_json downstream
    "jsonb": "STRING",
    "hstore": "MAP<STRING,STRING>",
    "xid": "BIGINT",    # xmin cursor via xmin::text::bigint
}


def spark_type_for(pg_type: str) -> str:
    """Map one PG type name to a Spark DDL type.

    ``numeric(p,s)`` keeps exact precision as DECIMAL(p,s);
    ``ARRAY`` element types map recursively (``integer[]`` ->
    ``ARRAY<INT>``). Unknown types fall back to STRING (lossless:
    PG can cast anything to text), mirroring the reference's
    stringly-typed driver fallback.
    """
    t = pg_type.strip().lower()
    if t.endswith("[]"):
        return f"ARRAY<{spark_type_for(t[:-2])}>"
    if t.startswith("numeric") or t.startswith("decimal"):
        if "(" in t:
            args = t[t.index("(") + 1 : t.rindex(")")]
            return f"DECIMAL({args})"
        return "DECIMAL(38,18)"
    if t.startswith("varchar(") or t.startswith("character varying("):
        return "STRING"
    if t.startswith("char(") or t.startswith("bpchar("):
        return "STRING"
    return PG_TO_SPARK.get(t, "STRING")


def custom_schema(columns: list[tuple[str, str]]) -> str:
    """Render the ``customSchema`` JDBC option from (name, pg_type)
    pairs, e.g. [('id','bigint'),('price','numeric(12,2)')] ->
    'id BIGINT, price DECIMAL(12,2)'."""
    return ", ".join(f"{name} {spark_type_for(t)}" for name, t in columns)


#: reverse direction, for DDL emitted by the psql write-back sink
#: (PsqlTableSink): Spark simpleString -> PG column type
SPARK_TO_PG = {
    "tinyint": "smallint",
    "smallint": "smallint",
    "int": "integer",
    "bigint": "bigint",
    "float": "real",
    "double": "double precision",
    "string": "text",
    "boolean": "boolean",
    "binary": "bytea",
    "date": "date",
    "timestamp_ntz": "timestamp",
    "timestamp": "timestamptz",
}


def pg_type_for(spark_type: str) -> str:
    """Map one Spark DDL/simpleString type to a PG column type
    (decimal keeps precision; arrays map recursively; anything
    unmapped lands as text — PG's lossless fallback, mirroring
    spark_type_for's)."""
    t = spark_type.strip().lower()
    if t.startswith("array<") and t.endswith(">"):
        return f"{pg_type_for(t[6:-1])}[]"
    if t.startswith("decimal"):
        return t.replace("decimal", "numeric")
    return SPARK_TO_PG.get(t, "text")
