"""Time-series SQL syntax extensions for Spark SQL — the ergonomics
gaps SURVEY §4.3 deferred, each a deliberately BOUNDED grammar
lowered onto an existing library plan (this is a syntax adapter,
not a SQL parser; anything outside a grammar raises ValueError with
the reason):

- ``ASOF [LEFT] JOIN`` (DuckDB/QuestDB/Snowflake spelling) ->
  ``operators.joins.asof_join`` (union + last-ignoreNulls window —
  ONE shuffle, no range-expansion candidate blowup);
- ``SAMPLE BY <N><s|m|h|d> [ON <ts_col>]`` (the QuestDB time-bucket
  idiom) -> an epoch-aligned bucket GROUP BY (integer epoch-second
  division, the house tz-free form), with the bucket surfaced as
  ``sample_ts`` and bare-column projections joining the grouping
  key, QuestDB-style;
- ``SELECT DISTINCT ON (<keys>) ... ORDER BY <keys>, <tiebreak>``
  (the Postgres latest-row-per-key idiom the reference's users
  write daily) -> a row_number window over the keys ordered by the
  residual ORDER BY, keeping rank 1 — Spark has no DISTINCT ON and
  the naive translation (self-join on max) reads the input twice;
- ``QUALIFY <rankfn>() OVER (PARTITION BY <keys> ORDER BY <ord>)
  <op> <N>`` (the Snowflake/DuckDB/BigQuery window-filter clause,
  the top-k-per-group idiom) -> the window function computed in a
  subquery and filtered in the outer SELECT — the rewrite users
  hand-write today because Spark SQL has no QUALIFY. ``rankfn`` is
  ``row_number``/``rank``/``dense_rank``; ``op`` is ``=``, ``<``
  or ``<=``;
- ``COLUMNS('<regex>')`` (the DuckDB star-expansion for wide
  feature tables: project every column whose NAME matches) -> the
  explicit column list resolved from the source view's schema at
  rewrite time (partial match, ``re.search``, mirroring DuckDB's
  semantics — COLUMNS('l_') matches ``xl_tax`` too; ANCHOR the
  pattern when you mean a prefix). One COLUMNS per query, single
  named table, no JOIN; DuckDB compiles the pattern with RE2 while
  this adapter uses Python ``re`` — stay inside the common syntax
  (anchors, classes, alternation) or the engines can disagree;
- ``* EXCLUDE (<cols>)`` (the DuckDB/Snowflake star-minus idiom —
  "everything but the wide payload column") -> Spark's native
  ``* EXCEPT (<cols>)`` after validating every listed column against
  the source view's schema at rewrite time (DuckDB errors on an
  unknown or duplicate EXCLUDE entry; silently passing a typo'd
  column name through would keep the payload column in the scan,
  defeating the pruning the user asked for). One ``* EXCLUDE`` per
  query, single named table, no JOIN;
- ``* REPLACE (<expr> AS <col>[, ...])`` (the DuckDB/Snowflake
  star-replace: keep every column but substitute a computed
  expression for the named ones in place) -> the explicit projection
  resolved from the source schema at rewrite time (each target
  column must exist; duplicates error — DuckDB refuses both too).
  Spark has no ``* REPLACE``; hand-writing the projection is exactly
  the 400-column chore the idiom exists to avoid. One ``* REPLACE``
  per query, single named table, no JOIN;
- ``MATCH_RECOGNIZE (PARTITION BY <key> ORDER BY <cols> PATTERN
  (<symbols>) DEFINE <S> AS <pred>, ...)`` (the SQL:2016 row-pattern
  clause, the ClickHouse-sequenceMatch / Flink-CEP niche — neither
  Spark nor DuckDB implements it) -> the library's initials-string
  plan (q_sequence_match): each row is classified into a
  one-character symbol by its DEFINE predicates (FIRST MATCHING
  DEFINE wins — a deliberate "lite" restriction: write disjoint
  predicates, as overlapping symbol sets need the full NFA
  semantics this adapter refuses to fake), the per-partition rows
  concatenate into an ordered symbol string (TOTAL order from the
  ORDER BY columns — supply a tiebreak), unclassified rows become
  ``-`` (a match-breaking filler, preserving MATCH_RECOGNIZE's
  contiguous-rows semantics), and PATTERN becomes a regex over that
  string (symbols = single letters; quantifiers ``* + ?``,
  grouping and ``|`` allowed). Output columns per partition key:
  the key, ``seq_len``, ``n_matches`` (non-overlapping,
  left-to-right — both regex engines scan identically), ``matched``
  (0/1). One MATCH_RECOGNIZE per query, single named table, no
  JOIN/WHERE (register a filtered view first); optional trailing
  ORDER BY. Patterns that can match an EMPTY sequence (every term
  ``*``/``?`` quantified) are refused: zero-width regex matches are
  counted engine-divergently (Java find loop vs RE2 global scan)
  and an empty row pattern is meaningless as a sequence match.

Supported grammar (one ASOF join per query)::

    SELECT <projections>
    FROM <left_table> <la> ASOF [LEFT] JOIN <right_table> <ra>
      ON <la>.<key> = <ra>.<key> AND <la>.<lts> >= <ra>.<rts>
    [<trailing clauses>]

- ``left_table`` / ``right_table`` must be resolvable via
  ``spark.table`` (tables or registered temp views; CTEs are NOT
  supported — register a view instead, the error says so).
- Both aliases are required, the equality must come first, and the
  time bound must be ``left >= right`` (backward as-of). Anything
  outside the grammar raises ``ValueError`` with the reason — this
  is a syntax adapter, not a SQL parser, and it refuses rather than
  guesses.

Lowering: the two sides are joined with :func:`asof_join` (all
non-key/non-ts right columns become right_values; the right
timestamp surfaces as ``asof_ts``), the result is registered under a
unique temp view, the ASOF clause is replaced by that view, and the
alias qualifiers are rewritten (``la.x`` -> ``x``; ``ra.rts`` ->
``asof_ts``) so the surrounding SELECT works unchanged. Output
column names therefore match the library function exactly, which is
what keeps q_asof_sql value-checkable against DuckDB's native
``ASOF LEFT JOIN``.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from streamz_postgres_spark.operators.joins import asof_join

_ASOF_RE = re.compile(
    r"""FROM\s+(?P<lt>\w+)\s+(?P<la>\w+)\s+
        ASOF\s+(?P<left>LEFT\s+)?JOIN\s+(?P<rt>\w+)\s+(?P<ra>\w+)\s+
        ON\s+(?P<ka>\w+)\.(?P<lk>\w+)\s*=\s*(?P<kb>\w+)\.(?P<rk>\w+)\s+
        AND\s+(?P<ta>\w+)\.(?P<lts>\w+)\s*>=\s*(?P<tb>\w+)\.(?P<rts>\w+)""",
    re.IGNORECASE | re.VERBOSE,
)

#: temp views registered by the most recent sql() call on this
#: thread (dropped on the next call — the returned DataFrame is lazy
#: and must outlive this invocation)
_VIEW_SLOTS: dict = {}

_SAMPLE_RE = re.compile(
    r"""^\s*SELECT\s+(?P<proj>.+?)\s+
        FROM\s+(?P<t>\w+)
        (?:\s+WHERE\s+(?P<where>.+?))?\s+
        SAMPLE\s+BY\s+(?P<n>\d+)(?P<u>[smhd])
        (?:\s+ON\s+(?P<col>\w+))?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)

_UNIT_SEC = {"s": 1, "m": 60, "h": 3600, "d": 86400}

_DISTINCT_ON_RE = re.compile(
    r"""^\s*SELECT\s+DISTINCT\s+ON\s*\((?P<keys>[\w\s,]+)\)\s*
        (?P<proj>.+?)\s+
        FROM\s+(?P<t>\w+)
        (?:\s+WHERE\s+(?P<where>.+?))?\s+
        ORDER\s+BY\s+(?P<order>.+?)\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)


_QUALIFY_RE = re.compile(
    r"""^\s*SELECT\s+(?P<proj>.+?)\s+
        FROM\s+(?P<t>\w+)
        (?:\s+WHERE\s+(?P<where>.+?))?\s+
        QUALIFY\s+(?P<fn>row_number|rank|dense_rank)\s*\(\s*\)\s+
        OVER\s*\(\s*PARTITION\s+BY\s+(?P<part>[\w\s,]+?)\s+
        ORDER\s+BY\s+(?P<order>.+?)\s*\)\s*
        (?P<op><=|<|=)\s*(?P<n>\d+)\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)


_COLUMNS_RE = re.compile(r"COLUMNS\(\s*'(?P<pat>[^']*)'\s*\)", re.IGNORECASE)


_EXCLUDE_RE = re.compile(
    r"\*\s*EXCLUDE\s*\(\s*(?P<cols>[\w\s,]+?)\s*\)", re.IGNORECASE
)


_PATTERN_RE = re.compile(
    r"""^\s*SELECT\s+(?P<proj>.+?)\s+
        FROM\s+(?P<t>\w+)\s+
        MATCH_RECOGNIZE\s*\(\s*
        PARTITION\s+BY\s+(?P<part>\w+)\s+
        ORDER\s+BY\s+(?P<order>[\w\s,]+?)\s+
        PATTERN\s*\(\s*(?P<pat>[A-Za-z\s*+?|()]+?)\s*\)\s+
        DEFINE\s+(?P<defs>.+?)\s*\)\s*
        (?:ORDER\s+BY\s+(?P<outorder>[\w\s,]+?(?:\s+(?:ASC|DESC))?)\s*)?$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)

_DEFINE_ITEM_RE = re.compile(
    r"^\s*(?P<sym>[A-Za-z])\s+AS\s+(?P<pred>.+)$",
    re.IGNORECASE | re.DOTALL,
)


def _lower_pattern(spark: SparkSession, query: str) -> DataFrame:
    m = _PATTERN_RE.match(query)
    if m is None:
        raise ValueError(
            "MATCH_RECOGNIZE present but the query does not match the "
            "supported grammar: SELECT <projections> FROM <table> "
            "MATCH_RECOGNIZE (PARTITION BY <key> ORDER BY <cols> "
            "PATTERN (<symbols with * + ? | ()>) DEFINE <S> AS <pred>"
            "[, ...]) [ORDER BY <cols>] (one table, single-letter "
            "symbols, no WHERE/JOIN — register a filtered view first)"
        )
    # DEFINE list: single-letter symbols, first-match-wins order
    defs: list = []
    seen: set = set()
    for item in _split_top_level(m.group("defs")):
        if not item.strip():
            continue
        dm = _DEFINE_ITEM_RE.match(item.strip())
        if dm is None:
            raise ValueError(
                f"DEFINE item {item.strip()!r} is not "
                "<single-letter symbol> AS <predicate>"
            )
        sym = dm.group("sym").upper()
        if sym in seen:
            raise ValueError(f"duplicate DEFINE symbol: {sym}")
        seen.add(sym)
        defs.append((sym, dm.group("pred").strip()))
    if not defs:
        raise ValueError("DEFINE lists no symbols")
    # PATTERN -> regex: strip whitespace, validate the alphabet
    regex = re.sub(r"\s+", "", m.group("pat")).upper()
    if not regex:
        raise ValueError("PATTERN () is empty")
    pat_syms = set(re.findall(r"[A-Z]", regex))
    undefined = sorted(pat_syms - seen)
    if undefined:
        raise ValueError(
            "PATTERN symbols without a DEFINE: "
            + ", ".join(undefined)
            + " (full MATCH_RECOGNIZE treats them as always-true; "
            "this adapter refuses rather than guesses)"
        )
    try:
        compiled = re.compile(regex)
    except re.error as e:
        raise ValueError(f"PATTERN does not compile as a regex: {e}")
    if compiled.match("") is not None:
        # zero-width matches are where regex engines disagree (Java's
        # find loop vs RE2's global scan count empty matches at
        # different positions), and an empty row-pattern is
        # meaningless as a sequence match — refuse rather than let
        # the two engines drift
        raise ValueError(
            "PATTERN can match an EMPTY row sequence (every term is "
            "* or ? quantified) — require at least one mandatory "
            "symbol"
        )
    part = m.group("part").strip()
    order_cols = [
        o.strip() for o in m.group("order").split(",") if o.strip()
    ]
    if any(not re.fullmatch(r"\w+", o) for o in order_cols):
        raise ValueError(
            "MATCH_RECOGNIZE ORDER BY takes plain ascending column "
            f"names only (got {m.group('order').strip()!r})"
        )
    sym_case = (
        "CASE "
        + " ".join(f"WHEN {pred} THEN '{sym}'" for sym, pred in defs)
        + " ELSE '-' END"
    )
    ord_fields = ", ".join(
        f"{c} AS __o{i}" for i, c in enumerate(order_cols)
    )
    s_expr = (
        "array_join(transform(array_sort(collect_list(struct("
        f"{ord_fields}, {sym_case} AS __ch))), t -> t.__ch), '')"
    )
    outorder = (
        f" ORDER BY {m.group('outorder').strip()}"
        if m.group("outorder")
        else ""
    )
    rewritten = (
        f"SELECT {m.group('proj')} FROM ("
        f"SELECT {part}, seq_len, n_matches, "
        f"CAST(CASE WHEN n_matches > 0 THEN 1 ELSE 0 END AS INT) "
        f"AS matched FROM ("
        f"SELECT {part}, "
        f"CAST(COUNT(*) AS BIGINT) AS seq_len, "
        f"CAST(size(regexp_extract_all({s_expr}, '{regex}', 0)) "
        f"AS BIGINT) AS n_matches "
        f"FROM {m.group('t')} GROUP BY {part}"
        f")){outorder}"
    )
    return spark.sql(rewritten)


def _lower_exclude(spark: SparkSession, query: str) -> DataFrame:
    tokens = list(_EXCLUDE_RE.finditer(query))
    if len(tokens) != 1:
        raise ValueError(
            "EXCLUDE present but the query does not match the supported "
            "grammar: exactly one * EXCLUDE (<col>[, <col>...]) "
            "projection item per query"
        )
    if re.search(r"\bJOIN\b", query, re.IGNORECASE):
        raise ValueError(
            "* EXCLUDE supports a single named table — no JOINs "
            "(register the join as a temp view first)"
        )
    tmatch = re.search(r"\bFROM\s+(\w+)", query, re.IGNORECASE)
    if tmatch is None:
        raise ValueError(
            "* EXCLUDE needs FROM <table> (a named table or registered "
            "temp view — CTEs/subqueries are not supported)"
        )
    try:
        cols = spark.table(tmatch.group(1)).columns
    except Exception as e:  # noqa: BLE001
        raise ValueError(
            f"EXCLUDE source must be a resolvable table/view: {e}"
        ) from None
    listed = [c.strip() for c in tokens[0].group("cols").split(",") if c.strip()]
    if not listed:
        raise ValueError("* EXCLUDE () lists no columns")
    seen: set = set()
    for c in listed:
        if c in seen:
            # DuckDB: "Duplicate entry ... in EXCLUDE list"
            raise ValueError(f"duplicate column in EXCLUDE list: {c}")
        seen.add(c)
        if c not in cols:
            # DuckDB errors on an unknown EXCLUDE entry; silently
            # ignoring a typo would leave the payload column in the
            # scan — the opposite of what the user asked for
            raise ValueError(
                f"EXCLUDE column {c!r} is not a column of "
                f"{tmatch.group(1)} (columns: {', '.join(cols)})"
            )
    if len(listed) == len(cols):
        raise ValueError(
            "* EXCLUDE removes every column of "
            f"{tmatch.group(1)} — an empty projection (DuckDB also "
            "refuses this)"
        )
    start, end = tokens[0].span()
    rewritten = (
        query[:start] + f"* EXCEPT ({', '.join(listed)})" + query[end:]
    )
    return spark.sql(rewritten)


_REPLACE_RE = re.compile(
    r"\*\s*REPLACE\s*\(\s*(?P<items>.+?)\s*\)\s+FROM",
    re.IGNORECASE | re.DOTALL,
)

_REPLACE_ITEM_RE = re.compile(
    r"^(?P<expr>.+?)\s+AS\s+(?P<col>\w+)$", re.IGNORECASE | re.DOTALL
)


def _lower_replace(spark: SparkSession, query: str) -> DataFrame:
    tokens = list(_REPLACE_RE.finditer(query))
    if len(tokens) != 1:
        raise ValueError(
            "REPLACE present but the query does not match the supported "
            "grammar: exactly one * REPLACE (<expr> AS <col>[, ...]) "
            "projection item per query, immediately before FROM"
        )
    if re.search(r"\bJOIN\b", query, re.IGNORECASE):
        raise ValueError(
            "* REPLACE supports a single named table — no JOINs "
            "(register the join as a temp view first)"
        )
    tmatch = re.search(r"\bFROM\s+(\w+)", query, re.IGNORECASE)
    if tmatch is None:
        raise ValueError(
            "* REPLACE needs FROM <table> (a named table or registered "
            "temp view — CTEs/subqueries are not supported)"
        )
    try:
        cols = spark.table(tmatch.group(1)).columns
    except Exception as e:  # noqa: BLE001
        raise ValueError(
            f"REPLACE source must be a resolvable table/view: {e}"
        ) from None
    repl: dict = {}
    for item in _split_top_level(tokens[0].group("items")):
        m = _REPLACE_ITEM_RE.match(item.strip())
        if m is None:
            raise ValueError(
                f"REPLACE item {item.strip()!r} is not <expr> AS <col>"
            )
        col = m.group("col")
        if col in repl:
            # DuckDB: "duplicate column name in replace list"
            raise ValueError(f"duplicate column in REPLACE list: {col}")
        if col not in cols:
            # DuckDB errors on an unknown REPLACE target; silently
            # appending a new column instead would change the shape
            raise ValueError(
                f"REPLACE target {col!r} is not a column of "
                f"{tmatch.group(1)} (columns: {', '.join(cols)})"
            )
        repl[col] = m.group("expr").strip()
    projection = ", ".join(
        f"{repl[c]} AS {c}" if c in repl else c for c in cols
    )
    start, end = tokens[0].span()
    rewritten = query[:start] + projection + " FROM" + query[end:]
    return spark.sql(rewritten)


def _lower_columns(spark: SparkSession, query: str) -> DataFrame:
    tokens = list(_COLUMNS_RE.finditer(query))
    if len(tokens) != 1:
        raise ValueError(
            "COLUMNS present but the query does not match the supported "
            "grammar: exactly one COLUMNS('<regex>') projection item "
            "(single-quoted pattern) per query"
        )
    if re.search(r"\bJOIN\b", query, re.IGNORECASE):
        raise ValueError(
            "COLUMNS expansion supports a single named table — no JOINs "
            "(register the join as a temp view first)"
        )
    tmatch = re.search(r"\bFROM\s+(\w+)", query, re.IGNORECASE)
    if tmatch is None:
        raise ValueError(
            "COLUMNS expansion needs FROM <table> (a named table or "
            "registered temp view — CTEs/subqueries are not supported)"
        )
    try:
        cols = spark.table(tmatch.group(1)).columns
    except Exception as e:  # noqa: BLE001
        raise ValueError(
            f"COLUMNS source must be a resolvable table/view: {e}"
        ) from None
    pat = tokens[0].group("pat")
    try:
        rx = re.compile(pat)
    except re.error as e:
        raise ValueError(f"COLUMNS pattern does not compile: {e}") from None
    matched = [c for c in cols if rx.search(c)]
    if not matched:
        # DuckDB also errors when COLUMNS matches nothing — an empty
        # projection silently returning 0 columns helps nobody
        raise ValueError(
            f"COLUMNS({pat!r}) matched no column of "
            f"{tmatch.group(1)} (columns: {', '.join(cols)})"
        )
    start, end = tokens[0].span()
    rewritten = query[:start] + ", ".join(matched) + query[end:]
    return spark.sql(rewritten)


def _lower_qualify(spark: SparkSession, query: str) -> DataFrame:
    m = _QUALIFY_RE.match(query)
    if m is None:
        raise ValueError(
            "QUALIFY present but the query does not match the supported "
            "grammar: SELECT <projections> FROM <table> [WHERE <pred>] "
            "QUALIFY row_number()|rank()|dense_rank() OVER (PARTITION BY "
            "<keys> ORDER BY <order>) =|<|<= <N> (one table, QUALIFY "
            "last; register subqueries as temp views first)"
        )
    # collision-proof plumbing alias: the grammar places no
    # restriction on source column names, so a fixed "__q" would
    # break an in-grammar query over a table that already has one
    rank_col = f"__q_{uuid.uuid4().hex[:8]}"
    proj = m.group("proj").strip()
    if proj == "*":
        # the rank column is plumbing, not a result column
        proj = f"* EXCEPT ({rank_col})"
    where = f" WHERE {m.group('where')}" if m.group("where") else ""
    rewritten = (
        f"SELECT {proj} FROM ("
        f"SELECT *, {m.group('fn').lower()}() OVER ("
        f"PARTITION BY {m.group('part').strip()} "
        f"ORDER BY {m.group('order').strip()}) AS {rank_col} "
        f"FROM {m.group('t')}{where}"
        f") WHERE {rank_col} {m.group('op')} {m.group('n')}"
    )
    return spark.sql(rewritten)


def _lower_distinct_on(spark: SparkSession, query: str) -> DataFrame:
    m = _DISTINCT_ON_RE.match(query)
    if m is None:
        raise ValueError(
            "DISTINCT ON present but the query does not match the supported "
            "grammar: SELECT DISTINCT ON (<keys>) <projections> FROM "
            "<table> [WHERE <pred>] ORDER BY <keys>, <tiebreak...> "
            "(one table; ORDER BY must lead with the DISTINCT ON keys, "
            "as Postgres requires)"
        )
    keys = [k.strip() for k in m.group("keys").split(",") if k.strip()]
    order = [o.strip() for o in m.group("order").split(",") if o.strip()]
    lead = [re.split(r"\s+", o)[0] for o in order[: len(keys)]]
    if lead != keys:
        raise ValueError(
            "ORDER BY must lead with the DISTINCT ON keys in the same "
            f"order (Postgres rule): keys={keys}, order leads with {lead}"
        )
    tiebreak = ", ".join(order[len(keys):]) or ", ".join(keys)
    where = f" WHERE {m.group('where')}" if m.group("where") else ""
    rewritten = (
        f"SELECT {m.group('proj')} FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {', '.join(keys)} "
        f"ORDER BY {tiebreak}) AS __rn FROM {m.group('t')}{where}"
        f") WHERE __rn = 1"
    )
    return spark.sql(rewritten)




def _split_top_level(expr_list: str) -> list:
    """Split a SELECT projection list on commas at paren/quote depth
    zero (so function arguments and string literals stay intact)."""
    parts, depth, in_str, buf = [], 0, False, []
    for ch in expr_list:
        if in_str:
            buf.append(ch)
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf))
    return parts


def _lower_sample_by(spark: SparkSession, query: str) -> DataFrame:
    m = _SAMPLE_RE.match(query)
    if m is None:
        raise ValueError(
            "SAMPLE BY present but the query does not match the supported "
            "grammar: SELECT <projections> FROM <table> [WHERE <pred>] "
            "SAMPLE BY <N><s|m|h|d> [ON <ts_col>] (one table, SAMPLE BY "
            "last; register subqueries as temp views first)"
        )
    width = int(m.group("n")) * _UNIT_SEC[m.group("u").lower()]
    col = m.group("col") or "ts"
    # epoch-aligned integer bucketing: tz-free, engine-exact, and
    # equal to date_trunc for whole-unit widths
    bucket = (
        "timestampadd(SECOND, CAST(timestampdiff(SECOND, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}) DIV {width} "
        f"AS BIGINT) * {width}, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    proj = m.group("proj")
    # QuestDB-style: bare column projections join the grouping key.
    # Split on TOP-LEVEL commas only (round-7 review find: a naive
    # split leaked multi-arg function arguments like
    # coalesce(a, fallback, 'x') into GROUP BY)
    bare = [
        p.strip()
        for p in _split_top_level(proj)
        if re.fullmatch(r"\w+", p.strip())
    ]
    keys = ", ".join(["sample_ts", *bare])
    where = f" WHERE {m.group('where')}" if m.group("where") else ""
    rewritten = (
        f"SELECT {bucket} AS sample_ts, {proj} "
        f"FROM {m.group('t')}{where} GROUP BY {keys}"
    )
    return spark.sql(rewritten)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run ``query``, lowering one supported extension clause —
    ASOF [LEFT] JOIN onto the library as-of join, SAMPLE BY onto an
    epoch-aligned bucket GROUP BY, DISTINCT ON / QUALIFY onto rank
    windows, COLUMNS('<regex>') onto a schema-resolved projection
    list, * EXCLUDE onto a schema-validated * EXCEPT, * REPLACE
    onto a schema-resolved explicit projection, MATCH_RECOGNIZE onto
    the initials-string sequence matcher (module docstring has all
    eight grammars)."""
    import threading

    if re.search(r"\bMATCH_RECOGNIZE\b", query, re.IGNORECASE):
        return _lower_pattern(spark, query)
    if re.search(r"\bCOLUMNS\s*\(", query, re.IGNORECASE):
        return _lower_columns(spark, query)
    if re.search(r"\bEXCLUDE\b", query, re.IGNORECASE):
        return _lower_exclude(spark, query)
    if re.search(r"\*\s*REPLACE\s*\(", query, re.IGNORECASE):
        return _lower_replace(spark, query)
    if re.search(r"\bSAMPLE\s+BY\b", query, re.IGNORECASE):
        return _lower_sample_by(spark, query)
    if re.search(r"\bDISTINCT\s+ON\b", query, re.IGNORECASE):
        return _lower_distinct_on(spark, query)
    if re.search(r"\bQUALIFY\b", query, re.IGNORECASE):
        return _lower_qualify(spark, query)
    matches = list(_ASOF_RE.finditer(query))
    if not matches:
        if re.search(r"\bASOF\b", query, re.IGNORECASE):
            raise ValueError(
                "ASOF present but the clause does not match the supported "
                "grammar: FROM <t> <a> ASOF [LEFT] JOIN <t> <a> ON "
                "<a>.<k> = <a>.<k> AND <a>.<ts> >= <a>.<ts> "
                "(tables must be named views — register CTE bodies as "
                "temp views first)"
            )
        return spark.sql(query)
    if len(matches) > 1:
        raise ValueError("only one ASOF JOIN per query is supported")
    m = matches[0]
    la, ra = m.group("la"), m.group("ra")
    # both halves of each predicate must use the declared aliases
    if {m.group("ka"), m.group("kb")} != {la, ra} or {
        m.group("ta"),
        m.group("tb"),
    } != {la, ra}:
        raise ValueError(
            "ON predicates must reference the two declared aliases"
        )
    # normalize predicate sides to (left, right)
    lk = m.group("lk") if m.group("ka") == la else m.group("rk")
    rk = m.group("rk") if m.group("kb") == ra else m.group("lk")
    if m.group("ta") != la:
        raise ValueError(
            "the time bound must be <left_alias>.<ts> >= <right_alias>.<ts> "
            "(backward as-of); use the forward variant via the library API"
        )
    lts, rts = m.group("lts"), m.group("rts")
    try:
        left = spark.table(m.group("lt"))
        right = spark.table(m.group("rt"))
    except Exception as e:  # noqa: BLE001
        raise ValueError(
            f"ASOF sides must be resolvable tables/views: {e}"
        ) from None

    right_in = right
    if rk != lk:
        right_in = right.withColumnRenamed(rk, lk)
    right_values = [
        c for c in right_in.columns if c not in (lk, rts)
    ]
    joined = asof_join(
        left,
        right_in,
        on=lk,
        left_ts=lts,
        right_ts=rts,
        right_values=right_values,
        how="left" if m.group("left") else "inner",
    )

    view = f"__asof_{uuid.uuid4().hex[:12]}"
    slot = threading.get_ident()
    for old in _VIEW_SLOTS.pop(slot, []):
        spark.catalog.dropTempView(old)
    joined.createOrReplaceTempView(view)
    _VIEW_SLOTS[slot] = [view]

    rewritten = query[: m.start()] + f"FROM {view}" + query[m.end() :]
    # right-alias refs: the right ts surfaces as asof_ts; everything
    # else keeps its name. Left-alias refs keep their names.
    rewritten = re.sub(
        rf"\b{ra}\.{rts}\b", "asof_ts", rewritten
    )
    rewritten = re.sub(rf"\b{ra}\.", "", rewritten)
    rewritten = re.sub(rf"\b{la}\.", "", rewritten)
    return spark.sql(rewritten)
