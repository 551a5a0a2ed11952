"""Mapbox GL filter -> Catalyst ``Column`` compiler.

The reference (filter.py:6-98) compiles a Mapbox GL filter s-expression to a
*string of Python source* and ``eval``-uates it once per feature
(filter.py:26-29).  This module is the engine's one real query compiler: it
compiles the same s-expression **once** into a Catalyst ``Column`` expression
tree, which Catalyst then constant-folds, prunes, and pushes down to the scan.
No Python runs per row.

Supported operators (parity with reference filter.py:34-57):

    ==  !=  <  >  <=  >=        comparisons      (filter.py:69-73)
    any  all  none              logical          (filter.py:76-78)
    in  !in                     membership       (filter.py:81-83)
    has  !has                   key existence    (filter.py:86-88)
    "$type"                     geometry type    (filter.py:62-63)
    "$id"                       feature id       (filter.py:64-65)
    []  /  None                 -> True          (filter.py:36-37)
    ["any"]                     -> False         (filter.py:39-40)
    ["all"] / ["none"]          -> True          (filter.py:39-40)
    unknown op                  -> True          (filter.py:57)

Null semantics (SURVEY.md section 7 "hard parts"): the reference evaluates
``p.get(key) OP value`` with Python semantics, so a missing property makes
``==``/``in`` False and ``!=``/``!in``/``!has`` True.  We preserve that
two-valued behavior with null-safe equality (``eqNullSafe``) and by negating
via ``NOT coalesce(expr, false)``.  Ordered comparisons (``<`` etc.) on a
missing property *crash* the reference (uncaught TypeError, label.py:55
catches only KeyError/ValueError); we instead adopt SQL semantics — NULL
compares to nothing, the row is filtered out — which is the one documented
divergence.

Feature data model (SURVEY.md section 1.1): one row per decoded vector-tile
feature with ``properties: map<string,string>``, ``geometry_type: string``,
``id: long``.  Because properties are stored as strings (OSM tags), numeric
filter literals compare after a cast to double and string literals compare
as strings, mirroring the typed values the reference sees from the pbf
decoder.
"""

from __future__ import annotations

import json
from functools import reduce
from typing import Optional, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

FilterExpr = Optional[Sequence]

_COMPARISON_OPS = {"==", "!=", "<", ">", "<=", ">="}


def compile_filter(
    filt: Union[FilterExpr, str],
    properties: Union[str, Column] = "properties",
    geometry_type: Union[str, Column] = "geometry_type",
    feature_id: Union[str, Column] = "id",
) -> Column:
    """Compile a Mapbox GL filter to a boolean ``Column``.

    Parameters
    ----------
    filt : the GL filter as nested lists (or its JSON string form, as stored
        in a class-config table)
    properties : column (name) of type ``map<string,string>``
    geometry_type : column (name) holding the GeoJSON geometry type
    feature_id : column (name) holding the feature id

    Returns a non-null boolean Column (NULL results of ordered comparisons
    coalesce to False so the compiled predicate is total).
    """
    if isinstance(filt, str):
        filt = json.loads(filt)
    ctx = _Ctx(
        props=F.col(properties) if isinstance(properties, str) else properties,
        gtype=F.col(geometry_type) if isinstance(geometry_type, str) else geometry_type,
        fid=F.col(feature_id) if isinstance(feature_id, str) else feature_id,
    )
    return F.coalesce(_compile(filt, ctx), F.lit(False))


class _Ctx:
    __slots__ = ("props", "gtype", "fid")

    def __init__(self, props: Column, gtype: Column, fid: Column):
        self.props = props
        self.gtype = gtype
        self.fid = fid


def _compile(filt: FilterExpr, ctx: _Ctx) -> Column:
    """Dispatch on the head operator (reference filter.py:34-57)."""
    if not filt:
        return F.lit(True)
    op = filt[0]
    if len(filt) == 1:
        # bare ["any"] is vacuously False; bare ["all"]/["none"] vacuously True
        return F.lit(op != "any")
    if op in _COMPARISON_OPS:
        return _compile_comparison(filt[1], filt[2], op, ctx)
    if op == "any":
        return reduce(lambda a, b: a | b, (_compile(f, ctx) for f in filt[1:]))
    if op == "all":
        return reduce(lambda a, b: a & b, (_compile(f, ctx) for f in filt[1:]))
    if op == "none":
        return _negate(
            reduce(lambda a, b: a | b, (_compile(f, ctx) for f in filt[1:]))
        )
    if op == "in":
        return _compile_in(filt[1], filt[2:], ctx)
    if op == "!in":
        return _negate(_compile_in(filt[1], filt[2:], ctx))
    if op == "has":
        return _compile_has(filt[1], ctx)
    if op == "!has":
        return _negate(_compile_has(filt[1], ctx))
    return F.lit(True)  # unknown operator passes everything (filter.py:57)


def _negate(expr: Column) -> Column:
    """Python-parity negation: a NULL operand negates to True (a missing
    property is "not equal" / "not in" / "not has")."""
    return ~F.coalesce(expr, F.lit(False))


def _property_reference(prop: str, ctx: _Ctx) -> Column:
    """$type -> geometry type, $id -> feature id, else map lookup
    (reference filter.py:60-66; map access yields NULL when missing, the
    Column analogue of ``p.get(key)``)."""
    if prop == "$type":
        return ctx.gtype
    if prop == "$id":
        return ctx.fid
    return ctx.props[prop]


def _typed_pair(ref: Column, value) -> tuple[Column, Column]:
    """Align operand types: numeric literals compare numerically (property
    cast to double), booleans against their JSON spelling, strings as-is."""
    if isinstance(value, bool):
        return F.lower(ref.cast("string")), F.lit("true" if value else "false")
    if isinstance(value, (int, float)):
        # try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast
        # *throws* on a non-numeric property value; the GL semantics (and
        # the reference's float() comparison path) need NULL -> no match
        return ref.try_cast("double"), F.lit(float(value))
    return ref.cast("string"), F.lit(value)


def _compile_comparison(prop: str, value, op: str, ctx: _Ctx) -> Column:
    left, right = _typed_pair(_property_reference(prop, ctx), value)
    if op == "==":
        return left.eqNullSafe(right)
    if op == "!=":
        return _negate(left.eqNullSafe(right))
    if op == "<":
        return left < right
    if op == ">":
        return left > right
    if op == "<=":
        return left <= right
    return left >= right


def _compile_in(prop: str, values: Sequence, ctx: _Ctx) -> Column:
    """Membership as an OR of null-safe equalities so each literal keeps its
    own type and a missing property is simply False (filter.py:81-83)."""
    if not values:
        return F.lit(False)
    ref = _property_reference(prop, ctx)
    tests = []
    for v in values:
        left, right = _typed_pair(ref, v)
        tests.append(left.eqNullSafe(right))
    return reduce(lambda a, b: a | b, tests)


def _compile_has(prop: str, ctx: _Ctx) -> Column:
    """Key existence. ``has $id`` checks the id column is present; any other
    key (including the literal "$type", a reference quirk at filter.py:88)
    checks map membership."""
    if prop == "$id":
        return ctx.fid.isNotNull()
    return F.map_contains_key(ctx.props, prop)


def filter_sql(
    filt: Union[FilterExpr, str],
    properties: str = "properties",
    geometry_type: str = "geometry_type",
    feature_id: str = "id",
    map_lookup: str = "element_at({props}, {key})",
) -> str:
    """Render the same filter as an ANSI-SQL boolean expression (used to
    generate DuckDB oracle queries with identical semantics).

    ``map_lookup`` is a format template for property access; override it when
    the oracle stores properties differently (e.g. JSON:
    ``"json_extract_string({props}, {key})"``).
    """
    if isinstance(filt, str):
        filt = json.loads(filt)

    def ref(prop: str) -> str:
        if prop == "$type":
            return geometry_type
        if prop == "$id":
            return feature_id
        return map_lookup.format(props=properties, key=_sql_str(prop))

    def typed(prop: str, value) -> tuple[str, str]:
        if isinstance(value, bool):
            return f"lower(CAST({ref(prop)} AS VARCHAR))", _sql_str(
                "true" if value else "false"
            )
        if isinstance(value, (int, float)):
            # TRY_CAST: a non-numeric property value must compare as NULL
            # (Spark's cast semantics), not raise (DuckDB's strict CAST)
            return f"TRY_CAST({ref(prop)} AS DOUBLE)", repr(float(value))
        return f"CAST({ref(prop)} AS VARCHAR)", _sql_str(value)

    def neg(e: str) -> str:
        return f"(NOT coalesce({e}, false))"

    def has(prop: str) -> str:
        if prop == "$id":
            return f"({feature_id} IS NOT NULL)"
        lookup = map_lookup.format(props=properties, key=_sql_str(prop))
        return f"({lookup} IS NOT NULL)"

    def rec(f: FilterExpr) -> str:
        if not f:
            return "true"
        op = f[0]
        if len(f) == 1:
            return "false" if op == "any" else "true"
        if op in _COMPARISON_OPS:
            left, right = typed(f[1], f[2])
            if op == "==":
                return f"({left} IS NOT DISTINCT FROM {right})"
            if op == "!=":
                return neg(f"({left} IS NOT DISTINCT FROM {right})")
            return f"({left} {op} {right})"
        if op == "any":
            return "(" + " OR ".join(rec(x) for x in f[1:]) + ")"
        if op == "all":
            return "(" + " AND ".join(rec(x) for x in f[1:]) + ")"
        if op == "none":
            return neg("(" + " OR ".join(rec(x) for x in f[1:]) + ")")
        if op == "in":
            if len(f) == 2:
                return "false"
            tests = []
            for v in f[2:]:
                left, right = typed(f[1], v)
                tests.append(f"({left} IS NOT DISTINCT FROM {right})")
            return "(" + " OR ".join(tests) + ")"
        if op == "!in":
            return neg(rec(["in", *f[1:]]))
        if op == "has":
            return has(f[1])
        if op == "!has":
            return neg(has(f[1]))
        return "true"

    return f"coalesce({rec(filt)}, false)"


def _sql_str(s: str) -> str:
    escaped = str(s).replace("'", "''")
    return f"'{escaped}'"
