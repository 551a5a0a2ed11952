"""Pure-Python Mapbox GL filter evaluator (no ``eval``).

Used only *inside* pandas UDFs (segmentation rasterize, reference
label.py:136-139), where a Catalyst Column can't be evaluated.  Semantics
mirror ``filters.compile_filter`` exactly, including the documented
null-handling: missing property makes ``==``/``in``/ordered comparisons
False and ``!=``/``!in``/``!has`` True.

Unlike the reference (filter.py:26-29), which string-compiles and ``eval``s
the filter once per feature, this interprets the s-expression directly.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence, Union

FilterExpr = Optional[Sequence]

_COMPARISON_OPS = {"==", "!=", "<", ">", "<=", ">="}


def feature_passes(filt: Union[FilterExpr, str], feature: dict) -> bool:
    """Evaluate a GL filter against a feature dict
    ``{"properties": {...}, "geometry": {"type": ...}, "id": ...}``."""
    if isinstance(filt, str):
        filt = json.loads(filt)
    return _eval(filt, feature)


def _ref(prop: str, feature: dict):
    if prop == "$type":
        return (feature.get("geometry") or {}).get("type")
    if prop == "$id":
        return feature.get("id")
    return (feature.get("properties") or {}).get(prop)


def _typed(raw, value):
    """Align operand types the same way the Column compiler does."""
    if raw is None:
        return None, None
    if isinstance(value, bool):
        return str(raw).lower(), "true" if value else "false"
    if isinstance(value, (int, float)):
        try:
            return float(raw), float(value)
        except (TypeError, ValueError):
            return None, None
    return str(raw), value


def _eval(filt: FilterExpr, feature: dict) -> bool:
    if not filt:
        return True
    op = filt[0]
    if len(filt) == 1:
        return op != "any"
    if op in _COMPARISON_OPS:
        left, right = _typed(_ref(filt[1], feature), filt[2])
        if op == "==":
            return left is not None and left == right
        if op == "!=":
            return not (left is not None and left == right)
        if left is None:
            return False  # SQL semantics: NULL ordered-compares to nothing
        if op == "<":
            return left < right
        if op == ">":
            return left > right
        if op == "<=":
            return left <= right
        return left >= right
    if op == "any":
        return any(_eval(f, feature) for f in filt[1:])
    if op == "all":
        return all(_eval(f, feature) for f in filt[1:])
    if op == "none":
        return not any(_eval(f, feature) for f in filt[1:])
    if op == "in":
        return _in(filt[1], filt[2:], feature)
    if op == "!in":
        return not _in(filt[1], filt[2:], feature)
    if op == "has":
        return _has(filt[1], feature)
    if op == "!has":
        return not _has(filt[1], feature)
    return True


def _in(prop: str, values: Sequence, feature: dict) -> bool:
    raw = _ref(prop, feature)
    for v in values:
        left, right = _typed(raw, v)
        if left is not None and left == right:
            return True
    return False


def _has(prop: str, feature: dict) -> bool:
    if prop == "$id":
        return feature.get("id") is not None
    return prop in (feature.get("properties") or {})
