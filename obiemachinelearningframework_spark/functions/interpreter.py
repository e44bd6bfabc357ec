"""Datatype-literal normalization (semantic interpretation).

Re-creates the behavior of the reference's datatype interpreters
(``dtinterpreter/AbstractNumericInterpreter.java``): a matched datatype
literal like ``"250 milligrams"``, ``"two weeks"`` or ``"184 centimeters"``
is normalized to a canonical ``"<value:g> <canonical-unit>"`` string —
written numbers mapped to digits (``:123-157``), unit spelling variations
mapped to a unified unit (``:53-121``), commas stripped from digit groups
(``:159-161``).

Pure Python, deterministic, executed inside the vectorized mention UDF —
never as a row-at-a-time Python UDF.
"""

from __future__ import annotations

import re

WRITTEN_NUMBERS = {
    "one": 1.0, "two": 2.0, "three": 3.0, "four": 4.0, "five": 5.0,
    "six": 6.0, "seven": 7.0, "eight": 8.0, "nine": 9.0, "ten": 10.0,
    "eleven": 11.0, "twelve": 12.0, "thirteen": 13.0, "fourteen": 14.0,
    "fifteen": 15.0,
}

# unified-unit mapping, per AbstractNumericInterpreter.map (:53-121), plus
# the length units our soccer domain needs (same canonicalization style)
UNIT_MAP = {
    "per day": "daily", "a day": "daily",
    "milligram": "mg", "milligrams": "mg",
    "kilo": "kg", "kilogram": "kg", "kilograms": "kg",
    "grams": "g", "gram": "g", "gm": "g",
    "minutes": "min", "minute": "min", "mins": "min",
    "hours": "h", "hour": "h", "hr": "h",
    "seconds": "s", "second": "s",
    "milliliter": "ml", "milliliters": "ml",
    "weeks": "week", "w": "week",
    "days": "day", "d": "day",
    "months": "month",
    "years": "year", "y": "year",
    "%": "percentage",
    "centimeter": "cm", "centimeters": "cm", "centimetre": "cm", "centimetres": "cm",
    "meter": "m", "meters": "m",
}

_NUM = re.compile(r"^\d{1,3}(?:,\d{3})*(?:\.\d+)?$|^\d+(?:\.\d+)?$")


def canonical_unit(unit: str | None) -> str | None:
    if unit is None:
        return None
    u = unit.strip().lower()
    return UNIT_MAP.get(u, u)


def parse_number(token: str) -> float | None:
    t = token.strip().lower()
    if t in WRITTEN_NUMBERS:
        return WRITTEN_NUMBERS[t]
    t = t.replace(",", "")
    try:
        return float(t)
    except ValueError:
        return None


def normalize(value_token: str | None, unit_token: str | None) -> str | None:
    """Canonical string form ``"<value:g> <unit>"`` (unit omitted if none).
    Returns None when the value token is not interpretable."""
    if value_token is None:
        return None
    v = parse_number(value_token)
    if v is None:
        return None
    u = canonical_unit(unit_token)
    sval = f"{v:g}"
    return f"{sval} {u}" if u else sval


def interpret_match(match: re.Match) -> str | None:
    """Interpret a datatype regex match: group(1) = value, group(2) = unit
    if present; a group-less pattern interprets its full text as the value.
    Mirrors IDatatypeInterpreter.interpret(class, matcher)."""
    groups = match.groups()
    if not groups:
        return normalize(match.group(0), None)
    value = groups[0] if groups[0] is not None else match.group(0)
    unit = groups[1] if len(groups) > 1 else None
    return normalize(value, unit)
