"""JSON-able conversion of arbitrary config objects.

Plays the role of the reference's serialization_utils
(reference: safe_rl_libX/guard_utils/serialization_utils.py:1-32) with the
same contract — turn anything a user might stuff in an experiment config
into a tree json.dumps accepts, degrading to names/repr strings — but
re-derived: explicit primitive/type dispatch instead of trial
serialization at every node.
"""

from __future__ import annotations

import json

_JSON_PRIMITIVES = (str, int, float, bool, type(None))


def convert_json(obj):
    """Best-effort conversion of ``obj`` to a json.dumps-able tree.

    Rules, in order: JSON primitives pass through; containers convert
    elementwise; named callables/classes (not lambdas) become their name;
    objects with a populated ``__dict__`` become ``{repr: attr-tree}``;
    anything else that happens to serialize passes through, else ``str``.
    """
    if isinstance(obj, _JSON_PRIMITIVES):
        return obj
    if isinstance(obj, dict):
        return {convert_json(k): convert_json(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        items = [convert_json(x) for x in obj]
        return items if isinstance(obj, list) else tuple(items)
    name = getattr(obj, '__name__', None)
    if isinstance(name, str) and 'lambda' not in name:
        return name
    attrs = getattr(obj, '__dict__', None)
    if attrs:
        return {str(obj): convert_json(attrs)}
    if is_json_serializable(obj):
        return obj
    return str(obj)


def is_json_serializable(value) -> bool:
    """True when ``json.dumps(value)`` would succeed."""
    try:
        json.dumps(value)
    except (TypeError, ValueError, OverflowError):
        return False
    return True
