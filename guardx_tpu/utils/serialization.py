"""JSON-able conversion of arbitrary config objects.

Plays the role of the reference's serialization_utils
(reference: safe_rl_libX/guard_utils/serialization_utils.py:1-32): make a
best-effort JSON tree out of anything, falling back to repr strings.
"""

from __future__ import annotations


def convert_json(obj):
    """Convert obj to a value serializable by json.dumps."""
    if is_json_serializable(obj):
        return obj
    if isinstance(obj, dict):
        return {convert_json(k): convert_json(v) for k, v in obj.items()}
    if isinstance(obj, tuple):
        return tuple(convert_json(x) for x in obj)
    if isinstance(obj, list):
        return [convert_json(x) for x in obj]
    if hasattr(obj, '__name__') and 'lambda' not in obj.__name__:
        return convert_json(obj.__name__)
    if hasattr(obj, '__dict__') and obj.__dict__:
        obj_dict = {
            convert_json(k): convert_json(v) for k, v in obj.__dict__.items()
        }
        return {str(obj): obj_dict}
    return str(obj)


def is_json_serializable(v):
    try:
        import json

        json.dumps(v)
        return True
    except Exception:
        return False
