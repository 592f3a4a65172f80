"""JSON serialization with the reference's conventions.

- NaN/Infinity normalize to null (reference uses simplejson's
  ignore_nan, utils/json.py:11-18; asserted by its test
  tests/test_aerovaldb.py:453-464).
- Python sets serialize as lists (utils/json.py:4-8).

Implemented on stdlib json via a pre-pass transform (simplejson is not
available here and the pre-pass keeps behavior explicit).
"""

from __future__ import annotations

import json
import math
from typing import Any


def _normalize(obj: Any) -> Any:
    if isinstance(obj, float) and (math.isnan(obj) or math.isinf(obj)):
        return None
    if isinstance(obj, dict):
        return {k: _normalize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_normalize(v) for v in obj]
    if isinstance(obj, (set, frozenset)):
        return [_normalize(v) for v in obj]
    return obj


def json_dumps_wrapper(obj: Any, **kwargs: Any) -> str:
    """Serialize with NaN→null and set→list semantics."""
    return json.dumps(_normalize(obj), **kwargs)


def json_loads(s: str) -> Any:
    return json.loads(s)
