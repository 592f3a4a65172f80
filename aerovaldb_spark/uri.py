"""URI codec: the interchange format between engine implementations.

Semantics match /root/reference/src/aerovaldb/utils/uri.py exactly
(URIs must round-trip across implementations), but the matcher here is
regex-based rather than a hand-rolled token scanner: each template
compiles once to a pattern with non-greedy named groups bounded by
'/' (the reference's force_split) — O(1) per candidate template
instead of per-character scanning.

Encoding is the reference's reversible scheme (uri.py:10):
'/' → '%1', '%' → '%0', applied simultaneously; decode replaces
'%1' then '%0' (order matters and is preserved).
"""

from __future__ import annotations

import re
import urllib.parse
from functools import lru_cache

from .routes import Route, template_args

URI_ENCODE = {"/": "%1", "%": "%0"}
_ENCODE_RX = re.compile("|".join(re.escape(k) for k in URI_ENCODE))


def encode_arg(value: str) -> str:
    """Escape '/' and '%' so a value fits in one URI path segment."""
    return _ENCODE_RX.sub(lambda m: URI_ENCODE[m.group(0)], value)


def decode_arg(value: str) -> str:
    """Inverse of :func:`encode_arg`."""
    for raw, enc in URI_ENCODE.items():
        value = value.replace(enc, raw)
    return value


@lru_cache(maxsize=256)
def _template_pattern(template: str, force_split: str = "/") -> re.Pattern:
    """Compile a '{name}'-style template into a full-match regex.

    Placeholders match lazily and never cross a force_split character —
    the same stopping rule as the reference's scanner
    (utils/uri.py:41-126). Adjacent placeholders are ambiguous and
    rejected there; the compiled regex would resolve them arbitrarily,
    so we reject them up front for identical behavior.
    """
    names = template_args(template)
    if re.search(r"\}\{", template):
        raise ValueError(f"Ambiguous template (adjacent placeholders): {template}")
    pattern = ""
    pos = 0
    for m in re.finditer(r"\{([a-zA-Z-]*?)\}", template):
        pattern += re.escape(template[pos : m.start()])
        name = m.group(1).replace("-", "_")
        cls = f"[^{re.escape(force_split)}]" if force_split else "."
        pattern += f"(?P<{name}>{cls}*?)"
        pos = m.end()
    pattern += re.escape(template[pos:])
    # \Z, not $: '$' also matches before a trailing newline, which
    # would silently drop a '\n' at the end of the last argument.
    rx = re.compile(f"\\A{pattern}\\Z")
    # sanity: every placeholder surfaced as a group
    assert set(rx.groupindex) == {n.replace("-", "_") for n in names}
    return rx


def parse_formatted_string(template: str, string: str) -> dict[str, str]:
    """Inverse of ``template.format(...)``; raises ValueError on mismatch."""
    m = _template_pattern(template).match(string)
    if m is None:
        raise ValueError(f"'{string}' does not match template '{template}'")
    return dict(m.groupdict())


def build_uri(
    route: Route, route_args: dict[str, str], kwargs: dict[str, str] | None = None
) -> str:
    """Serialize (route, args, kwargs) to the interchange URI."""
    encoded = {k: encode_arg(str(v)) for k, v in route_args.items()}
    uri = route.value.format(**encoded)
    if kwargs:
        qs = "&".join(f"{k}={encode_arg(str(v))}" for k, v in kwargs.items())
        uri = f"{uri}?{qs}"
    return uri


def parse_uri(uri: str) -> tuple[Route, dict[str, str], dict[str, str]]:
    """Parse an interchange URI back to (route, route_args, kwargs).

    Tries each route template in declaration order, like the reference
    (utils/uri.py:129-177).
    """
    uri = str(uri)
    path, _, query = uri.partition("?")
    for route in Route:
        try:
            args = parse_formatted_string(route.value, path)
        except ValueError:
            continue
        route_args = {k: decode_arg(v) for k, v in args.items()}
        kwargs: dict[str, str] = {}
        if query:
            parsed = urllib.parse.parse_qs(query)
            kwargs = {k: decode_arg(v[0]) for k, v in parsed.items()}
        return route, route_args, kwargs
    raise ValueError(f"URI {uri} is not a valid URI.")
