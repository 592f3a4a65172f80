"""URI codec semantics (reference: tests/test_utils.py:13-115)."""

from __future__ import annotations

import pytest

from aerovaldb_spark.routes import Route
from aerovaldb_spark.uri import (
    build_uri,
    decode_arg,
    encode_arg,
    parse_formatted_string,
    parse_uri,
)


@pytest.mark.parametrize(
    "raw",
    ["plain", "with/slash", "with%percent", "%1", "%0", "a/b%c/d", "FFire2022_eea", ""],
)
def test_encode_decode_roundtrip(raw):
    assert decode_arg(encode_arg(raw)) == raw


def test_encode_specifics():
    assert encode_arg("a/b") == "a%1b"
    assert encode_arg("a%b") == "a%0b"
    assert encode_arg("%1") == "%01"
    assert decode_arg("%01") == "%1"


def test_parse_formatted_string():
    assert parse_formatted_string("{a}/{b}", "test1/test2") == {
        "a": "test1",
        "b": "test2",
    }


def test_parse_formatted_string_literal_infix():
    assert parse_formatted_string("/x/{a}-{b}/y", "/x/1-2/y") == {"a": "1", "b": "2"}


def test_parse_formatted_string_mismatch():
    with pytest.raises(ValueError):
        parse_formatted_string("{a}/{b}", "only-one-part")


def test_build_parse_roundtrip_simple():
    uri = build_uri(Route.EXPERIMENTS, {"project": "proj"})
    assert uri == "/v0/experiments/proj"
    assert parse_uri(uri) == (Route.EXPERIMENTS, {"project": "proj"}, {})


def test_build_parse_roundtrip_kwargs():
    uri = build_uri(
        Route.MAP,
        {
            "project": "p",
            "experiment": "e",
            "network": "n",
            "obsvar": "o",
            "layer": "l",
            "model": "m",
            "modvar": "v",
        },
        {"time": "2024"},
    )
    route, args, kwargs = parse_uri(uri)
    assert route is Route.MAP
    assert args["network"] == "n"
    assert kwargs == {"time": "2024"}


@pytest.mark.parametrize("tricky", ["a/b", "a%b", "a_b", "100%/done"])
def test_roundtrip_tricky_values(tricky):
    uri = build_uri(
        Route.CONFIG, {"project": "proj", "experiment": tricky}
    )
    route, args, _ = parse_uri(uri)
    assert route is Route.CONFIG
    assert args["experiment"] == tricky


def test_parse_uri_invalid():
    with pytest.raises(ValueError):
        parse_uri("/nope/not-a-route")


def test_every_route_roundtrips():
    from aerovaldb_spark.routes import template_args

    for route in Route:
        args = {k: f"val-{k}" for k in template_args(route.value)}
        uri = build_uri(route, dict(args))
        parsed_route, parsed_args, _ = parse_uri(uri)
        assert parsed_route is route, f"{route}: parsed as {parsed_route}"
        assert parsed_args == args
