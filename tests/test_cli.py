"""CLI argument handling (reference op 37: JCommander + validator)."""

from __future__ import annotations

import pytest

from lakehouse_test_spark.cli import build_parser, positive_int


def test_positive_int_validator():
    assert positive_int("5") == 5
    for bad in ("0", "-3"):
        with pytest.raises(Exception):
            positive_int(bad)


def test_parser_verbs():
    p = build_parser()
    a = p.parse_args(["produce", "--table", "/tmp/t", "-m", "10", "-t", "2", "-p", "3"])
    assert (a.verb, a.num_messages, a.num_shards, a.num_producers) == ("produce", 10, 2, 3)
    a = p.parse_args(["consume", "--table", "/tmp/t", "--since-version", "4"])
    assert a.since_version == 4
    a = p.parse_args(["produce_amazon", "-f", "x.csv", "--table", "/tmp/t"])
    assert a.file == "x.csv"
    with pytest.raises(SystemExit):
        p.parse_args(["produce", "--table", "/tmp/t", "-m", "0"])
    with pytest.raises(SystemExit):
        p.parse_args(["unknown_verb"])
