"""Glob→regex translation (op #12) — mirrors CeresTreeTest.find cases."""

import re

from ceres_spark.plans.glob import glob_to_regex


def m(pattern, s):
    return re.match(glob_to_regex(pattern), s) is not None


def test_star_within_segment():
    assert m("servers.*.cpu", "servers.web01.cpu")
    assert not m("servers.*.cpu", "servers.web01.disk.cpu")  # * stops at '.'
    assert not m("servers.*", "servers.a.b")


def test_question_mark():
    assert m("?rror", "error")
    assert not m("?rror", "terror"[0:6] if False else "xxrror")


def test_char_class():
    assert m("[cp]*", "click")
    assert m("[cp]*", "purchase")
    assert not m("[cp]*", "view")
    assert m("[!cp]*", "view")
    assert not m("[!cp]*", "click")


def test_literal_dots_escaped():
    assert m("a.b", "a.b")
    assert not m("a.b", "axb")


def test_unterminated_class_is_literal():
    assert m("a[b", "a[b")


def test_exact_name():
    assert m("click", "click")
    assert not m("click", "clicks")
