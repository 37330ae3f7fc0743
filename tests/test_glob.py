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


# -- {a,b} brace expansion: graphite-web-layer OPT-IN (VERDICT r8
# "What's missing" #5) — the fnmatch-exact default is untouched ------

from ceres_spark.plans.glob import expand_braces  # noqa: E402


def test_braces_simple():
    assert expand_braces("a.{b,c}.d") == ["a.b.d", "a.c.d"]


def test_braces_nested():
    assert expand_braces("x.{a,{b,c}}") == ["x.a", "x.b", "x.c"]


def test_braces_multiple_groups_cartesian():
    assert expand_braces("{a,b}.{1,2}") == [
        "a.1", "a.2", "b.1", "b.2"
    ]


def test_braces_empty_alternative():
    assert expand_braces("a{,b}") == ["a", "ab"]


def test_braces_escaped_is_literal():
    assert expand_braces(r"a\{b,c\}") == [r"a\{b,c\}"]


def test_braces_unmatched_is_literal():
    assert expand_braces("a{bc") == ["a{bc"]
    assert expand_braces("ab}c") == ["ab}c"]


def test_braces_no_group_passthrough():
    assert expand_braces("servers.*.cpu") == ["servers.*.cpu"]


def test_braces_comma_inside_nested_group_stays_put():
    # the inner comma splits the INNER group only
    assert expand_braces("{a,b{c,d}}") == ["a", "bc", "bd"]


def test_find_braces_dial(spark):
    from ceres_spark import catalog as cat

    catalog = cat.catalog_from_points(
        spark.createDataFrame(
            [("click",), ("view",), ("purchase",)], ["metric"]
        )
    )
    # default stays fnmatch-exact: braces match nothing literally
    assert cat.find(catalog, "{click,view}").count() == 0
    got = sorted(
        r["metric"]
        for r in cat.find(catalog, "{click,view}", braces=True)
        .select("metric").collect()
    )
    assert got == ["click", "view"]
    # composes with fnmatch inside alternatives
    got = sorted(
        r["metric"]
        for r in cat.find(catalog, "{c*,v???}", braces=True)
        .select("metric").collect()
    )
    assert got == ["click", "view"]


def test_glob_to_regex_body_is_the_unanchored_contract():
    # ADVICE r9: catalog.find used to slice '^...$' off positionally;
    # the body function is the loud seam instead
    from ceres_spark.plans.glob import glob_to_regex, glob_to_regex_body

    for pat in ["a.b.*", "serv?r.[ab]c", "plain", "x.{a,b}"]:
        body = glob_to_regex_body(pat)
        assert glob_to_regex(pat) == "^" + body + "$"
        assert not body.startswith("^") and not body.endswith("$")


def test_braces_cross_product_property():
    # for literal-only non-nested groups, expansion must be the exact
    # cross product, first-alternative-first — checked against an
    # independent itertools construction over generated patterns
    import itertools
    import random

    from ceres_spark.plans.glob import expand_braces

    rng = random.Random(42)
    alphabet = ["srv", "db", "web01", "x", "metric"]
    for _ in range(50):
        n_groups = rng.randint(1, 3)
        pieces, alternative_sets = [], []
        for g in range(n_groups):
            pieces.append(rng.choice(alphabet) + ".")
            alts = [rng.choice(alphabet) for _ in range(rng.randint(1, 3))]
            alternative_sets.append(alts)
            pieces.append("{" + ",".join(alts) + "}")
        pieces.append("." + rng.choice(alphabet))
        pattern = "".join(pieces)
        want = []
        for combo in itertools.product(*alternative_sets):
            out, it = [], iter(combo)
            for p in pieces:
                out.append(next(it) if p.startswith("{") else p)
            want.append("".join(out))
        assert expand_braces(pattern) == want, pattern
