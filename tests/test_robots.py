"""robots.txt parse + longest-match filter unit tests (wave 66)."""

import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.extras.robots import parse_robots_rules, robots_filter


def test_parse_sections_and_agent_selection():
    body = (
        "# comment\n"
        "User-agent: googlebot\n"
        "Disallow: /private\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /tmp\n"
        "Allow: /tmp/ok\n"
        "Disallow:\n"  # empty = allow-all, no rule
    )
    star = parse_robots_rules({"ex.com": body})
    assert set(star) == {("ex.com", False, "/tmp"), ("ex.com", True, "/tmp/ok")}
    goog = parse_robots_rules({"ex.com": body}, agent="GoogleBot")
    assert goog == [("ex.com", False, "/private")]


def _filter(urls, rules):
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))
    return set(robots_filter(ds, rules).to_pandas()["url"])


def test_longest_match_and_tie(ray_session):
    rules = [
        ("a.com", False, "/x"),
        ("a.com", True, "/x/ok"),
        # length tie on /y: Allow wins
        ("a.com", False, "/y"),
        ("a.com", True, "/y"),
    ]
    kept = _filter(
        [
            "https://a.com/x/no",
            "https://a.com/x/ok/yes",
            "https://a.com/y/anything",
            "https://a.com/free",
            "https://other.com/x/no",  # host without rules -> allowed
            "not a url",  # conservatively dropped
        ],
        rules,
    )
    assert kept == {
        "https://a.com/x/ok/yes",
        "https://a.com/y/anything",
        "https://a.com/free",
        "https://other.com/x/no",
    }


def test_rule_cap_refuses(ray_session):
    ds = rd.from_arrow(pa.table({"url": ["https://a.com/"]}))
    with pytest.raises(ValueError, match="max_rules"):
        robots_filter(ds, [("a.com", True, "/")] * 5, max_rules=3)
