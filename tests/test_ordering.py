"""Sort-satisfaction unit tests — the three docs/4 cases plus
propagation rules (pure Python, no Spark needed)."""

from sparkplans.ordering import (
    SortKey,
    normalize_sort_keys,
    ordering_satisfies,
    project_ordering,
)

ORDER = ["env", "service", "host"]  # the reference dimension order


def test_exact_match_satisfied():
    # docs/4_cli_read_plans_sort_projection.md:33-57
    assert ordering_satisfies(ORDER, ["env", "service", "host"])


def test_prefix_subset_satisfied():
    # "Good Subset" docs/4:60-84
    assert ordering_satisfies(ORDER, ["env", "service"])
    assert ordering_satisfies(ORDER, ["env"])


def test_non_prefix_subset_not_satisfied():
    # "Bad Subset" docs/4:87-111 — the regression case
    assert not ordering_satisfies(ORDER, ["env", "host"])
    assert not ordering_satisfies(ORDER, ["service"])
    assert not ordering_satisfies(ORDER, ["host"])


def test_direction_mismatch_not_satisfied():
    assert not ordering_satisfies(ORDER, ["env DESC"])
    assert ordering_satisfies(["env DESC", "service"], ["env DESC"])


def test_longer_requirement_not_satisfied():
    assert not ordering_satisfies(["env"], ["env", "service"])


def test_empty_requirement_always_satisfied():
    assert ordering_satisfies([], [])
    assert ordering_satisfies(ORDER, [])
    assert not ordering_satisfies([], ["env"])


def test_normalize_forms():
    keys = normalize_sort_keys(["a", "b DESC", ("c", False), SortKey("d", True, False)])
    assert keys[0] == SortKey("a", True, None)
    assert keys[1].asc is False
    assert keys[2].asc is False
    assert keys[3].effective_nulls_first is False


def test_nulls_default_follows_direction():
    a, d = normalize_sort_keys(["x", "y DESC"])
    assert a.effective_nulls_first is True
    assert d.effective_nulls_first is False


def test_projection_keeps_prefix():
    # docs/4:113-140: projecting (host, env) keeps knowledge of the
    # order prefix that survives
    prov = normalize_sort_keys(ORDER)
    assert project_ordering(prov, ["env", "service", "host"]) == prov
    assert [k.col for k in project_ordering(prov, ["env", "host"])] == ["env"]
    assert project_ordering(prov, ["service", "host"]) == ()
