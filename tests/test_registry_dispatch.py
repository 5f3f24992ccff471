"""apply_scorer arity dispatch — the custom-scorer seam must accept
3-arg, 4-arg, *args, and keyword-only-files scorers (X1 contract)."""

from __future__ import annotations

import pytest

from uncp_spark.plans.registry import ScorerSpec, apply_scorer


def test_three_arg_scorer_called_without_files():
    spec = ScorerSpec("s3", lambda p, s, c: ("3", p, s, c))
    assert apply_scorer(spec, 1, 2, 3, files=9) == ("3", 1, 2, 3)


def test_four_arg_scorer_receives_files():
    spec = ScorerSpec("s4", lambda p, s, c, f=None: ("4", f))
    assert apply_scorer(spec, 1, 2, 3, files=9) == ("4", 9)


def test_var_positional_scorer_receives_files():
    spec = ScorerSpec("sv", lambda *a: a)
    assert apply_scorer(spec, 1, 2, 3, files=9) == (1, 2, 3, 9)


def test_keyword_only_files_scorer_receives_files_by_name():
    def kw(p, s, c, *, files=None):
        return ("kw", files)

    assert apply_scorer(ScorerSpec("skw", kw), 1, 2, 3, files=9) == ("kw", 9)


def test_unbindable_scorer_raises_clearly():
    def bad(a, b):
        return None

    with pytest.raises(TypeError, match="cannot accept"):
        apply_scorer(ScorerSpec("bad", bad), 1, 2, 3, files=9)
