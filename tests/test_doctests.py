"""Run the runnable Example docstrings of key public modules (parity with
the reference's doctest strategy, SURVEY.md §4)."""

import doctest

import summarymixing_tpu.ops.summary_mixing as sm_mod
import summarymixing_tpu.ops.masks as masks_mod
import summarymixing_tpu.data.batching as batching_mod


def _run(mod):
    res = doctest.testmod(mod, verbose=False)
    assert res.failed == 0, f"{mod.__name__}: {res.failed} doctest failures"


def test_summary_mixing_doctests():
    _run(sm_mod)


def test_masks_doctests():
    _run(masks_mod)


def test_batching_doctests():
    _run(batching_mod)
