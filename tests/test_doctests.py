"""Runnable Example docstrings, mirroring the reference's doctest strategy
(SURVEY.md §4: every reference module carries runnable Example docstrings
executed by upstream CI, e.g. summary_mixing.py:67-73, VanillaNN.py:49-55,
Branchformer.py:148-156, Conformer.py:95-102, TransformerASR.py:267-278)."""

import doctest
import importlib

import pytest

MODULES = [
    "summarymixing_tpu.ops.summary_mixing",
    "summarymixing_tpu.ops.linear",
    "summarymixing_tpu.frontend.features",
    "summarymixing_tpu.losses.ctc",
    "summarymixing_tpu.losses.transducer",
    "summarymixing_tpu.models.branchformer",
    "summarymixing_tpu.models.conformer",
    "summarymixing_tpu.models.asr",
    "summarymixing_tpu.parallel.sequence",
    "summarymixing_tpu.parallel.pipeline",
]


@pytest.mark.parametrize("module", MODULES)
def test_module_doctests(module):
    mod = importlib.import_module(module)
    result = doctest.testmod(mod, verbose=False)
    assert result.attempted > 0, f"{module} has no doctests"
    assert result.failed == 0, f"{module}: {result.failed} doctest failures"
