"""Run the accuracy harnesses (demos/accuracy/*) in CI.

Each demo builds a scene whose answer is known in closed form and asserts
measured vs theory internally (reference idiom, SURVEY.md §4 /
demos/accuracy/observing_sphere.py:11-50). This test executes each demo's
main() so the analytic validations gate the suite (VERDICT round-1 item 3).
"""

import importlib.util
import sys
from pathlib import Path

import pytest

DEMOS = sorted((Path(__file__).parent.parent / "demos" / "accuracy").glob("*.py"))


@pytest.mark.parametrize("path", DEMOS, ids=lambda p: p.stem)
def test_accuracy_demo(path):
    spec = importlib.util.spec_from_file_location(f"accuracy_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    mod.main()
