"""Driver-evidence rotation guard.

The round driver samples the FIRST 50 ``queries()`` entries for its
correctness window.  Round 6 wasted 45 of its 50 slots re-verifying
already-green rows because the demotion list was never extended with the
r5-green names (VERDICT r6, "What's wrong" item 1).  These tests make
that failure mode a committed-code failure instead of a silent no-op:

1. every name that ever earned a green row in any ``CORRECTNESS_r*.json``
   must appear in ``_DRIVER_GREEN``; and
2. the first-50 window of ``queries()`` must contain none of them
   (until the fresh pool is exhausted, at which point re-verification
   is the correct behaviour).
"""

import glob
import importlib.util
import json
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_rotation_test", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _recorded_green() -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if row.get("rows_match") and row.get("schema_match"):
                green.add(name)
    return green


def test_driver_green_covers_all_recorded_rounds():
    mod = _entry_module()
    recorded = _recorded_green()
    assert recorded, "no CORRECTNESS_r*.json artifacts found"
    missing = recorded - set(mod._DRIVER_GREEN)
    assert not missing, (
        f"{len(missing)} driver-green names missing from _DRIVER_GREEN "
        f"(append them so the next window is all first-timers): "
        f"{sorted(missing)}"
    )


def test_driver_green_names_exist_in_registry():
    mod = _entry_module()
    keys = set(mod.queries())
    stale = set(mod._DRIVER_GREEN) - keys
    assert not stale, f"_DRIVER_GREEN names not in queries(): {sorted(stale)}"


def test_first_50_window_is_all_first_timers():
    mod = _entry_module()
    keys = list(mod.queries())
    recorded = _recorded_green()
    fresh_pool = [k for k in keys if k not in recorded]
    if len(fresh_pool) < 50:
        pytest.skip(
            "fewer than 50 never-checked queries remain; window "
            "legitimately re-verifies green rows"
        )
    window = keys[:50]
    burned = sorted(set(window) & recorded)
    assert not burned, (
        f"{len(burned)} already-green names occupy first-50 driver window "
        f"slots: {burned}"
    )
