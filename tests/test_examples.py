"""Examples stay importable + a fast end-to-end run of three cheap ones.

The reference ships 60+ examples but never tests them; here every example
module must at least import (catching API drift across the 50 scripts),
and the cheapest three run to completion with tiny budgets.
"""
import glob
import importlib
import os.path as osp
import runpy
import sys

import pytest

EXAMPLES_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "examples")
MODULES = sorted(
    osp.splitext(osp.basename(p))[0]
    for p in glob.glob(osp.join(EXAMPLES_DIR, "*.py"))
    if not osp.basename(p).startswith("_")
)


@pytest.mark.parametrize("name", MODULES)
def test_example_imports(name):
    """Every example imports cleanly (no API drift, no top-level work)."""
    import flax.linen as fnn

    mod = importlib.import_module(f"examples.{name}")
    has_entry = any(hasattr(mod, a) for a in ("main", "Net", "run")) or any(
        isinstance(v, type) and issubclass(v, fnn.Module)
        for v in vars(mod).values()
    )
    assert has_entry, f"examples/{name}.py exposes no entry point"


def _run(name):
    argv = sys.argv
    sys.argv = [f"examples/{name}.py", "--cpu"]
    try:
        runpy.run_path(osp.join(EXAMPLES_DIR, f"{name}.py"), run_name="__main__")
    finally:
        sys.argv = argv


def test_label_prop_runs(capsys):
    _run("label_prop")
    out = capsys.readouterr().out
    assert "test accuracy" in out


def test_wl_kernel_runs(capsys):
    _run("wl_kernel")
    out = capsys.readouterr().out
    assert "LOO accuracy: 1.0000" in out


def test_karate_runs(capsys):
    _run("karate_gcn")
    assert "acc" in capsys.readouterr().out.lower()
