"""Packaging sanity: every console script declared in pyproject.toml
resolves to an importable callable, so `pip install -e .` yields working
CLIs (the installable analog of the reference's `python tfsr/trainer_sr.py`
invocation style)."""

import importlib
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_console_scripts_resolve():
    text = open(os.path.join(REPO, "pyproject.toml")).read()
    block = text.split("[project.scripts]")[1].split("[tool.")[0]
    entries = re.findall(r'^[\w-]+ = "([\w.]+):(\w+)"', block, re.M)
    assert len(entries) >= 9
    for module, attr in entries:
        mod = importlib.import_module(module)
        assert callable(getattr(mod, attr)), (module, attr)
