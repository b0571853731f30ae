"""Executable docstring examples (the reference runs --doctest-modules over
its whole package, projects/pyproject.toml.template:132-140; here every
replay_tpu module containing a ``>>>`` example is collected and run).
"""

import doctest
import importlib
import pkgutil
from pathlib import Path

import pytest as _pytest

pytestmark = _pytest.mark.core

import pytest

import replay_tpu

PKG_ROOT = Path(replay_tpu.__file__).parent


def _modules_with_examples():
    names = []
    for info in pkgutil.walk_packages([str(PKG_ROOT)], prefix="replay_tpu."):
        rel = Path(info.module_finder.path) / (info.name.rsplit(".", 1)[-1] + ".py")
        if info.ispkg:
            rel = Path(info.module_finder.path) / info.name.rsplit(".", 1)[-1] / "__init__.py"
        try:
            text = rel.read_text()
        except OSError:
            continue
        if ">>> " in text:
            names.append(info.name)
    return sorted(names)


MODULES = _modules_with_examples()


def test_examples_exist():
    """The doctest net must be catching something (guards the walker)."""
    assert len(MODULES) >= 5, MODULES


@pytest.mark.parametrize("module_name", MODULES)
def test_doctests(module_name):
    module = importlib.import_module(module_name)
    result = doctest.testmod(
        module,
        verbose=False,
        optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS,
    )
    assert result.failed == 0, f"{result.failed} doctest failure(s) in {module_name}"
