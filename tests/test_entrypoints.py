"""The catalog registry must fail LOUDLY when any catalog module cannot
import (r9 verdict watch item 1: the old try/except-ImportError guards
silently dropped whole modules from the registry, the bench list, and
the rotation window)."""

from __future__ import annotations

import subprocess
import sys

_BROKEN_IMPORT_SCRIPT = r"""
import importlib.abc
import sys


class _Sabotage(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name == "pimdb_spark.catalog_analytics":
            raise ImportError("sabotaged for test")
        return None


sys.meta_path.insert(0, _Sabotage())
try:
    import pimdb_spark.entrypoints  # noqa: F401
except ImportError:
    print("RAISED")
else:
    from pimdb_spark.catalog import _REGISTRY
    print("SILENT", len(_REGISTRY))
"""


def test_broken_catalog_module_raises_not_shrinks():
    out = subprocess.run(
        [sys.executable, "-c", _BROKEN_IMPORT_SCRIPT],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.stdout.strip() == "RAISED", (out.stdout, out.stderr)


def test_registry_complete_on_clean_import():
    from pimdb_spark import entrypoints

    names = entrypoints.queries()
    # every catalog module contributes at least one entry; a sudden drop
    # below the round-9 registry floor means a module went missing
    assert len(names) >= 137, len(names)
