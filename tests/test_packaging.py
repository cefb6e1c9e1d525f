"""Packaging: the distribution installs and its console entry points
resolve (the reference is an installable package with setup.py,
SipMask-mmdetection/setup.py:90-300; here pyproject.toml +
[project.scripts])."""

import importlib
import importlib.metadata as md

import pytest


def _dist():
    try:
        return md.distribution("sipmask-tpu")
    except md.PackageNotFoundError:
        return None


@pytest.mark.skipif(_dist() is None,
                    reason="sipmask-tpu not pip-installed (run "
                           "`pip install -e . --no-deps`)")
class TestPackaging:
    def test_entry_points_resolve(self):
        eps = [e for e in md.distribution("sipmask-tpu").entry_points
               if e.group == "console_scripts"]
        names = {e.name for e in eps}
        assert {"sipmask-train", "sipmask-test", "sipmask-demo",
                "sipmask-export"} <= names
        for e in eps:
            fn = e.load()
            assert callable(fn), e.name

    def test_package_importable_from_dist(self):
        import sipmask_tpu
        import sipmask_tools.train
        assert callable(sipmask_tools.train.main)
        assert hasattr(sipmask_tpu, "__file__")

    def test_native_source_shipped(self):
        # the C++ RLE/IoU core ships with the package (package-data)
        import os
        import sipmask_tpu.native as n
        d = os.path.dirname(n.__file__)
        assert any(f.endswith(".cpp") for f in os.listdir(d))
