"""The pyproject console scripts must resolve to real callables.

These are the install-time twins of the reference's launch harness
(launch/detect.launch, launch/create_mask.launch); the CLIs themselves are
functionally tested in test_cli_tools.py — this pins the packaging wiring
so a rename in vofod_tpu.tools can't silently break `pip install`-ed
commands.
"""

import importlib
import pathlib
import tomllib


def test_console_scripts_resolve():
    pyproject = pathlib.Path(__file__).resolve().parent.parent / "pyproject.toml"
    scripts = tomllib.loads(pyproject.read_text())["project"]["scripts"]
    assert set(scripts) == {
        "vofod-detect",
        "vofod-serve-fleet",
        "vofod-bag-to-npz",
        "vofod-create-mask",
    }
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn), f"{name} -> {target} is not callable"
