"""Every top-level script must at least parse (VERDICT r2 weak #1).

Round 2 shipped `scaling_bench.py` with an IndentationError — nothing
imported it, so no test caught it and the Target-2 harness was dead on
arrival.  This guard py_compiles every executable script in the repo so a
shipped syntax error can never recur.
"""

import pathlib
import py_compile

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

SCRIPTS = sorted(
    [
        ROOT / "bench.py",
        ROOT / "scaling_bench.py",
        ROOT / "__graft_entry__.py",
        ROOT / "smc_1m_bench.py",
        *(ROOT / "scripts").glob("*.py"),
    ]
)


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.name)
def test_script_compiles(path):
    if not path.exists():
        pytest.skip(f"{path.name} not present")
    py_compile.compile(str(path), doraise=True)


def test_graft_entry_importable():
    # __graft_entry__ must also import cleanly (the driver calls into it).
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_graft_entry_check", ROOT / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.entry)
    assert callable(mod.dryrun_multichip)
