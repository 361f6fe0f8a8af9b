"""Bitrot net over the CLI tool corpus: every tools/*.py must import
cleanly (no missing deps, no module-level side effects that crash) and,
where it exposes parse_args, print --help.  The reference's tools are
plain scripts with no such net; several are broken in-tree
(e.g. ``rsiseg/apis/inference.py`` imports names that don't exist)."""
import glob
import importlib
import os.path as osp
import sys

import pytest

TOOLS = osp.join(osp.dirname(__file__), '..', 'tools')
sys.path.insert(0, TOOLS)

MODULES = sorted(
    osp.splitext(osp.basename(p))[0]
    for p in glob.glob(osp.join(TOOLS, '*.py')))
# converters/subpackages import on demand; skip shell-only helpers
SKIP = set()


@pytest.mark.parametrize('name', [m for m in MODULES if m not in SKIP])
def test_tool_imports_and_help(name):
    mod = importlib.import_module(name)
    parse = getattr(mod, 'parse_args', None)
    if parse is None:
        return
    with pytest.raises(SystemExit) as e:
        parse(['--help'])
    assert e.value.code in (0, None)
