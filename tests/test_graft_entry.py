"""Driver entry-point checks.

``dryrun_multichip`` must be hermetic: it has to run on a virtual
CPU mesh even when the surrounding environment would initialize a
(broken/tunneled) TPU backend — that exact failure sank round 1's
``MULTICHIP_r01.json``.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_dryrun_multichip_inprocess(monkeypatch):
    # conftest forces jax_platforms=cpu with 8 virtual devices, so the
    # fast in-process path applies.  Budget gating is for the DRIVER's
    # wall clock; the gating test must exercise ALL phases — a cold
    # compile cache would otherwise skip phase 8 (the GSPMD
    # merged-vs-sequential guard) and silently pass.
    monkeypatch.setenv('PFST_DRYRUN_BUDGET_S', '0')
    import __graft_entry__ as g
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess_hermetic():
    """Simulate the driver: no CPU forcing in the parent env.

    The parent process deliberately does NOT set JAX_PLATFORMS/
    XLA_FLAGS; dryrun_multichip must still come back green by
    re-execing itself with a forced CPU platform.
    """
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS',
                        'PFST_DRYRUN_CHILD')}
    code = ('import __graft_entry__ as g\n'
            'g.dryrun_multichip(8)\n'
            "print('parent ok')\n")
    r = subprocess.run([sys.executable, '-c', code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-4000:]
    assert 'parent ok' in r.stdout
