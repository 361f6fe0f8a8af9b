"""The mIoU-parity runbook's plumbing stays executable in-repo
(VERDICT r2 next-step #3): ``tools/reproduce_baseline.py --dry-run``
generates a synthetic corpus, saves a fresh checkpoint, runs the real
convert->eval->gate path and must PASS its self-gate."""
import os.path as osp
import sys

import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))


@pytest.mark.slow
def test_reproduce_baseline_dry_run(tmp_path):
    import reproduce_baseline
    rc = reproduce_baseline.main(
        ['--dry-run', '--work-dir', str(tmp_path)])
    assert rc == 0
    assert (tmp_path / 'eval.json').exists()


def test_reproduce_baseline_requires_checkpoint(tmp_path):
    import reproduce_baseline
    with pytest.raises(SystemExit):
        reproduce_baseline.main(['--work-dir', str(tmp_path)])
