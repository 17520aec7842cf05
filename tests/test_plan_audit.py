"""CI hook for the physical-plan audit: the skew-cap and plan-shape
invariants in tools/plan_audit.py must hold on every commit."""

from __future__ import annotations

import subprocess
import sys


def test_plan_audit_passes():
    r = subprocess.run(
        [sys.executable, "tools/plan_audit.py"],
        cwd="/root/repo", capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
