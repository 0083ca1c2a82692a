"""tools/check.py harness self-checks.

The verification tool itself must fail safe: round-10's verdict flagged
that ``ladder()`` returned 0 when ZERO fixture dirs existed — a
misconfigured environment (wrong mount, typo'd path) would pass the
commit gate having checked nothing.
"""

from __future__ import annotations

import os

from tools.check import ladder


def test_ladder_nonzero_when_no_fixture_dirs(monkeypatch, capsys):
    monkeypatch.setenv("LADDER_DIRS", "/nonexistent/a:/nonexistent/b")
    rc = ladder(["agg_grouped"])
    assert rc == 2, "zero rungs checked must NOT read as a pass"
    assert "nothing was checked" in capsys.readouterr().err


def test_ladder_usage_error_on_no_keys():
    assert ladder([]) == 2


def test_ladder_env_override_points_at_real_dir(monkeypatch):
    """The LADDER_DIRS override must actually be honored (one real rung,
    one bogus — only the real one runs)."""
    import subprocess
    import sys

    recorded = []

    def fake_run(cmd, env=None):
        recorded.append(env["SF_DIR"])

        class R:
            returncode = 0

        return R()

    monkeypatch.setenv("LADDER_DIRS", "/root/testdata/sf0.001:/nonexistent/x")
    monkeypatch.setattr(subprocess, "run", fake_run)
    rc = ladder(["agg_grouped"])
    assert rc == 0
    assert recorded == ["/root/testdata/sf0.001"]
