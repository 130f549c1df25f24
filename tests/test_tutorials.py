"""Executable-docs gate: the flagship tutorials run green end to end.

Mirrors the reference's notebook-as-test pattern
(`/root/reference/docs/examples/*.nb.py` run as integration tests of the
public API). Each tutorial is a plain `# %%`-cell Python file under
`docs/tutorials/`; running it IS the test.
"""

import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = pathlib.Path(__file__).parent.parent
TUTORIALS = sorted((REPO / "docs" / "tutorials").glob("*.py"))


@pytest.mark.parametrize("path", TUTORIALS, ids=lambda p: p.stem)
def test_tutorial_runs(path):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    proc = subprocess.run(
        [sys.executable, str(path)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, (
        f"{path.name} failed:\n--- stdout ---\n{proc.stdout[-2000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}"
    )
    assert "tutorial OK" in proc.stdout
