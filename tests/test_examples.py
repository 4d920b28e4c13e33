"""Examples stay runnable: importability for all, tiny end-to-end runs for
the fast ones (subprocess, CPU backend, minimal sizes)."""

import importlib.util
import os
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
EXAMPLES = sorted(f for f in os.listdir(os.path.join(ROOT, "examples"))
                  if f.endswith(".py"))


def test_all_examples_parse():
    assert len(EXAMPLES) >= 7
    for f in EXAMPLES:
        path = os.path.join(ROOT, "examples", f)
        spec = importlib.util.spec_from_file_location(f[:-3], path)
        src = open(path).read()
        compile(src, path, "exec")          # syntax
        assert "def main" in src and "__main__" in src, f
        assert spec is not None


@pytest.mark.parametrize("args", [
    ["examples/run_md.py", "3", "60", "--cpu"],
    ["examples/run_fep.py", "3", "2", "60", "--cpu"],
    ["examples/run_solvated.py", "4", "3", "40", "--cpu"],
    ["examples/run_peptide_pdb.py", "40", "--cpu"],
])
def test_fast_examples_run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run([sys.executable] + args, cwd=ROOT, env=env,
                          capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
