"""Regression: the reference A/B harness (tools/ab_reference.py) stays green.

Runs a reduced configuration in a fresh subprocess (the harness patches torch
CUDA surfaces and sys.modules — isolation keeps that out of the test session)
and asserts score parity holds against the actual reference implementation."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ab_reference_parity_small():
    r = subprocess.run(
        [sys.executable, "tools/ab_reference.py", "--pairs", "16",
         "--batch", "8", "--bert-layers", "2", "--fusions", "concat,fcfm",
         "--backbones", "arcface", "--lstm-fusions", "linear",
         "--atol", "1e-3"],
        cwd=ROOT, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, f"tail:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    assert "A/B PARITY: PASS" in r.stdout
