"""Packaging surface (reference setup.py): metadata parses and the package
set is complete, without invoking pip in the test run."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_setup_metadata():
    out = subprocess.run(
        [sys.executable, "setup.py", "--name", "--version"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    lines = out.stdout.strip().splitlines()
    assert lines[-2:] == ["gennerf_tpu", "0.1.0"]


def test_find_packages_covers_all_subpackages():
    from setuptools import find_packages

    found = set(find_packages(where=REPO, include=["gennerf_tpu", "gennerf_tpu.*"]))
    for sub in ["gennerf_tpu", "gennerf_tpu.models", "gennerf_tpu.ops",
                "gennerf_tpu.ops.pallas", "gennerf_tpu.parallel",
                "gennerf_tpu.train", "gennerf_tpu.data", "gennerf_tpu.eval",
                "gennerf_tpu.tsdf", "gennerf_tpu.utils", "gennerf_tpu.native",
                "gennerf_tpu.data.prepare"]:
        assert sub in found, f"{sub} missing from find_packages ({sorted(found)})"
