"""The examples/ scripts: all compile; the serving journey runs e2e."""

import glob
import py_compile

import pytest


def test_examples_compile():
    files = glob.glob("examples/*.py")
    assert len(files) >= 4
    for f in files:
        py_compile.compile(f, doraise=True)


@pytest.mark.slow
def test_serve_example_runs(tmp_path, monkeypatch):
    import runpy
    import sys

    monkeypatch.setattr(sys, "argv", ["serve_from_checkpoint.py"])
    runpy.run_path("examples/serve_from_checkpoint.py",
                   run_name="__main__")
