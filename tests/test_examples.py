"""The examples/ scripts are user-facing surface: each must run
end-to-end (tiny scale, CPU) without drifting from the current API."""

import importlib.util
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"example_{name}", os.path.join(EXAMPLES, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_poisson_solve_example(capsys):
    _load("poisson_solve").main(16)
    out = capsys.readouterr().out
    assert "PCG+IC0" in out


@pytest.mark.slow
def test_unstructured_solve_example(capsys):
    _load("unstructured_solve").main(16)
    out = capsys.readouterr().out
    assert "nonsymmetric BiCGStab+SGS: status=0" in out


def test_multigrid_solve_example(capsys, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["multigrid_solve.py", "33"])
    _load("multigrid_solve").main()
    out = capsys.readouterr().out
    assert "iterations" in out or "status" in out


@pytest.mark.slow
def test_distributed_solve_example(capsys, monkeypatch):
    monkeypatch.setattr(
        sys, "argv", ["distributed_solve.py", "--cpu", "8"]
    )
    mod = _load("distributed_solve")
    try:
        mod.main()
    except SystemExit as e:  # argparse may exit 0
        assert not e.code
    out = capsys.readouterr().out
    assert out.strip()


def test_df64_solve_example(capsys):
    _load("df64_solve").main(24)
    out = capsys.readouterr().out
    assert "cg_df64: status=SUCCESS" in out
    # the printed true residual must actually be at the 1e-10 bar
    line = [l for l in out.splitlines() if "true residual" in l][0]
    assert float(line.split(":")[1].strip()) < 1e-9


def test_accuracy_autopilot_example(capsys):
    _load("accuracy_autopilot").main(24)
    out = capsys.readouterr().out
    assert "floor_hit = " in out
    assert "DfSolveResult SUCCESS" in out


def test_poisson3d_1e8_example(capsys):
    _load("poisson3d_1e8").main(11)
    out = capsys.readouterr().out
    assert "SUCCESS" in out
