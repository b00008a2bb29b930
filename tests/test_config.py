"""Options/CLI layer (petigaopts.c + IGASetFromOptions semantics) and
the runnable example programs (reference demo/ parity)."""

import sys

import numpy as np
import pytest

from petiga_tpu.config import Options, bind_cli


def test_options_build_and_freeze():
    opts = Options(dim=2, degree=(2, 3), elements=4, dtype="float64")
    sp = opts.build_space()
    assert sp.dim == 2
    assert tuple(sp.degrees) == (2, 3)
    assert tuple(sp.elem_shape) == (4, 4)
    # reject-after-setup (petiga.c:557)
    with pytest.raises(AttributeError):
        opts.dim = 3


def test_bind_cli_flags_and_extras():
    opts, ns = bind_cli(
        ["--dim", "2", "-p", "3", "-N", "5", "6", "--periodic", "1", "0",
         "--check-error", "1e-4"],
        extra=[("check-error", float, 0.0, "tolerance")],
    )
    sp = opts.build_space()
    assert tuple(sp.elem_shape) == (5, 6)
    assert tuple(ax.p for ax in sp.axes) == (3, 3)
    assert sp.axes[0].periodic and not sp.axes[1].periodic
    assert ns.check_error == pytest.approx(1e-4)


def _run_example(module, argv):
    sys.path.insert(0, "examples")
    try:
        mod = __import__(module)
        return mod.main(argv)
    finally:
        sys.path.pop(0)


def test_example_poisson():
    assert _run_example("poisson", ["--dim", "2", "-p", "2", "-N", "8",
                                    "--dtype", "float64",
                                    "--check-error", "1e-3"]) == 0


def test_example_bratu():
    assert _run_example("bratu", ["--dim", "2", "-p", "2", "-N", "6"]) == 0


def test_example_cahnhilliard(tmp_path):
    vts = tmp_path / "ch.vts"
    assert _run_example(
        "cahnhilliard",
        ["--nel", "8", "--nsteps", "1", "--vtk", str(vts)],
    ) == 0
    assert vts.exists() and vts.stat().st_size > 0


def test_example_elasticity():
    assert _run_example(
        "elasticity",
        ["--dim", "2", "-p", "2", "-N", "8", "--dtype", "float64",
         "--check-error", "1e-3"],
    ) == 0


def test_example_hyperelasticity():
    assert _run_example(
        "hyperelasticity",
        ["--dim", "2", "-p", "2", "-N", "4", "--dtype", "float64",
         "--material", "neo_hookean", "--stretch", "0.1"],
    ) == 0


def test_example_distributed(tmp_path):
    assert _run_example(
        "distributed",
        ["--dim", "2", "-p", "2", "-N", "8", "--dtype", "float64",
         "--solver", "cg", "--pc", "pbjacobi",
         "--checkpoint", str(tmp_path / "ck"), "--check-error", "1e-3"],
    ) == 0
