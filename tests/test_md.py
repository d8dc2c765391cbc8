"""MD-integration smoke test: velocity-Verlet NVE via the E3Calculator
(examples/md_dynamics.py, script parity with the reference torchMD.ipynb).
Asserts the integrator conserves total energy at the expected scale."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_md_nve_energy_conservation():
    from examples.calculator import E3Calculator
    from examples.md_dynamics import run_md

    calc = E3Calculator.from_config(
        "config_energy", node_capacity=32, edge_capacity=512,
    )
    rng = np.random.default_rng(0)
    n = 8
    Z = rng.choice([1, 6, 8], size=n, p=[0.5, 0.3, 0.2])
    pos = rng.normal(size=(n, 3)) * 2.0

    pos_f, e_traj = run_md(calc, Z, pos, dt_fs=0.05, n_steps=60, T=100.0,
                           steps_per_block=10, log=None)
    assert pos_f.shape == (n, 3)
    assert np.isfinite(e_traj).all()
    e_tot = e_traj.sum(axis=1)
    ke_scale = max(float(np.abs(e_traj[:, 1]).mean()), 1e-6)
    drift = abs(e_tot[-1] - e_tot[0])
    # small dt + smooth potential: drift well under the kinetic scale
    assert drift / ke_scale < 0.2, (drift, ke_scale, e_traj[:3], e_traj[-3:])
