"""Round-trip the reference's SHIPPED binary artifacts.

Proves the claimed byte-compatible artifact layouts (docs/COMPONENT_MAP.md):
`examples/diamond/pod_model.pkl` (written by sofacontrol/mor/pod.py:137-141)
loads through our load_POD and projects/lifts correctly at the real Diamond
dimensions (n nodes=1628 -> q dim 4884, POD r=36), and
`examples/diamond/rest.pkl` (written by open_loop_controller.py:111-115)
carries the rest configuration consumed by the Diamond environment.
"""

import os
import pickle

import numpy as np
import pytest

POD_PKL = "/root/reference/examples/diamond/pod_model.pkl"
REST_PKL = "/root/reference/examples/diamond/rest.pkl"

needs_artifacts = pytest.mark.skipif(
    not (os.path.isfile(POD_PKL) and os.path.isfile(REST_PKL)),
    reason="reference artifacts not mounted")


@needs_artifacts
def test_load_reference_pod_model():
    from soft_robot_control_tpu.rom.pod import load_POD

    rom = load_POD(POD_PKL)
    # Diamond: 1628 nodes x 3 dof = 4884; campaign tol 5e-5 kept 36 modes
    assert rom.full_dim == 4884
    assert rom.rom_dim == 36
    U = np.asarray(rom.U)
    np.testing.assert_allclose(U.T @ U, np.eye(rom.rom_dim), atol=1e-12)

    # project->lift is identity on the column space (+x_ref affine shift)
    rng = np.random.default_rng(0)
    xr = rng.normal(size=rom.rom_dim)
    xf = rom.lift_q(xr)
    np.testing.assert_allclose(np.asarray(rom.project_q(xf)), xr, atol=1e-10)

    # full-state (x=[v;q], 9768-dim) block projection via V = I_2 (x) U
    x_full = np.asarray(rom.lift_x(np.concatenate([xr, 2 * xr])))
    assert x_full.shape == (9768,)
    np.testing.assert_allclose(
        np.asarray(rom.project_x(x_full)), np.concatenate([xr, 2 * xr]),
        atol=1e-10)

    # layout written by mor/pod.py:137-141: POD_info + config + Sigma
    with open(POD_PKL, "rb") as f:
        raw = pickle.load(f)
    assert raw["config"]["pod_type"] == "a"
    assert raw["config"]["pod_tolerance"] == 5e-5
    assert raw["Sigma"].ndim == 1
    # our get_info round-trips the POD_info sub-dict exactly
    info = rom.get_info()
    np.testing.assert_array_equal(info["U"], raw["POD_info"]["U"])
    np.testing.assert_array_equal(info["q_ref"], raw["POD_info"]["q_ref"])
    np.testing.assert_array_equal(info["v_ref"], raw["POD_info"]["v_ref"])
    assert info["type"] == "POD"


@needs_artifacts
def test_load_reference_rest_pkl():
    """rest.pkl layout (open_loop_controller.py:111-115): dt/t/z/u/rest."""
    from soft_robot_control_tpu.utils.io import load_data

    d = load_data(REST_PKL)
    assert d["dt"] == 0.01
    rest = np.asarray(d["rest"])
    assert rest.shape == (4884,)  # Diamond q at equilibrium
    assert np.isfinite(rest).all()
    # the POD reference state is an 'a'-type basis around a different
    # operating point; both live in the same 4884-dim node space
    with open(POD_PKL, "rb") as f:
        raw = pickle.load(f)
    assert raw["POD_info"]["q_ref"].shape == rest.shape
