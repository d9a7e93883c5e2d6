"""Committed trunk-tet TPWL campaign artifacts (examples/trunk_tet/) stay
loadable and their closed-loop quality doesn't silently regress. The trunk
TPWL pipeline mirrors the reference's Trunk example
(/root/reference/examples/trunk/trunk.py:154-325: collect_TPWL_data +
run_scp/run_ilqr with 8 cables on the figure-8 target)."""

import json
import os
import pickle

import numpy as np
import pytest

ART_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "trunk_tet")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ART_DIR, "trunk_tpwl_campaign.json")),
    reason="trunk campaign artifacts not present")


def test_trunk_campaign_quality_gates():
    with open(os.path.join(ART_DIR, "trunk_tpwl_campaign.json")) as f:
        r = json.load(f)
    # committed run: GuSTO 14.16 mm, iLQR 10.48 mm on the +-15/7.5 mm
    # figure-8 — gates at ~1.3x so a regression trips before it doubles
    assert r["scp_rmse_mm"] < 18.0, r
    assert r["ilqr_rmse_mm"] < 14.0, r


@pytest.mark.parametrize("name", ["scp_fig8_sim.pkl", "ilqr_fig8_sim.pkl"])
def test_trunk_campaign_sims_loadable(name):
    p = os.path.join(ART_DIR, name)
    if not os.path.exists(p):
        pytest.skip(f"{name} not present")
    with open(p, "rb") as f:
        sim = pickle.load(f)
    z = np.asarray(sim["z"])
    t = np.asarray(sim["t"])
    assert z.shape[1] == 3 and len(t) == len(z)
    assert np.isfinite(z).all()
    # the trunk actually moved: figure-8 spans tens of mm in x
    assert np.ptp(z[:, 0]) > 10.0


def test_trunk_tpwl_dictionary_loads_discrete():
    from soft_robot_control_tpu.models.tpwl import from_tpwl_dict
    from soft_robot_control_tpu.sim.measurement import linearModel

    p = os.path.join(ART_DIR, "tpwl_model_snapshots.pkl")
    if not os.path.exists(p):
        pytest.skip("dictionary not present")
    Hf = linearModel([51], 709, vel=False).C_dense()
    model = from_tpwl_dict(p, params={"dist_weights": {"q": 10.0, "v": 1.0}},
                           Hf=Hf, discr_method="be")
    assert model.num_points >= 100
    assert model.A_d is not None


def test_trunk_ssm_mpc_gates():
    """The committed trunk SSM closed-loop result (BASELINE config 4,
    examples/trunk_ssm_campaign.py) tracks the tip circle well within the
    model ceiling and stays inside its training envelope."""
    p = os.path.join(ART_DIR, "trunk_ssm_mpc.json")
    if not os.path.exists(p):
        pytest.skip("trunk SSM MPC summary not present")
    with open(p) as f:
        r = json.load(f)
    assert r["tracking_rmse_mm"] < 8.0, r
    assert r["u_envelope_mN"] <= 300.0, r
