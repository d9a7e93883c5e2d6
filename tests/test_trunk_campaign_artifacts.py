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
    # committed run (r5): GuSTO 0.72 mm / 0 plan rejects with moderate-gain
    # plan feedback, iLQR 2.0 mm, on the +-10/12.5 mm figure-8. Gates stay
    # at the round-3 levels (14.16/10.48 * ~1.3) so a regression to the old
    # behavior trips loudly while parameter-level jitter does not.
    assert r["scp_rmse_mm"] < 18.0, r
    assert r["ilqr_rmse_mm"] < 14.0, r
    # a "working" controller may not fly on stale rejected plans (round-4
    # failure mode: 246/500 rejects -> open-loop replay -> 60 mm RMSE)
    if "scp_plan_rejects" in r:
        assert r["scp_plan_rejects"] <= 50, r
    # tip excursions bounded by the task envelope (round-4 blow-up:
    # 258/230/348 mm spans on a 195 mm robot; the figure-8 itself spans
    # 20/25 mm in x/y, and z is uncontrolled but must stay small)
    if "scp_tip_span_mm" in r:
        sx, sy, sz = r["scp_tip_span_mm"]
        assert sx < 40.0 and sy < 40.0 and sz < 25.0, r
    # solve latency: gated against the reference's 300 ms workstation
    # budget (see test_campaign_artifacts.py for the labeling rationale);
    # the flown 20 ms cadence is declared alongside
    if r.get("scp_solve_ms_mean") is not None:
        assert r["scp_solve_ms_mean"] < 300.0, r
        assert "mpc_replan_budget_ms" in r, r


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
