"""Regression pins for the committed converged-run evidence.

CURRENT DEPLOYMENT STORY (read this first; VERDICT r4 items 2 & 7).
The file accumulates pins round by round; the sections below are in
chronological order, so the CURRENT flagships live near the END:

- backward-step (fixture v2), DEPLOYED flagship: the round-5 MERGED
  checkpoint ``runs/r5_bstep_ft2`` (gentle guarded spread-skill
  fine-tune FROM the 800-epoch depth resume): bpd -9.54, raw coverage
  0.369@0.50, raw TKE 1.099, spread 1.19 — quality and honest raw
  dispersion in one model. ``runs/r4_bstep_deeper`` stays pinned as
  the maximum-calibrated-TKE chain (1.64 via 1.96x inflation);
  ``runs/r4_bstep/eval_ft_redraw`` is the superseded r4 honest-raw
  lineage (still pinned as a guard).
- backward-step (fixture v3 — the DEFAULT), DEPLOYED flagship: the
  merged-from-depth ``runs/r5_v3_deep_ft`` (guarded fine-tune FROM
  the 800-epoch resume: bpd -7.76, raw coverage 0.423@0.50, tails
  0.73/0.84/0.90, raw TKE 1.20, spread 1.22, raw spectrum 0.036).
  ``runs/r5_v3_deeper`` stays pinned as the max-calibrated-TKE chain
  (1.52); ``runs/r5_v3_ft`` (merge from the 400-epoch source) is the
  superseded comparison point, still pinned.
- cylinder-array (fixture v2), DEPLOYED flagship: the 800-epoch depth
  resume ``runs/r4_cyl_deeper`` + its calibration chain (TKE
  calibrated 1.34, spectrum 0.218 vs bicubic 0.244). The round-5
  merge attempts are pinned as the measured boundary
  (``runs/r5_cyl_ft2``: first raw TKE >= 1.0 cylinder model, still
  sharp).
- cylinder-array (fixture v3): ``runs/r4_v3cyl`` — raw wins across
  the families.

Earlier sections (r2 converge, r3 train, r3 cylinder, the r3-model r4
pins) are HISTORICAL GUARDS: they pin superseded checkpoints so metric
definitions and artifact hygiene cannot silently drift; they do not
describe the deployed models.

The pins are BOUNDS (not exact equality): the committed JSON is the
fixed artifact being validated; bounds document what "converged and
skilful" means so a future re-run can be compared meaningfully.
"""

from __future__ import annotations

import csv
import json
import os
import pathlib

import pytest

RUN = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r2_converge"
METRICS = RUN / "eval" / "backward-step" / "eval_metrics.json"


def _require(path: pathlib.Path) -> None:
    """Missing artifacts FAIL the gate (VERDICT r2 item 6): deleting
    runs/ must not silently disable the entire convergence regression
    suite. Opt out only explicitly (e.g. a fresh clone that has not
    pulled LFS-ish artifacts) via TPUFLOW_ALLOW_MISSING_CONVERGED=1."""
    if path.exists():
        return
    if os.environ.get("TPUFLOW_ALLOW_MISSING_CONVERGED") == "1":
        pytest.skip(f"{path} missing (explicit opt-out set)")
    pytest.fail(
        f"converged-run artifact {path} is missing — the committed "
        "evidence is part of the repository contract; restore it or set "
        "TPUFLOW_ALLOW_MISSING_CONVERGED=1 to opt out explicitly"
    )


@pytest.fixture(scope="module")
def metrics() -> dict:
    _require(METRICS)
    return json.loads(METRICS.read_text())


def test_converged_nll(metrics):
    # Training plateaued below -8 bits/dim (val curve: -8.60 at epoch
    # 400, within noise of epochs 380-400); an untrained model scores
    # around +0.5.
    assert metrics["test_bpd"] < -8.0
    # NLL did not blow up late in the rollout either.
    assert metrics["test_bpd_last_step"] < -8.0


def test_model_beats_lf_baseline(metrics):
    # The multi-fidelity premise (arXiv:2006.04731 §1-2): the trained
    # model must beat bicubic LF upsampling on the same metric set.
    # Fixture v2's LF carries growing phase error, which bicubic cannot
    # correct — the model's field error stays less than HALF the
    # baseline's.
    assert metrics["field_skill_vs_baseline"] > 1.5
    assert metrics["vorticity_skill_vs_baseline"] > 1.5
    # Spectrum: model within 10% log rel-L2, baseline ~0.26 (spectral
    # truncation in the LF is unrecoverable by interpolation).
    assert metrics["spectrum_rel_l2"] < 0.15
    assert metrics["spectrum_rel_l2"] < metrics["baseline_spectrum_rel_l2"]


def test_field_errors(metrics):
    assert metrics["field_rel_l2_mean"] < 0.2
    assert metrics["vorticity_rel_l2_mean"] < 0.25
    # Incompressibility: predicted divergence RMS tracks the HF
    # reference's discretization level (ratio ~1, not 10x).
    assert 0.8 < metrics["divergence_rms_ratio"] < 1.25


def test_recalibrated_coverage(metrics):
    # Post-hoc recalibration (eval/calibrate.py) fitted on the
    # calibration split, evaluated on held-out steps: empirical
    # coverage within 0.06 of nominal at every level.
    cov = metrics["coverage_holdout_recalibrated"]
    for level, got in cov.items():
        assert abs(float(level) - got) < 0.06, (level, got)
    # And recalibration must not hurt CRPS.
    assert metrics["crps_holdout_recalibrated"] <= (
        metrics["crps_holdout_raw"] * 1.05
    )


# ---------------------------------------------------------------------------
# Round-3 converged run: healthy-clip training (grad_clip=1000), tau=0.85,
# converged 256-step variance references (eval.ref_steps), disjoint-split
# spread calibration. The round-3 contract (VERDICT r2 item 2): the model
# must BEAT the bicubic baseline on the second-moment statistics BASELINE
# config #4 names (TKE; Reynolds stress), holdout-scored.

RUN3 = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r3_train"
METRICS3 = RUN3 / "eval" / "backward-step" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics3() -> dict:
    _require(METRICS3)
    return json.loads(METRICS3.read_text())


def test_r3_converged_nll(metrics3):
    assert metrics3["test_bpd"] < -8.0
    assert metrics3["test_bpd_last_step"] < -8.0


def test_r3_second_moment_skill_beats_baseline(metrics3):
    # The committed values are 1.56 (scalar calibration) / 1.79
    # (per-location field) for TKE and 1.77 for Reynolds stress; the
    # pins leave regression headroom but keep "beats the baseline"
    # strict.
    assert metrics3["tke_skill_holdout_calibrated"] > 1.2
    assert metrics3["tke_skill_holdout_fieldcal"] > 1.2
    assert metrics3["reynolds_skill_holdout_calibrated"] > 1.2
    # Raw (uncalibrated) dispersion does NOT clear the bar (0.70 at
    # r3) — the calibrated numbers above are the deployment-honest
    # ones and the calibration layer is what closes the gap. If this
    # starts passing, tighten the calibrated pins instead.
    assert metrics3["tke_skill_holdout_raw"] < 1.0


def test_r3_fluctuation_pdf_documented_honestly(metrics3):
    # PDF-W1 vs the bicubic baseline, measured across every
    # calibration family (linear scalar/field, pooled and
    # streamwise-stratified quantile maps):
    #   u': quantile-map calibration reaches ~parity (0.98 skill).
    #   v': best is the linear calibrated 0.47 — the fixture draws
    #       per-trajectory flow parameters, so the v' marginal is
    #       non-stationary across trajectories and no global shape
    #       map fit on disjoint trajectories transfers (qmap 0.31,
    #       stratified 0.30 — both WORSE than linear). The
    #       trajectory-matched bicubic baseline is structurally
    #       advantaged on this metric; documented, not hidden.
    assert metrics3["pdf_w1_u_skill_holdout_qmap"] > 0.9
    assert metrics3["pdf_w1_u_skill_holdout_calibrated"] > 0.6
    assert metrics3["pdf_w1_v_skill_holdout_calibrated"] > 0.4
    # Absolute normalized-W1 stays small even while losing the ratio.
    assert metrics3["pdf_w1_u_holdout_calibrated"] < 0.12
    assert metrics3["pdf_w1_v_holdout_calibrated"] < 0.12


def test_r3_recalibrated_coverage(metrics3):
    cov = metrics3["coverage_holdout_recalibrated"]
    for level, got in cov.items():
        assert abs(float(level) - got) < 0.06, (level, got)
    assert metrics3["crps_holdout_recalibrated"] <= (
        metrics3["crps_holdout_raw"] * 1.05
    )


def test_r3_grad_clip_not_saturated():
    """The r2 run's clip=10 saturated 50-110x late in training (every
    update direction-only). The r3 preset (clip=1000) must keep late
    clipping rare — parsed from the committed supervisor log."""
    log = RUN3 / "supervisor.log"
    _require(log)
    norms = [
        float(part.split("=", 1)[1])
        for line in log.read_text().splitlines()
        for part in line.split()
        if part.startswith("grad_norm=")
    ]
    assert len(norms) > 200
    late = norms[int(len(norms) * 0.8):]
    frac_clipped = sum(n > 1000.0 for n in late) / len(late)
    assert frac_clipped < 0.25, frac_clipped


# ---------------------------------------------------------------------------
# Round-3 cylinder-array (BASELINE config #2): first converged eval
# evidence. The 96x96 v2 fixture is harder than backward-step — the
# model WINS field/vorticity/Reynolds/coverage and LOSES TKE and
# spectrum to bicubic; both facts are pinned so neither silently
# regresses nor silently flips without notice.

RUNC = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r3_cylinder"
METRICSC = RUNC / "eval64" / "cylinder-array" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_cyl() -> dict:
    _require(METRICSC)
    return json.loads(METRICSC.read_text())


def test_cylinder_converged_nll(metrics_cyl):
    assert metrics_cyl["test_bpd"] < -7.5
    assert metrics_cyl["test_bpd_last_step"] < -7.5


def test_cylinder_wins(metrics_cyl):
    assert metrics_cyl["field_skill_vs_baseline"] > 1.2
    assert metrics_cyl["vorticity_skill_vs_baseline"] > 1.0
    assert metrics_cyl["reynolds_skill_holdout_calibrated"] > 1.0
    # Recalibrated holdout coverage within 0.06 of nominal (measured
    # within 0.008 at every level).
    for level, got in metrics_cyl["coverage_holdout_recalibrated"].items():
        assert abs(float(level) - got) < 0.06, (level, got)
    # Streamfunction-exact reference: the normalized divergence (pred
    # div RMS / ref vorticity RMS) is the meaningful diagnostic.
    assert metrics_cyl["divergence_rms_normalized"] < 0.15


def test_cylinder_documented_losses(metrics_cyl):
    # Honest pins on the metrics the cylinder case LOSES to bicubic
    # (floors so further regression is caught; if either crosses 1.0,
    # promote to a win pin).
    assert 0.5 < metrics_cyl["tke_skill_holdout_calibrated"] < 1.0
    assert metrics_cyl["spectrum_rel_l2"] < 0.6
    assert metrics_cyl["pdf_w1_u_skill_holdout_qmap"] > 0.4
    assert metrics_cyl["pdf_w1_v_skill_holdout_qmap"] > 0.6
    # Quantile mapping must keep beating linear scaling on shape.
    assert (
        metrics_cyl["pdf_w1_u_skill_holdout_qmap"]
        > metrics_cyl["pdf_w1_u_skill_holdout_calibrated"]
    )


# ---------------------------------------------------------------------------
# Round-4: sample-path fine-tuning + calibration-layer upgrades.
# (1) Backward-step DISPERSION moved into the training loop (VERDICT r3
# item 2): the 10-epoch nets-scope spread-skill fine-tune from the r3
# checkpoint, evaluated at its learned per-scale tau with member
# overflow redraw — RAW ensemble statistics now clear the bar without
# post-hoc inflation. (2) Cylinder-array SPECTRUM beats bicubic under
# the deployed spectral-calibration chain (VERDICT r3 item 1), fit on
# the disjoint split and holdout-scored.

RUN4B = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r4_bstep"
METRICS4B = RUN4B / "eval_ft_redraw" / "backward-step" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics4b() -> dict:
    _require(METRICS4B)
    return json.loads(METRICS4B.read_text())


def test_r4_bstep_raw_dispersion_targets(metrics4b):
    # VERDICT r3 item 2 DoD, met RAW (no calibration layer):
    # coverage >= 0.35 at nominal 0.50 and TKE skill >= 1.0.
    assert metrics4b["coverage_holdout_raw"]["0.50"] >= 0.35
    assert metrics4b["tke_skill_holdout_raw"] >= 1.0
    # The fitted inflation is now ~1 (r3 needed 2.06) — the raw
    # ensemble is honest; pin the residual factor small.
    assert metrics4b["spread_scale"] < 1.3
    assert metrics4b["variance_scale_fit"] < 1.2


def test_r4_bstep_quality_held(metrics4b):
    # The dispersion fine-tune must not cost the deterministic side:
    # density improves, field/vorticity stay strongly above baseline,
    # spectrum stays matched, every trajectory finite at the full
    # 100-step stats horizon (the overflow-redraw guard's job).
    assert metrics4b["test_bpd"] < -9.0
    assert metrics4b["field_skill_vs_baseline"] > 1.5
    assert metrics4b["vorticity_skill_vs_baseline"] > 3.0
    assert metrics4b["spectrum_rel_l2"] < 0.15
    assert all(
        e == e for e in metrics4b["field_rel_l2_per_traj"]
    ), "NaN trajectory in the stats rollout (overflow guard regressed)"


RUN4C = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r4_cylinder"
METRICS4C = RUN4C / "eval64_speccal" / "cylinder-array" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics4c() -> dict:
    _require(METRICS4C)
    return json.loads(METRICS4C.read_text())


def test_r4_cylinder_spectrum_beats_baseline(metrics4c):
    # VERDICT r3 item 1 (spectrum half): under the deployed
    # spectral-calibration chain (filter fit on the disjoint split,
    # holdout-scored) the cylinder ensemble now BEATS bicubic on the
    # spectrum — the metric it lost 0.449 vs 0.250 at r3.
    assert metrics4c["spectrum_skill_holdout_speccal"] > 1.1
    assert (
        metrics4c["spectrum_rel_l2_holdout_speccal"]
        < metrics4c["baseline_spectrum_rel_l2_holdout"]
    )
    # And the chain helps, not hurts, the other second moments.
    assert metrics4c["reynolds_skill_holdout_speccal"] > 1.2


def test_r4_cylinder_tke_documented_loss(metrics4c):
    # HISTORICAL GUARD (superseded): on the r3 400-epoch checkpoint
    # the best deployed chain reached only 0.78 TKE skill, and five
    # SAMPLING-OBJECTIVE fine-tune configurations all hit the decoder's
    # latent-validity overflow boundary (docs/PARITY.md r4). What DID
    # fix it was depth: the 800-epoch resume reaches 1.34 calibrated
    # (test_r4_cylinder_800ep_meets_full_dod below — the current
    # story). This pin keeps the r3-checkpoint artifact honest: its
    # numbers must stay what they were, a loss.
    assert 0.6 < metrics4c["tke_skill_holdout_speccal"] < 1.0
    assert metrics4c["tke_skill_holdout_speccal"] >= (
        metrics4c["tke_skill_holdout_raw"]
    )


def test_training_curve_plateaued():
    val_log = RUN / "checkpoints" / "backward-step" / "val_log.csv"
    _require(val_log)
    rows = list(csv.DictReader(val_log.open()))
    assert len(rows) >= 20
    bpds = [float(r["val_bpd"]) for r in rows]
    # Converged: the final point is within 5% of the best, and the
    # last 10% of training recovered < 10% of the total drop (the
    # curve flattened; an earlier plateau at ~-7.4 broke again when
    # the lr decayed, so the midpoint is NOT flat — only the tail is).
    best = min(bpds)
    total_drop = bpds[0] - best
    tail_drop = bpds[int(len(bpds) * 0.9)] - best
    assert bpds[-1] <= best + 0.05 * abs(best)
    assert tail_drop < 0.10 * total_drop


# ---------------------------------------------------------------------------
# Round-4 fixture v3 (broadband k^-3 cascade HF; VERDICT r3 item 3):
# with realistic high-wavenumber content the spectrum metric measures
# turbulence rather than smoothness, and the generative ensemble beats
# bicubic on EVERY family — including RAW TKE with no calibration
# layer (the fine scales are genuinely unpredictable from LF, so
# ensemble spread is real conditional uncertainty).

RUNV3 = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r4_v3"
METRICSV3 = RUNV3 / "eval" / "backward-step" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_v3() -> dict:
    _require(METRICSV3)
    return json.loads(METRICSV3.read_text())


def test_v3_spectrum_discriminates_turbulence(metrics_v3):
    # Bicubic upsampling cannot create the cascade band: its raw
    # holdout spectrum error is ~0.67 while the flow reproduces the
    # broadband shape at ~0.05 (committed values; wide-margin pins).
    assert metrics_v3["spectrum_rel_l2_holdout_raw"] < 0.15
    assert metrics_v3["baseline_spectrum_rel_l2_holdout"] > 0.4
    assert metrics_v3["spectrum_rel_l2"] < 0.15


def test_v3_second_moments_beat_baseline_raw(metrics_v3):
    # RAW ensemble wins TKE (1.32 committed) — no post-hoc inflation.
    assert metrics_v3["tke_skill_holdout_raw"] > 1.1
    assert metrics_v3["reynolds_skill_holdout_calibrated"] > 1.1
    assert metrics_v3["pdf_w1_u_skill_holdout_qmap"] > 1.0
    assert metrics_v3["field_skill_vs_baseline"] > 1.8
    # Raw dispersion is healthier than v2's too (0.333 vs 0.21 at
    # nominal 0.50; fitted inflation 1.61 vs 2.06).
    assert metrics_v3["coverage_holdout_raw"]["0.50"] > 0.28
    assert metrics_v3["spread_scale"] < 1.8


def test_v3_training_stability_documented(metrics_v3):
    # v3 is genuinely harder: bpd converges near -6.8 (v2: -8.4), and
    # the r3 training preset NaN'd at epoch 81 — the committed run
    # used lr 5e-4 / grad_clip 100 (runs/r4_v3 supervisor evidence).
    assert -7.5 < metrics_v3["test_bpd"] < -6.0


# ---------------------------------------------------------------------------
# 64-step statistics window (VERDICT r3 item 4): the r3 verdict flagged
# that the headline TKE skill was pinned only at the favorable 32-step
# window. These pins state the whole window story as TESTED claims,
# across the three committed 64-step artifacts.

H64_R3 = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r3_horizon64"
H64_FT = RUN4B / "eval_ft_h64" / "backward-step" / "eval_metrics.json"
H64_V3 = RUNV3 / "eval_h64" / "backward-step" / "eval_metrics.json"
H64_CYL = RUN4C / "eval64_h64" / "cylinder-array" / "eval_metrics.json"


def test_h64_r3_model_holds_reynolds_and_pdf():
    """r3 model on fixture v2 at the 64-step window: Reynolds stress
    and u' PDF hold above/at baseline while TKE inverts (the v2
    phase-correlated LF lets bicubic's time-average converge) — the
    short-window TKE value proposition is a bounded, documented claim,
    not an unpinned assertion."""
    p = H64_R3 / "backward-step" / "eval_metrics.json"
    _require(p)
    m = json.loads(p.read_text())
    assert m["calibration_steps"] == 64
    assert m["reynolds_skill_holdout_calibrated"] > 1.2
    assert m["pdf_w1_u_skill_holdout_qmap"] >= 0.9
    assert m["tke_skill_holdout_calibrated"] < 1.0  # documented inversion


def test_h64_dispersion_is_window_robust():
    """The fine-tuned raw dispersion does not depend on the window:
    raw coverage at nominal 0.50 stays >= 0.35 at 64 steps too."""
    _require(H64_FT)
    m = json.loads(H64_FT.read_text())
    assert m["calibration_steps"] == 64
    assert m["coverage_holdout_raw"]["0.50"] >= 0.35


def test_h64_v3_advantage_persists():
    """On fixture v3 (stochastic fine scales — LF<->HF correlation
    decays with horizon by construction) the 64-step window no longer
    flips the story: spectrum stays a decisive win, Reynolds and the
    u' PDF stay above baseline, and RAW TKE stays at parity (0.97
    committed) instead of inverting to 0.58 as on v2. The v2
    inversion was substantially a fixture artifact, as diagnosed in
    r3 (docs/PARITY.md)."""
    _require(H64_V3)
    m = json.loads(H64_V3.read_text())
    assert m["calibration_steps"] == 64
    assert m["spectrum_rel_l2_holdout_raw"] < 0.15
    assert m["baseline_spectrum_rel_l2_holdout"] > 0.4
    assert m["reynolds_skill_holdout_calibrated"] > 1.0
    assert m["pdf_w1_u_skill_holdout_qmap"] > 1.2
    assert m["tke_skill_holdout_raw"] > 0.85


def test_h64_cylinder_spectral_chain_window_robust():
    """The deployed cylinder spectral-calibration chain keeps beating
    bicubic on the spectrum at the 64-step window."""
    _require(H64_CYL)
    m = json.loads(H64_CYL.read_text())
    assert m["calibration_steps"] == 64
    assert m["spectrum_skill_holdout_speccal"] > 1.1


# ---------------------------------------------------------------------------
# Round-4 v' calibration (VERDICT r3 item 6): the LF-conditioned
# self-calibrating quantile map (per-trajectory standardization +
# LF-regressed scale; deploys via quantile_map.npz l*/lalpha*, no
# reference data at serving time).

METRICS4R3 = RUN4B / "eval_r3model" / "backward-step" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics4r3() -> dict:
    _require(METRICS4R3)
    return json.loads(METRICS4R3.read_text())


def test_lf_conditioned_map_wins_where_scale_dominates(metrics4r3, metrics4c):
    # Cylinder v': per-trajectory SCALE non-stationarity is the
    # failure mode — the LF-conditioned map beats every prior family
    # (1.87 committed vs global qmap 0.88, linear 0.57).
    assert metrics4c["pdf_w1_v_skill_holdout_qmaplf"] > 1.5
    assert (
        metrics4c["pdf_w1_v_skill_holdout_qmaplf"]
        > metrics4c["pdf_w1_v_skill_holdout_qmap"]
    )
    # Backward-step u': new best (1.16 vs pooled 0.99).
    assert metrics4r3["pdf_w1_u_skill_holdout_qmaplf"] > 1.0


def test_v2_bstep_v_prime_boundary_documented(metrics4r3):
    # The measured boundary of item 6: on fixture v2's backward-step
    # the v' non-stationarity is SHAPE (mixture-proportion variation
    # per trajectory), which the scale covariate cannot fix — the
    # LF-conditioned map improves on the global map (0.33 vs 0.31)
    # but stays below the linear family (0.47). Documented, pinned as
    # floors so nothing silently regresses.
    assert metrics4r3["pdf_w1_v_skill_holdout_qmaplf"] > 0.25
    assert (
        metrics4r3["pdf_w1_v_skill_holdout_qmaplf"]
        >= metrics4r3["pdf_w1_v_skill_holdout_qmap"] * 0.95
    )


def test_v3_v_prime_meets_bar(metrics_v3):
    # On the realistic (v3) fixture the v' marginal is dominated by
    # the homogeneous cascade and the LINEAR calibrated family clears
    # the 0.8 bar (0.93 committed).
    assert metrics_v3["pdf_w1_v_skill_holdout_calibrated"] >= 0.8


# ---------------------------------------------------------------------------
# Round-4 fixture v3, cylinder-array: the r3 cylinder losses (TKE,
# spectrum) were substantially artifacts of the streamfunction-smooth
# v2 fixture — on the broadband-cascade fixture BOTH flip to wins.

RUNV3C = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r4_v3cyl"
METRICSV3C = RUNV3C / "eval64" / "cylinder-array" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_v3c() -> dict:
    _require(METRICSV3C)
    return json.loads(METRICSV3C.read_text())


def test_v3_cylinder_losses_flip_to_wins(metrics_v3c):
    # TKE: 0.76 (v2, documented loss) -> 1.66 calibrated on v3.
    assert metrics_v3c["tke_skill_holdout_calibrated"] > 1.3
    # Spectrum: raw ensemble 0.051 vs bicubic 0.622 (bicubic cannot
    # create the cascade band).
    assert metrics_v3c["spectrum_rel_l2_holdout_raw"] < 0.15
    assert metrics_v3c["baseline_spectrum_rel_l2_holdout"] > 0.4
    # And the rest of the families hold above baseline.
    assert metrics_v3c["reynolds_skill_holdout_calibrated"] > 1.0
    assert metrics_v3c["pdf_w1_u_skill_holdout_qmap"] > 1.3
    assert metrics_v3c["pdf_w1_v_skill_holdout_qmaplf"] > 1.5
    assert metrics_v3c["field_skill_vs_baseline"] > 1.3
    assert metrics_v3c["test_bpd"] < -6.5


# ---------------------------------------------------------------------------
# Round-4 FINAL cylinder-v2 result: the r3 cylinder was undertrained.
# Resumed to 800 epochs (runs/r4_cyl_deeper, deterministic resume from
# the committed r3 checkpoint), the VERDICT r3 item-1 DoD is met ON
# FIXTURE v2: spectrum <= bicubic under the deployed chain AND TKE
# calibrated > 1.0 at N=64.

RUNCD = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r4_cyl_deeper"
METRICSCD = RUNCD / "eval64" / "cylinder-array" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_cd() -> dict:
    _require(METRICSCD)
    return json.loads(METRICSCD.read_text())


def test_r4_cylinder_800ep_meets_full_dod(metrics_cd):
    # Both halves of the r3 item-1 DoD, on fixture v2, N=64:
    assert metrics_cd["tke_skill_holdout_calibrated"] > 1.0
    assert (
        metrics_cd["spectrum_rel_l2_holdout_speccal"]
        < metrics_cd["baseline_spectrum_rel_l2_holdout"]
    )
    # Committed values 1.34 / (0.218 vs 0.244); regression headroom.
    assert metrics_cd["tke_skill_holdout_calibrated"] > 1.2
    assert metrics_cd["spectrum_skill_holdout_speccal"] > 1.05


def test_r4_cylinder_800ep_across_the_board(metrics_cd):
    assert metrics_cd["test_bpd"] < -8.8
    assert metrics_cd["field_skill_vs_baseline"] > 1.8
    assert metrics_cd["vorticity_skill_vs_baseline"] > 1.5
    assert metrics_cd["reynolds_skill_holdout_calibrated"] > 1.0
    assert metrics_cd["pdf_w1_u_skill_holdout_qmap"] > 1.1
    assert metrics_cd["pdf_w1_v_skill_holdout_qmaplf"] > 1.5


# ---------------------------------------------------------------------------
# Round-4 FINAL backward-step depth result (pinned in round 5 — VERDICT
# r4 item 2): the 400->800 epoch deterministic resume of the committed
# r3 checkpoint (runs/r4_bstep_deeper, on-chip, no restarts, bpd
# -8.42 -> -9.36). These are the repo's best backward-step QUALITY
# numbers: TKE calibrated 1.64 (r3: 1.56), field skill 2.31, vorticity
# 5.03, spectrum 0.038. The honest trade-off is pinned too: depth
# REGRESSED raw dispersion (coverage 0.245@0.50 vs the fine-tuned
# model's 0.406; fitted inflation back to ~1.96 vs 1.10) — which is
# why round 5 runs the spread-skill fine-tune FROM this checkpoint
# (runs/r5_bstep_ft) to put both wins in one model.

RUNBD = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r4_bstep_deeper"
METRICSBD = RUNBD / "eval" / "backward-step" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_bd() -> dict:
    _require(METRICSBD)
    return json.loads(METRICSBD.read_text())


def test_r4_bstep_800ep_quality_flagship(metrics_bd):
    # Best committed backward-step density + deterministic skill.
    assert metrics_bd["test_bpd"] < -9.2
    assert metrics_bd["tke_skill_holdout_calibrated"] > 1.5
    assert metrics_bd["field_skill_vs_baseline"] > 2.0
    assert metrics_bd["vorticity_skill_vs_baseline"] > 4.0
    assert metrics_bd["spectrum_rel_l2"] < 0.06
    assert metrics_bd["reynolds_skill_holdout_calibrated"] > 1.4


def test_r4_bstep_800ep_raw_dispersion_regression_documented(metrics_bd):
    # The depth resume trades raw dispersion for quality: the raw
    # ensemble is ~2x underdispersed again (the r3 disease the
    # fine-tune cured). Pinned as a CEILING so the regression cannot
    # be silently mistaken for health; if a future checkpoint passes
    # the fine-tuned model's floors (>= 0.35 raw coverage, spread
    # < 1.3) pin it in the round-5 section instead.
    assert metrics_bd["coverage_holdout_raw"]["0.50"] < 0.35
    assert metrics_bd["spread_scale"] > 1.5
    # Recalibration still repairs coverage on the holdout.
    cov = metrics_bd["coverage_holdout_recalibrated"]
    for level, got in cov.items():
        assert abs(float(level) - got) < 0.06, (level, got)


# ---------------------------------------------------------------------------
# ROUND 5: the merged flagship on the DEFAULT fixture (v3). The
# spread-skill fine-tune (tpuflow-finetune, 10 epochs, nets scope,
# lr 3e-5, lambda_disp 0.5 / crps 0.3 / spec 0.02, guarded) run FROM
# the converged v3 checkpoint produces ONE checkpoint that holds BOTH
# the quality and the honest-raw-dispersion wins (VERDICT r4 items 1
# and 4, on the fixture that is now the default):
#   bpd -6.9 -> -7.47 (improved), raw TKE skill 1.28, raw coverage
#   0.404@0.50 with tails 0.717/0.837/0.903 (source: 0.58/0.69/0.76),
#   fitted inflation 1.34 (source 1.61), raw spectrum 0.046 vs bicubic
#   0.671, Reynolds 1.53, field 2.13.

RUN5V3 = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r5_v3_ft"
METRICS5V3 = RUN5V3 / "eval" / "backward-step" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_r5v3() -> dict:
    _require(METRICS5V3)
    return json.loads(METRICS5V3.read_text())


def test_r5_v3_merged_flagship_dispersion_dod(metrics_r5v3):
    # The r4 item-1 DoD, met RAW in one checkpoint on the default
    # fixture: coverage >= 0.35 at nominal 0.50 AND raw TKE skill
    # >= 1.0, with the fine-tune IMPROVING density.
    cov = metrics_r5v3["coverage_holdout_raw"]
    assert cov["0.50"] >= 0.35
    assert metrics_r5v3["tke_skill_holdout_raw"] >= 1.1
    assert metrics_r5v3["test_bpd"] < -7.3
    assert metrics_r5v3["spread_scale"] < 1.5


def test_r5_v3_merged_flagship_tail_coverage(metrics_r5v3):
    # VERDICT r4 item 4: the dispersion DoD extended to the TAILS on
    # the default fixture (committed 0.717/0.837/0.903; floors with
    # regression headroom).
    cov = metrics_r5v3["coverage_holdout_raw"]
    assert cov["0.80"] >= 0.65
    assert cov["0.90"] >= 0.78
    assert cov["0.95"] >= 0.85


def test_r5_v3_merged_flagship_quality_held(metrics_r5v3):
    # The dispersion work must not cost the deterministic families.
    assert metrics_r5v3["field_skill_vs_baseline"] > 1.8
    assert metrics_r5v3["spectrum_rel_l2_holdout_raw"] < 0.1
    assert metrics_r5v3["baseline_spectrum_rel_l2_holdout"] > 0.4
    assert metrics_r5v3["reynolds_skill_holdout_calibrated"] > 1.2
    assert all(
        e == e for e in metrics_r5v3["field_rel_l2_per_traj"]
    ), "NaN trajectory in the stats rollout"


# ---------------------------------------------------------------------------
# ROUND 5: the v2 backward-step MERGE (VERDICT r4 item 1). Three
# measured attempts from the 800-epoch depth checkpoint:
#   (a) the exact r4 recipe ungated (lr 3e-5) ran 6 healthy epochs
#       then collapsed bpd -9.6 -> -2.4 with 61/64 windows skipped
#       (runs/r5_bstep_ft/finetune_log_attempt1_diverged.csv) —
#       motivating the overflow guard;
#   (b) guarded 3e-5 (epoch-3 rollback, runs/r5_bstep_ft): honest
#       dispersion (raw cov 0.395, spread 1.00, bpd -9.54) but raw
#       TKE collapsed to 0.48;
#   (c) gentle guarded 1e-5 x 16 epochs, skip budget 0.2 (epoch-7
#       save, runs/r5_bstep_ft2): the DEPLOYED v2 flagship — raw
#       coverage 0.369@0.50 (tails 0.655/0.782/0.859), raw TKE skill
#       1.099, spread 1.19, bpd -9.54, field 2.07, spectrum 0.067.
# Measured closure of the item-1 "calibrated TKE >= 1.64" clause: the
# 1.64 belonged to the SHARP model + 1.96x post-hoc inflation; the
# merged model's honest-raw chain tops out at ~1.1 raw / 0.95
# calibrated. One checkpoint now holds quality AND honest dispersion;
# the inflated-sharp chain remains available from r4_bstep_deeper.

RUN5B2 = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r5_bstep_ft2"
METRICS5B2 = RUN5B2 / "eval" / "backward-step" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_r5b2() -> dict:
    _require(METRICS5B2)
    return json.loads(METRICS5B2.read_text())


def test_r5_v2_merged_flagship_raw_dod(metrics_r5b2):
    # Raw dispersion DoD from the 800-epoch checkpoint, in ONE model:
    cov = metrics_r5b2["coverage_holdout_raw"]
    assert cov["0.50"] >= 0.35
    assert metrics_r5b2["tke_skill_holdout_raw"] >= 1.0
    assert metrics_r5b2["spread_scale"] < 1.3
    # Quality held at the depth level (source bpd -9.36).
    assert metrics_r5b2["test_bpd"] < -9.4
    assert metrics_r5b2["field_skill_vs_baseline"] > 1.8
    assert metrics_r5b2["spectrum_rel_l2"] < 0.1


def test_r5_v2_merged_flagship_tail_coverage(metrics_r5b2):
    # VERDICT r4 item 4 tails, on the merged v2 model (committed
    # 0.655/0.782/0.859; floors with headroom).
    cov = metrics_r5b2["coverage_holdout_raw"]
    assert cov["0.80"] >= 0.60
    assert cov["0.90"] >= 0.72
    assert cov["0.95"] >= 0.80


def test_r5_v2_merge_tradeoff_documented(metrics_r5b2, metrics_bd):
    # The honest closure: merging costs the CALIBRATED TKE headline —
    # the sharp source + 1.96x inflation scores 1.64, the merged
    # model's fit tops out below 1.0 (its variance is already honest,
    # so inflation has nothing left to fix). Pinned so the trade-off
    # stays measured, not asserted.
    assert metrics_r5b2["tke_skill_holdout_calibrated"] < 1.2
    assert metrics_bd["tke_skill_holdout_calibrated"] > 1.5
    # And the merged model's raw beats the source's raw decisively.
    assert (
        metrics_r5b2["tke_skill_holdout_raw"]
        > metrics_bd["tke_skill_holdout_raw"] + 0.2
    )


# ---------------------------------------------------------------------------
# ROUND 5: cylinder v2 merge — the measured boundary. Three attempts
# from the 800-epoch checkpoint (docs/PARITY.md round-5 merge
# results): the guarded r4 recipe traded dispersion for raw TKE; the
# dispersion-only variant collapsed at epoch 2 (without the spectral
# anchor the widening direction exits decode validity immediately).
# The epoch-1 dispersion-only save (runs/r5_cyl_ft2) is the committed
# raw-TKE data point: the first cylinder model with raw TKE skill
# >= 1.0 (1.018; speccal 1.055 and speccal spectrum 1.154 — still
# beating bicubic) — while its dispersion stays sharp (0.230@0.50) and
# the per-level interval chain repairs coverage post hoc
# (0.49/0.78/0.89/0.94 vs nominal 0.50/0.80/0.90/0.95). The DEPLOYED
# cylinder v2 flagship remains runs/r4_cyl_deeper + its calibration
# chain (TKE calibrated 1.34, spectrum win, recalibrated coverage).

RUN5C2 = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r5_cyl_ft2"
METRICS5C2 = RUN5C2 / "eval64" / "cylinder-array" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_r5c2() -> dict:
    _require(METRICS5C2)
    return json.loads(METRICS5C2.read_text())


def test_r5_cylinder_raw_tke_data_point(metrics_r5c2):
    # First cylinder checkpoint to clear raw TKE parity — pinned with
    # the spectral chain still winning on top of it.
    assert metrics_r5c2["tke_skill_holdout_raw"] >= 1.0
    assert metrics_r5c2["tke_skill_holdout_speccal"] >= 1.0
    assert metrics_r5c2["spectrum_skill_holdout_speccal"] > 1.05
    assert metrics_r5c2["test_bpd"] < -9.0
    assert metrics_r5c2["field_skill_vs_baseline"] > 1.8


def test_r5_cylinder_merge_boundary_documented(metrics_r5c2):
    # The honest boundary: this model's raw dispersion did NOT merge
    # (sharp; the per-level chain is the coverage repair). Ceiling
    # pins so the boundary stays measured.
    assert metrics_r5c2["coverage_holdout_raw"]["0.50"] < 0.35
    assert metrics_r5c2["spread_scale"] > 2.5
    cov = metrics_r5c2["coverage_holdout_per_level"]
    for level, got in cov.items():
        assert abs(float(level) - got) < 0.08, (level, got)


# ---------------------------------------------------------------------------
# ROUND 5: v3 depth result — the 400->800 epoch deterministic resume
# on the DEFAULT fixture (runs/r5_v3_deeper; supervisor exit 0, no
# restarts): depth keeps paying on v3, and WITHOUT the v2-style raw
# dispersion collapse (bpd -6.9 -> -7.56, raw TKE 1.34, calibrated
# 1.52, raw coverage 0.377@0.50, spread 1.51, field 2.58, raw
# spectrum 0.041 vs bicubic 0.671, Reynolds 1.34, u' LF-conditioned
# 2.05).

RUN5VD = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r5_v3_deeper"
METRICS5VD = RUN5VD / "eval" / "backward-step" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_r5vd() -> dict:
    _require(METRICS5VD)
    return json.loads(METRICS5VD.read_text())


def test_r5_v3_deeper_across_the_board(metrics_r5vd):
    assert metrics_r5vd["test_bpd"] < -7.4
    assert metrics_r5vd["tke_skill_holdout_raw"] > 1.2
    assert metrics_r5vd["tke_skill_holdout_calibrated"] > 1.3
    assert metrics_r5vd["field_skill_vs_baseline"] > 2.2
    assert metrics_r5vd["spectrum_rel_l2_holdout_raw"] < 0.08
    assert metrics_r5vd["reynolds_skill_holdout_calibrated"] > 1.2
    assert metrics_r5vd["pdf_w1_u_skill_holdout_qmaplf"] > 1.5


def test_r5_v3_deeper_dispersion_does_not_collapse(metrics_r5vd):
    # The v2 depth resume regressed raw coverage to 0.245; on v3 the
    # same +400 epochs KEEPS honest dispersion above the DoD floor —
    # the collapse was a fixture property (v2's phase-correlated LF
    # rewards oversharpening), not a depth inevitability.
    assert metrics_r5vd["coverage_holdout_raw"]["0.50"] >= 0.35
    assert metrics_r5vd["spread_scale"] < 1.7


# ---------------------------------------------------------------------------
# ROUND 5: cylinder v3 depth probe (runs/r5_v3cyl_deeper, 400->800
# deterministic resume, exit 0) — a measured ASYMMETRY, pinned: depth
# improves density and keeps the spectrum win on cylinder-v3 (bpd
# -6.8 -> -7.45, raw spectrum 0.040 vs bicubic 0.614, u' qmap 1.10,
# v' LF-conditioned 2.10) but OVERSHARPENS the ensemble — raw
# coverage 0.216@0.50 (400ep-model healthy), spread 3.48, TKE
# calibrated 1.35 vs the 400-epoch model's 1.66. Depth trades
# dispersion for sharpness on cylinder on BOTH fixtures, while
# backward-step-v3 depth was dispersion-free; the DEPLOYED cylinder-v3
# flagship therefore remains the 400-epoch runs/r4_v3cyl.

RUN5CD = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r5_v3cyl_deeper"
METRICS5CD = RUN5CD / "eval64" / "cylinder-array" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_r5cd() -> dict:
    _require(METRICS5CD)
    return json.loads(METRICS5CD.read_text())


def test_r5_v3cyl_deeper_gains(metrics_r5cd):
    assert metrics_r5cd["test_bpd"] < -7.3
    assert metrics_r5cd["spectrum_rel_l2_holdout_raw"] < 0.08
    assert metrics_r5cd["baseline_spectrum_rel_l2_holdout"] > 0.4
    assert metrics_r5cd["tke_skill_holdout_calibrated"] > 1.2
    assert metrics_r5cd["pdf_w1_v_skill_holdout_qmaplf"] > 1.5


def test_r5_v3cyl_deeper_oversharpening_documented(metrics_r5cd, metrics_v3c):
    # Ceiling pins for the honest regression vs the deployed 400-epoch
    # model: if a future change makes these pass the 400ep floors,
    # re-examine the deployment naming.
    assert metrics_r5cd["coverage_holdout_raw"]["0.50"] < 0.3
    assert metrics_r5cd["spread_scale"] > 2.5
    assert (
        metrics_r5cd["tke_skill_holdout_calibrated"]
        < metrics_v3c["tke_skill_holdout_calibrated"]
    )


# ---------------------------------------------------------------------------
# ROUND 5 FINAL: the v3 DEPLOYED FLAGSHIP — guarded gentle fine-tune
# (lr 1e-5, 16 epochs, skip budget 0.2, nets scope) run FROM the
# 800-epoch v3 checkpoint (runs/r5_v3_deeper -> runs/r5_v3_deep_ft).
# This is the last untried depth+dispersion combination and it
# DOMINATES the earlier merge from the 400-epoch checkpoint
# (runs/r5_v3_ft) on density, tails, field skill and spectrum:
#   bpd -7.56 -> -7.76 (fine-tune IMPROVES density again),
#   raw coverage 0.377 -> 0.423@0.50,
#   tails 0.63/0.74/0.81 -> 0.728/0.842/0.903,
#   spread 1.51 -> 1.22, field 2.44, vorticity 2.99,
#   raw spectrum 0.036 vs bicubic 0.671,
# with a small sharpness trade (raw TKE 1.34 -> 1.20, calibrated
# 1.52 -> 1.18) that stays above every DoD floor. One checkpoint on
# the DEFAULT fixture now holds the depth-quality wins AND honest raw
# dispersion — the r4 VERDICT's definition of done, in its strongest
# form. runs/r5_v3_deeper stays committed as the max-calibrated-TKE
# chain (1.52); runs/r5_v3_ft is superseded but remains pinned above
# as the measured 400-epoch-source comparison point.

RUN5VDF = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r5_v3_deep_ft"
METRICS5VDF = RUN5VDF / "eval" / "backward-step" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_r5vdf() -> dict:
    _require(METRICS5VDF)
    return json.loads(METRICS5VDF.read_text())


def test_r5_v3_deployed_flagship_full_dod(metrics_r5vdf):
    # Every clause of the r4 item-1 DoD, raw, in one checkpoint on the
    # default fixture.
    cov = metrics_r5vdf["coverage_holdout_raw"]
    assert cov["0.50"] >= 0.38
    assert metrics_r5vdf["tke_skill_holdout_raw"] >= 1.1
    assert metrics_r5vdf["spread_scale"] < 1.35
    assert metrics_r5vdf["test_bpd"] < -7.6
    assert metrics_r5vdf["field_skill_vs_baseline"] > 2.2
    assert metrics_r5vdf["vorticity_skill_vs_baseline"] > 2.5
    assert metrics_r5vdf["spectrum_rel_l2_holdout_raw"] < 0.05
    assert metrics_r5vdf["baseline_spectrum_rel_l2_holdout"] > 0.4


def test_r5_v3_deployed_flagship_tail_coverage(metrics_r5vdf):
    # Item-4 tails at their strongest committed values (floors with
    # regression headroom: committed 0.728/0.842/0.903).
    cov = metrics_r5vdf["coverage_holdout_raw"]
    assert cov["0.80"] >= 0.67
    assert cov["0.90"] >= 0.79
    assert cov["0.95"] >= 0.86


def test_r5_v3_deployed_flagship_dominates_400ep_merge(metrics_r5vdf, metrics_r5v3):
    # The deployment-naming justification, as an executable claim:
    # merging from depth beats merging from the 400-epoch source on
    # density, median coverage and field skill simultaneously.
    assert metrics_r5vdf["test_bpd"] < metrics_r5v3["test_bpd"]
    assert (
        metrics_r5vdf["coverage_holdout_raw"]["0.50"]
        >= metrics_r5v3["coverage_holdout_raw"]["0.50"]
    )
    assert (
        metrics_r5vdf["field_skill_vs_baseline"]
        > metrics_r5v3["field_skill_vs_baseline"]
    )


# ---------------------------------------------------------------------------
# ROUND 5: the C=128 width co-design QUALITY leg (docs/PERF_NOTES.md
# width section; runs/r5_c128 — converged 400-epoch run on the default
# v3 fixture with the identical schedule/preset as the C=64 run
# runs/r4_v3, supervisor exit 0). Measured closure: width is near-free
# in throughput on BOTH paths (rollout +0.3%, train 13.41 vs 13.88
# windows/s) and buys density (-0.25 bpd at equal schedule), but the
# physics-skill families do not move — data-limited, not
# capacity-limited, at this fixture size. C=64 stays the shipped
# default; coupling_width=128 is the supported perf-free density
# option.

RUN5C128 = pathlib.Path(__file__).resolve().parent.parent / "runs" / "r5_c128"
METRICS5C128 = RUN5C128 / "eval" / "backward-step" / "eval_metrics.json"


@pytest.fixture(scope="module")
def metrics_r5c128() -> dict:
    _require(METRICS5C128)
    return json.loads(METRICS5C128.read_text())


def test_r5_c128_density_win(metrics_r5c128, metrics_v3):
    # The capacity buys held-out density at equal schedule.
    assert metrics_r5c128["test_bpd"] < -6.95
    assert metrics_r5c128["test_bpd"] < metrics_v3["test_bpd"] - 0.15


def test_r5_c128_skills_hold_but_do_not_improve(metrics_r5c128, metrics_v3):
    # The honest half of the decision: skills stay in the healthy band
    # (all beating bicubic) but do NOT beat the C=64 run — the reason
    # C=64 remains the shipped default.
    assert metrics_r5c128["tke_skill_holdout_raw"] > 1.1
    assert metrics_r5c128["field_skill_vs_baseline"] > 2.0
    assert metrics_r5c128["spectrum_rel_l2_holdout_raw"] < 0.06
    assert (
        metrics_r5c128["tke_skill_holdout_raw"]
        < metrics_v3["tke_skill_holdout_raw"]
    )
