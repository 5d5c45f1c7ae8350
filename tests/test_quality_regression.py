"""Converged-quality regression pins (VERDICT r3 #3).

The committed artifacts in eval_out/quality/ (produced by
tools/quality_runs.py, fixed seeds, 8-device CPU mesh through the
production shard_map step) are each family's reachable-quality evidence.
These tests pin them: a family whose artifact is silently dropped, whose
metadata drifts, or whose recorded quality regresses below the pinned
floor fails CI. Regenerate artifacts with `python tools/quality_runs.py`
after intentional changes and re-pin consciously.

Thresholds carry margin over the 2026-08-20 measured values (see
docs/QUALITY.md for the measured numbers and their reading).
"""
import json
import os

import pytest

QDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "eval_out", "quality")


def _load(name):
    path = os.path.join(QDIR, f"{name}.json")
    if not os.path.exists(path):
        pytest.fail(f"missing committed quality artifact {path} — "
                    "run tools/quality_runs.py")
    with open(path) as f:
        return json.load(f)


def test_unet_vs_hdit_artifact():
    d = _load("unet_vs_hdit")
    s = d["summary"]
    assert d["steps"] == 800 and d["batch"] == 64
    # U-Net: converged at the equal budget (measured floor 0.135, sep 3.24)
    assert s["unet_loss_floor"] < 0.25
    assert s["unet_rk4_50"]["separation"] > 2.2
    assert s["unet_rk4_50"]["center_abs_err"] < 0.4
    # HDiT: lags conditioning at equal budget, matches at ~3× (measured
    # converged sep 2.995, center err 0.032)
    assert s["hdit_rk4_50_converged"]["separation"] > 2.2
    assert s["hdit_rk4_50_converged"]["center_abs_err"] < 0.3
    assert "hdit_rk4_50_equal_budget" in s
    # both sinkhorns read against the committed data-vs-data baseline
    base = s["data_vs_data_sinkhorn"]
    assert s["unet_rk4_50"]["sinkhorn_latent"] < 12 * max(base, 1.0)
    assert s["hdit_rk4_50_converged"]["sinkhorn_latent"] < 12 * max(base,
                                                                    1.0)


def test_meanflow_artifact():
    d = _load("meanflow")
    s = d["summary"]
    # 1-NFE MeanFlow matches guided RK4-50 conditional control (measured
    # sep 2.888, center err 0.056) at ONE model eval
    mf = s["meanflow_1nfe"]
    assert mf["nfe"] == 1
    assert mf["separation"] > 2.2
    assert mf["center_abs_err"] < 0.3
    assert s["flow_loss_floor"] < 0.25
    assert s["rk4_50"]["separation"] > 2.2


def test_reflow_artifact():
    d = _load("reflow")
    s = d["summary"]
    # reflow euler-5 (4 NFE) holds conditional control and does not lose
    # distributionally to the base model's euler-5 (measured: it wins)
    r = s["reflow_euler5"]
    assert r["nfe"] == 4
    assert r["separation"] > 2.2
    assert r["center_abs_err"] < 0.4
    assert r["sinkhorn_latent"] <= 1.25 * s["base_euler5"]["sinkhorn_latent"]
    assert s["reflow_loss_floor"] < 0.1  # paired targets → tiny floor


def test_audio_artifact():
    d = _load("audio")
    s = d["summary"]
    # clean convergence: total less than half the first step's loss,
    # mel floor well under its start (measured 27.8 -> ~10, mel -> ~1.5)
    assert s["total_loss_floor"] < 0.55 * s["first_loss"]
    assert s["mel_loss_floor"] < 2.5
    assert s["recon_components"]["vq"] < 0.05
    # adversarial phase (round 5): trains STABLY — hinge d_loss well under
    # its 2.0 untrained value, feature matching small, waveform L1 not
    # regressed — while SNR/mel move within the documented adversarial
    # trade band (measured −0.23 dB / +0.16 mel: realism-for-alignment,
    # the known DAC/HiFi-GAN behavior at probe capacity; docs/QUALITY.md)
    g = s["gan_components"]
    assert g["d_loss"] < 1.5
    assert g["feat"] < 1.0
    assert g["wave_l1"] <= 1.15 * s["recon_components"]["wave_l1"]
    assert abs(s["snr_gain_db"]) < 3.0
    assert s["gan_mel"] < 2.5


def test_image_gate_artifact():
    """The image-grade quality gate (VERDICT r4 #1): tpu_demo pipeline at
    CPU scale, pixel metrics. Pins carry margin over the 2026-08-21
    measured values (docs/QUALITY.md image section)."""
    d = _load("image")
    s = d["summary"]
    assert d["steps"] == 800 and d["batch"] == 64
    # noise floors committed for reading every row against
    assert s["fid_data_vs_data"] < 5
    assert s["sinkhorn_data_vs_data"] < 10
    # base U-Net: perfect conditional control (measured 1.0), FID far off
    # the untrained ~194 (measured 140.6), latent Sinkhorn well under the
    # untrained ~1190 (measured 15.8)
    u = s["unet_rk4_50"]
    assert u["color_acc"] > 0.9
    assert u["fid_px"] < 170
    assert u["sinkhorn_latent"] < 15 * max(s["sinkhorn_data_vs_data"], 1.0)
    # MeanFlow 1-NFE matches the guided 196-NFE baseline at image scale
    # (measured: FID 140.8 vs 140.6, color acc 1.0 both)
    mf = s["meanflow_1nfe"]
    assert mf["nfe"] == 1
    assert mf["color_acc"] > 0.9
    assert mf["fid_px"] < 1.25 * u["fid_px"]
    # few-step serving: base Euler-5 holds quality (OT-straightened
    # flows), reflow stays within range of it (measured finding: reflow
    # adds distillation error when the base is already straight)
    b5 = s["base_euler5"]
    r5 = s["reflow_euler5"]
    assert b5["color_acc"] > 0.9 and r5["color_acc"] > 0.9
    assert b5["fid_px"] < 1.25 * u["fid_px"]
    assert r5["fid_px"] < 1.4 * b5["fid_px"]
    # HDiT: conditioning-uptake lag replicates at image scale (measured
    # color acc 0.781 @ equal budget -> 1.0 @ 3x; converged FID 109.6 is
    # the best of all families)
    h = s["hdit_rk4_50_converged"]
    assert h["color_acc"] > 0.9
    assert h["fid_px"] < 1.1 * u["fid_px"]
    assert "hdit_rk4_50_equal_budget" in s


def test_pod_recipe_artifact():
    d = _load("pod")
    s = d["summary"]
    # 320 steps through train_flow.py on the data=2 x model=4 mesh with
    # EP+PP live: loss 4.0 -> ~1.0 monotone to the schedule's floor at
    # this budget (full convergence is a TPU-scale run — docs/QUALITY.md)
    assert s["steps"] >= 300
    assert s["final_eval_loss"] < 1.2
    # serving twin sampled finite latents from the trained params
    q = s["rk4_25"]
    assert q["sinkhorn_latent"] == q["sinkhorn_latent"]  # not NaN
    assert abs(q["class0_mean"]) < 10 and abs(q["class1_mean"]) < 10
    # round 5: the interleaved-pipeline end-to-end drive (2 stages × 2
    # virtual chunks through train_flow.py; tools/pod_interleaved_drive.py)
    inter = s.get("interleaved_drive")
    if inter is not None:
        assert inter["final_eval_loss"] < 5.0
        assert inter["steps"] >= 8 * inter["epochs"]
        assert "2 stages x 2 chunks" in inter["mesh"]
