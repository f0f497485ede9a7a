"""Validates the committed defense-efficacy artifact (EFFICACY_r05.json,
produced by tools/efficacy_run.py on TPU): the purification defense must
actually *defend* — the semantic claim of the reference
(/root/reference/README.md:7-8, demonstrated upstream via
src/experiments/test_defense.py:267-291).

Skipped when the artifact has not been generated (the pipeline needs TPU
hours); on a tree that ships the artifact, this pins its claims:
  (a) clean accuracy >> chance for BOTH the bare classifier and the
      defended model,
  (b) for each attack, the attacker's position is markedly worse against
      the defense: lower success rate and/or larger median L2,
  (c) the runs came through the standard harness at >= 64 images.
"""

import json
from pathlib import Path

import pytest

ARTIFACT = Path(__file__).resolve().parent.parent / "EFFICACY_r05.json"


@pytest.fixture(scope="module")
def report():
    if not ARTIFACT.exists():
        pytest.skip("EFFICACY_r05.json not generated (run tools/efficacy_run.py)")
    return json.loads(ARTIFACT.read_text())


def test_clean_accuracy_far_above_chance(report):
    chance = 1.0 / report["dataset"]["n_classes"]
    for name in report["results"]:
        acc = report["results"][name]["clean_acc"]
        assert acc >= max(0.9, 3 * chance), (name, acc)


def test_purifier_reconstructions_preserve_class(report):
    assert report["models"]["nvae_recon_clf_acc"] >= 0.9, report["models"]


def test_attacks_do_break_the_bare_classifier(report):
    # the attacks themselves must be potent, else (b) is vacuous
    rates = [report["results"]["base"][a]["success_rate"]
             for a in ("DeepFool", "C&W", "AutoAttack")
             if a in report["results"]["base"]]
    assert rates and max(rates) >= 0.8, rates


def test_defense_raises_attacker_cost(report):
    """A defended variant (the reference ships several config families;
    ours_noise = the ours_*_noise_ids family) must raise the attacker's
    minimal-distortion cost on EVERY attack (median successful L2 >=
    1.25x the bare classifier's) and strongly (>= 1.8x) on at least one —
    the reference's claim shape (README.md:7-8: purification forces more
    perceptible perturbations; it does not promise immunity to
    unbounded adaptive attacks)."""
    comp = report["comparison"]
    assert comp, "no attack ran on both configs"

    def ratios(c):
        out = []
        for attack, v in c.items():
            l2_b, l2_o = v["median_l2_base"], v["median_l2_defended"]
            if l2_b is None or l2_o is None:
                return None  # an attack fully failed on one side
            out.append(l2_o / l2_b)
        return out if out else None

    def variant_wins(c):
        r = ratios(c)
        return r is not None and min(r) >= 1.25 and max(r) >= 1.8

    assert any(variant_wins(c) for c in comp.values()), comp


def test_produced_through_the_real_harness(report):
    assert report["eval"]["n_images"] >= 64
    assert "run_benchmark" in report["eval"]["harness"]
    art = ARTIFACT.parent / "artifacts" / "efficacy_r05"
    assert (art / "results_base_results.json").exists()
    assert (art / "results_ours_results.json").exists()
