"""Fast unit tests for scripts/e2e_run.py's host-side helpers (the gated
VAR_TPU_E2E pipeline test covers the full run; these cover the pure logic
that shapes every run's config)."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from e2e_run import binom_ci95, build_config, scale_eval_quotas  # noqa: E402


def test_binom_ci95():
    assert binom_ci95(0.5, 100) == pytest.approx(1.96 * 0.05)
    # degenerate rates still produce a nonzero width
    assert binom_ci95(0.0, 64) > 0


def test_build_config_scales_episode_cap_with_quota(tmp_path):
    cfg = build_config("arms", str(tmp_path), rl_steps=6400,
                       eval_per_class=1, collect_per_class=400)
    assert cfg.pretextCollectNum == [400] * 4 + [800]
    assert cfg.pretextDataEpisode == 2000
    cfg2 = build_config("arms", str(tmp_path / "b"), rl_steps=6400,
                        eval_per_class=1, collect_per_class=6400)
    assert cfg2.pretextCollectNum == [6400] * 4 + [12800]
    # a fixed 2000-episode cap would starve >1600/class quotas
    assert cfg2.pretextDataEpisode == 5 * 6400


def test_scale_eval_quotas_arm_round_robin(tmp_path):
    cfg = build_config("arms", str(tmp_path), rl_steps=6400,
                       eval_per_class=4)
    scale_eval_quotas(cfg, 4)
    sizes = cfg.soundSource["size"]
    # per-class totals across datasets == the eval budget
    n = len(next(iter(sizes.values())))
    for i in range(n):
        assert sum(v[i] for v in sizes.values()) <= 4
        assert sum(v[i] for v in sizes.values()) >= 1


def test_scale_eval_quotas_grid_noop(tmp_path):
    cfg = build_config("ai2thor", str(tmp_path), rl_steps=3200,
                       eval_per_class=4)
    before = dict(cfg.soundSource)
    scale_eval_quotas(cfg, 4)  # grid sizes are scalar clip counts
    assert cfg.soundSource == before


def test_build_config_extra_set_wins(tmp_path):
    """--set KNOB=VALUE passthrough: parsed like the CLIs' --set and
    applied AFTER the runner's own overrides, so it can override them."""
    cfg = build_config("arms", str(tmp_path), rl_steps=6400,
                       eval_per_class=1,
                       extra_set=["RLModelSaveInterval=10",
                                  "RLTotalSteps=3200"])
    assert cfg.RLModelSaveInterval == 10
    assert cfg.RLTotalSteps == 3200  # beats the runner's rl_steps


def test_parse_set_items():
    from var_tpu.cli import parse_set_items

    got = parse_set_items(["a=1", "b=true", "c=none", "d=[1,2]", "e=x"])
    assert got == {"a": 1, "b": True, "c": None, "d": [1, 2], "e": "x"}
    with pytest.raises(SystemExit):
        parse_set_items(["novalue"])


def test_build_config_var_epochs_set_milestones(tmp_path):
    cfg = build_config("arms", str(tmp_path), rl_steps=6400,
                       eval_per_class=1, var_epochs=60)
    assert cfg.pretextEpoch == 60
    assert cfg.pretextLRDecayEpoch == [30, 50]
    assert cfg.pretextModelLoadDir.endswith(os.path.join("var_model", "59"))
