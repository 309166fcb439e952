"""Task-level capability test: the full collect -> VAR -> PPO -> eval
pipeline must produce a policy whose deterministic success rate is
materially above chance (reference: VAR/RL_VAR.py:57-76 success-rate
eval; fourInARow.py:317-335 final-step goal_area_count).

This trains a real policy, so it is far heavier than the slow tier
(tens of minutes on a real accelerator): it only runs when VAR_TPU_E2E=1
is exported. Scale knobs (env overrides, defaults = the measured minimal
recipe from the round-3 E2E runs recorded in E2E_r03.json):

    VAR_TPU_E2E=1 VAR_TPU_E2E_STEPS=600000 python -m pytest \
        tests/test_e2e_success.py -m slow -x -q

The same recipe at full scale (2M steps) is what E2E_r03.json records;
see scripts/e2e_run.py.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.environ.get("VAR_TPU_E2E"),
        reason="full task-success pipeline trains a policy for ~30+ min; "
               "export VAR_TPU_E2E=1 to run"),
]


def _run_profile(tmp_path, profile, steps, collect, var_epochs, num_envs,
                 ent_coef=None):
    out = tmp_path / f"e2e_{profile}.json"
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "e2e_run.py"),
        profile, str(tmp_path / profile),
        "--rl-steps", str(steps),
        "--collect-per-class", str(collect),
        "--var-epochs", str(var_epochs),
        "--num-envs", str(num_envs),
        # device-resident sim training (exact rollout protocol at ~3.4k
        # env-steps/s; pipelined host mode's unobservable action delay
        # stalls learning — ROADMAP.md round-3 finding); eval runs on the
        # host testRL stack
        "--device-sim",
        "--eval-backend", "dummy",
        "--eval-per-class", "16",
        "--eval-envs", "8",
        "--out", str(out),
    ]
    if ent_coef is not None:
        cmd += ["--ent-coef", str(ent_coef)]
    subprocess.run(cmd, check=True, cwd=REPO)
    with open(out) as f:
        return json.load(f)["profiles"][profile]


def test_arm_task_success_above_chance(tmp_path):
    """Arm fourInARow: 4 commanded objects -> blind chance is ~0.25 even
    before counting the precision-parking requirement (final-step ray hit
    inside a +/-3 cm box); a random policy measures ~0. The bar is 0.5.
    The measured recipe (E2E_r03.json): 64 envs, entropy 0.02 (escapes
    the park-on-half-the-goals local optimum), 12M steps -> 0.87."""
    steps = int(os.environ.get("VAR_TPU_E2E_STEPS", 12_000_000))
    res = _run_profile(tmp_path, "arms", steps,
                       collect=1600, var_epochs=100, num_envs=64,
                       ent_coef=0.02)
    assert res["success_rate"] >= 0.5, res


def test_grid_task_success_above_chance(tmp_path):
    """Grid (iTHOR-profile) navigation+toggle: the commanded act must be
    executed on the commanded object; chance is well below 0.25. Bar 0.5."""
    steps = int(os.environ.get("VAR_TPU_E2E_STEPS_GRID",
                               os.environ.get("VAR_TPU_E2E_STEPS",
                                              10_000_000)))
    res = _run_profile(tmp_path, "ai2thor", steps,
                       collect=800, var_epochs=80, num_envs=64)
    assert res["success_rate"] >= 0.5, res
