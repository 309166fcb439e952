"""Real-package adapter smoke tests (gated; skip without the simulators).

Contract tests against recording fakes live in test_adapters_contract.py;
these activate the moment the real engines are installed (the
torchaudio-golden gating pattern, test_torchaudio_golden.py): construct
the adapter against the real package, one reset + a few steps, obs-schema
assertions. They skip in this container (pybullet / ai2thor are not
installable here) but run on any equipped machine — the first-run
shakeout the adapters still need
(reference: Envs/pybullet/arms/env_bases.py:72-133 reset path,
Envs/ai2thor/RL_env_VAR.py:275-648).
"""
import os

import numpy as np
import pytest

from var_tpu.config import main_config


def _check_rl_obs(obs, cfg, extra_key):
    assert obs["image"].shape == tuple(cfg.img_dim)
    assert obs["image"].dtype == np.uint8
    assert obs["goal_sound"].shape == tuple(cfg.sound_dim)
    assert obs["goal_sound_feat"].shape == (cfg.representationDim,)
    assert extra_key in obs


@pytest.mark.slow
def test_pybullet_arm_adapter_real():
    pytest.importorskip("pybullet")
    pytest.importorskip("pybullet_data")
    from var_tpu.envs.adapters.pybullet_arm import PyBulletFourInARow

    cfg = main_config(env="arms")
    cfg.override(simBackend="pybullet", RLTrain=True)
    sdf = os.path.join(cfg.mediaPath, "kuka", "kuka_with_gripper2.sdf")
    if not os.path.exists(sdf):
        pytest.skip(f"reference URDF/SDF assets not found under "
                    f"{cfg.mediaPath!r} (need the reference's media tree)")
    env = PyBulletFourInARow(cfg)
    env.seed(0)
    try:
        obs = env.reset()
        _check_rl_obs(obs, cfg, "robot_pose")
        pose0 = obs["robot_pose"].copy()
        for _ in range(3):
            obs, rew, done, info = env.step(np.asarray([1.0, 0.0]))
            _check_rl_obs(obs, cfg, "robot_pose")
            assert np.isfinite(rew)
        # IK position control must actually move the end effector
        assert not np.allclose(obs["robot_pose"], pose0)
        # the ray test labels something sane
        hit = env.ray_test()
        assert -1 <= hit < len(cfg.objList)
    finally:
        env.close() if hasattr(env, "close") else None


@pytest.mark.slow
def test_ithor_adapter_real():
    pytest.importorskip("ai2thor")
    from var_tpu.envs.adapters.ithor import ITHOREnv

    cfg = main_config(env="ai2thor")
    cfg.override(simBackend="ithor", RLTrain=True, renderUnity=False)
    env = ITHOREnv(cfg)
    env.seed(0)
    try:
        try:
            obs = env.reset()
        except Exception as e:  # pragma: no cover - environment-specific
            if "Unity" in str(e) or "display" in str(e).lower():
                pytest.skip(f"ai2thor Unity runtime unavailable: {e}")
            raise
        _check_rl_obs(obs, cfg, "occupancy")
        assert obs["occupancy"].shape == (
            1, cfg.RLVisibleGrid, cfg.RLVisibleGrid)
        for action in (0, 4, 5):  # MoveAhead, RotateLeft, RotateRight
            obs, rew, done, info = env.step(action)
            _check_rl_obs(obs, cfg, "occupancy")
            # post-step-0 goal sound is the cache sentinel
            assert not np.isfinite(obs["goal_sound"]).any()
        # occupancy crop marks the agent cell's surroundings from the
        # real GetReachablePositions grid
        assert obs["occupancy"].max() <= 255
    finally:
        if getattr(env, "controller", None) is not None:
            env.controller.stop()
