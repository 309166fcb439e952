"""Vec envs, storage, reward wrapper, and end-to-end PPO smoke tests."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from var_tpu.config import main_config, gym_register
from var_tpu.envs.core import make
from var_tpu.envs.fake import FakeArmEnv
from var_tpu.envs.vec.dummy import DummyVecEnv
from var_tpu.envs.vec.factory import make_vec_envs
from var_tpu.models.encoders import build_pretext_model, init_pretext_params
from var_tpu.rl.reward import VecVARReward
from var_tpu.rl.storage import RolloutStorage
from var_tpu.envs import spaces as S


def _small_arm_cfg(tmp_path):
    cfg = main_config(env="arms")
    cfg.override(
        RLTrain=True,
        RLModelFineTune=False,
        RLNumEnvs=2,
        RLEnvMaxSteps=4,
        ppoNumSteps=4,
        RLTotalSteps=16,
        ppoNumMiniBatch=2,
        ppoEpoch=2,
        RLRecurrentSize=64,
        RLRecurrentInputSize=32,
        RLModelSaveDir=os.path.join(str(tmp_path), "rl"),
        pretextModelSaveDir=os.path.join(str(tmp_path), "var"),
        RLModelSaveInterval=1,
        vecEnvBackend="dummy",
    )
    return cfg


def test_dummy_vecenv_autoreset_and_obslist():
    def fn():
        e = FakeArmEnv(max_steps=3)
        e.seed(1)
        return e

    venv = DummyVecEnv([fn, fn])
    obs = venv.reset()
    assert obs["image"].shape == (2, 3, 96, 96)
    for t in range(4):
        obs, rew, done, infos = venv.step(np.zeros((2, 2)))
        assert len(venv.obs_list) == 2
    # after 3 steps envs auto-reset (done at t=2, reset obs returned)
    assert venv.envs[0].envStepCounter in (0, 1)
    venv.close()


def test_shmem_vecenv_matches_dummy():
    from var_tpu.envs.vec.shmem import ShmemVecEnv

    def fn():
        e = FakeArmEnv(max_steps=3)
        e.seed(7)
        return e

    dummy = DummyVecEnv([fn, fn])
    shmem = ShmemVecEnv([fn, fn], context="fork")
    od, osh = dummy.reset(), shmem.reset()
    for k in od:
        np.testing.assert_array_equal(od[k], osh[k])
    actions = np.ones((2, 2), np.float32) * 0.5
    for _ in range(4):
        od, rd, dd, _ = dummy.step(actions)
        osh, rs, ds, _ = shmem.step(actions)
        np.testing.assert_array_equal(dd, ds)
        np.testing.assert_allclose(rd, rs, rtol=1e-6)
        for k in od:
            np.testing.assert_array_equal(od[k], osh[k])
    dummy.close()
    shmem.close()


def test_shmem_forkserver_with_registry(tmp_path):
    """Regression: forkserver/spawn workers start with an EMPTY env
    registry (it is process-local runtime state), so the factory thunk
    must close over the resolved constructor, not the env id. This drives
    the default production path (make_vec_envs -> ShmemVecEnv with the
    forkserver context) end to end through a registered env."""
    from var_tpu.config import gym_register, main_config
    from var_tpu.envs.vec.factory import make_vec_envs

    cfg = main_config(env="arms")
    cfg.override(vecEnvBackend="shmem", RLTrain=True, RLModelFineTune=False,
                 RLEnvMaxSteps=3)
    gym_register(cfg, env="arms")
    envs = make_vec_envs(cfg.RLEnvName, seed=11, num_processes=2, gamma=None,
                         randomCollect=True, config=cfg)
    obs = envs.reset()
    assert obs["image"].shape == (2, 3, 96, 96)
    obs, rew, done, infos = envs.step(np.zeros((2, 2), np.float32))
    assert rew.shape == (2,)
    envs.close()


def test_rollout_storage_shapes():
    cfg = type("C", (), {"RLObsIgnore": {"current_sound"}})()
    space = S.DictSpace({
        "image": S.Box(0, 1, shape=(3, 8, 8)),
        "current_sound": S.Box(0, 1, shape=(4,)),
        "pose": S.Box(0, 1, shape=(2,)),
    })
    st = RolloutStorage(5, 3, space, S.Discrete(4), 16, cfg)
    assert set(st.obs.keys()) == {"image", "pose"}
    assert st.actions.dtype == np.int32
    batch = {"image": np.ones((3, 3, 8, 8)), "pose": np.zeros((3, 2))}
    st.set_first_obs(batch)
    st.insert(batch, np.zeros((3, 16)), np.ones((3, 1), np.int32),
              np.zeros((3, 1)), np.zeros((3, 1)), np.ones(3),
              np.ones((3, 1)), np.ones((3, 1)))
    st.compute_returns(np.zeros(3), True, 0.99, 0.95)
    db = st.device_batch()
    assert db["returns"].shape == (5, 3)


@pytest.mark.parametrize("env_kind", ["arms"])
def test_reward_wrapper_caching_and_reward(tmp_path, env_kind):
    cfg = _small_arm_cfg(tmp_path)
    gym_register(cfg, env="arms")
    model = build_pretext_model(cfg)
    params = init_pretext_params(model, cfg, jax.random.PRNGKey(0))["params"]

    envs = make_vec_envs(cfg.RLEnvName, seed=1, num_processes=2, gamma=0.99,
                         randomCollect=False, config=cfg,
                         pretext_model=model, pretext_params=params)
    obs = envs.reset()
    # processed obs schema (reference processArm keys)
    assert set(obs.keys()) == {"robot_pose", "goal_sound_feat", "image",
                               "image_feat"}
    # embeddings are unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(obs["goal_sound_feat"], axis=1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(
        np.linalg.norm(obs["image_feat"], axis=1), 1.0, rtol=1e-4)
    cached0 = envs.cached_goal_feat.copy()

    obs, rew, done, infos = envs.step(np.zeros((2, 2)))
    assert rew.shape == (2,)
    # raw VAR reward = dot(image_feat, goal_feat) (env reward is 0)
    expect = np.sum(obs["image_feat"] * obs["goal_sound_feat"], axis=1)
    np.testing.assert_allclose(envs.origStepReward, expect, atol=1e-5)
    envs.close()


@pytest.mark.slow
def test_fused_engine_matches_reward_wrapper(tmp_path):
    """The fused rollout engine must reproduce the wrapper's embeddings,
    goal cache, and raw reward exactly."""
    from var_tpu.models.policy import build_policy
    from var_tpu.rl.rollout import FusedRolloutEngine

    cfg = _small_arm_cfg(tmp_path)
    gym_register(cfg, env="arms")
    model = build_pretext_model(cfg)
    params = init_pretext_params(model, cfg, jax.random.PRNGKey(0))["params"]

    # raw envs (no wrapper)
    raw_envs = make_vec_envs(cfg.RLEnvName, seed=5, num_processes=2,
                             gamma=None, randomCollect=True, config=cfg)
    raw_obs = raw_envs.reset()

    # wrapper path on the same raw obs
    wrapped = VecVARReward.__new__(VecVARReward)
    wrapped.config = cfg
    wrapped.model = model
    wrapped.params = params
    wrapped.ret_norm = None
    wrapped.num_envs = 2
    wrapped.cached_goal_feat = np.zeros((2, 3), np.float32)
    wrapped.processing_func = wrapped._process_arm
    from var_tpu.utils.profiling import PhaseTimer

    wrapped.timer = PhaseTimer()
    w_obs, w_rew = wrapped._process_arm(dict(raw_obs), np.zeros(2))

    # fused path
    policy = build_policy(cfg, raw_envs.action_space)
    engine = FusedRolloutEngine(model, params, policy, cfg, 2,
                                ret_norm=False)
    hx = jnp.zeros((2, cfg.RLRecurrentSize))
    masks = jnp.ones((2, 1))
    dummy = {
        "robot_pose": jnp.asarray(raw_obs["robot_pose"].astype(np.float32)),
        "goal_sound_feat": jnp.zeros((2, 3)),
        "image": jnp.asarray(raw_obs["image"].astype(np.uint8)),
        "image_feat": jnp.zeros((2, 3)),
    }
    pvars = policy.init(jax.random.PRNGKey(1), dummy, hx, masks, 1)
    processed, norm_rew, raw_rew, out = engine.process_and_act(
        pvars["params"], raw_obs, np.zeros(2), np.zeros(2, bool), hx, masks,
        jax.random.PRNGKey(2))

    np.testing.assert_allclose(processed["image_feat"], w_obs["image_feat"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(processed["goal_sound_feat"],
                               w_obs["goal_sound_feat"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(raw_rew, w_rew, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(engine.cached_goal, wrapped.cached_goal_feat,
                               rtol=1e-5, atol=1e-6)
    raw_envs.close()


@pytest.mark.slow
def test_end_to_end_rl_training(tmp_path):
    from var_tpu.train.rl import RLTrainer

    cfg = _small_arm_cfg(tmp_path)
    trainer = RLTrainer(cfg, env="arms")
    # frozen VAR = freshly initialized (no pretraining needed for smoke)
    trainer.pretext_params = init_pretext_params(
        trainer.pretext_model, cfg, jax.random.PRNGKey(0))["params"]
    state = trainer.trainRL(total_steps=16, log_interval=1)
    assert state is not None
    assert os.path.isdir(os.path.join(cfg.RLModelSaveDir, "00000"))
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


@pytest.mark.slow
def test_eval_success_rate(tmp_path):
    from var_tpu.models.policy import build_policy
    from var_tpu.train.checkpoint import save_checkpoint
    from var_tpu.train.rl import RLTrainer

    cfg = _small_arm_cfg(tmp_path)
    cfg.override(RLTrain=False)
    trainer = RLTrainer(cfg, env="arms")
    trainer.pretext_params = init_pretext_params(
        trainer.pretext_model, cfg, jax.random.PRNGKey(0))["params"]
    # evaluation refuses to run without a real checkpoint (a silent
    # random-policy eval would fabricate success-rate CSVs)
    with pytest.raises(FileNotFoundError):
        trainer.testRL(num_episodes=1,
                       policy_path=str(tmp_path / "nope"))
    policy = build_policy(cfg, make(cfg.RLEnvName).action_space)
    dummy = {
        "robot_pose": jnp.zeros((1, 2)),
        "goal_sound_feat": jnp.zeros((1, 3)),
        "image": jnp.zeros((1, 3, 96, 96)),
        "image_feat": jnp.zeros((1, 3)),
    }
    pv = policy.init(jax.random.PRNGKey(0), dummy,
                     jnp.zeros((1, cfg.RLRecurrentSize)), jnp.ones((1, 1)), 1)
    ckpt = str(tmp_path / "policy_ckpt")
    save_checkpoint(ckpt, {"params": pv["params"]})
    rate = trainer.testRL(num_episodes=3, policy_path=ckpt)
    assert 0.0 <= rate <= 1.0


def test_shm_posix_transport_roundtrip():
    """The C++ POSIX segment: parent batched views see worker row writes."""
    from var_tpu.envs.vec import shm_transport

    if not shm_transport.available():
        pytest.skip("shmbuf native library not built")
    seg = shm_transport.ShmObsSegment(
        ["image", "pose"], {"image": (3, 4, 4), "pose": (2,)},
        {"image": np.uint8, "pose": np.float32}, num_envs=3)
    handle = seg.worker_handle()
    import pickle

    handle2 = pickle.loads(pickle.dumps(handle))  # ships to workers
    views = handle2.open(1)
    views["image"][:] = 7
    views["pose"][:] = [1.5, -2.5]
    assert (seg.batched("image")[1] == 7).all()
    assert (seg.batched("image")[0] == 0).all()
    np.testing.assert_allclose(seg.batched("pose")[1], [1.5, -2.5])
    seg.close()


def test_shmem_posix_matches_dummy():
    """ShmemVecEnv on the posix transport reproduces the dummy backend."""
    from var_tpu.envs.vec import shm_transport
    from var_tpu.envs.vec.dummy import DummyVecEnv
    from var_tpu.envs.vec.shmem import ShmemVecEnv

    if not shm_transport.available():
        pytest.skip("shmbuf native library not built")

    def fn():
        e = FakeArmEnv(max_steps=3)
        e.seed(7)
        return e

    dummy = DummyVecEnv([fn, fn])
    shmem = ShmemVecEnv([fn, fn], context="forkserver", transport="posix")
    assert shmem.segment is not None
    od, osh = dummy.reset(), shmem.reset()
    for k in od:
        np.testing.assert_array_equal(od[k], osh[k])
    actions = np.ones((2, 2), np.float32) * 0.5
    for _ in range(4):
        od, rd, dd, _ = dummy.step(actions)
        osh, rs, ds, _ = shmem.step(actions)
        np.testing.assert_array_equal(dd, ds)
        np.testing.assert_allclose(rd, rs, rtol=1e-6)
        for k in od:
            np.testing.assert_array_equal(od[k], osh[k])
        for i in range(2):
            np.testing.assert_array_equal(
                shmem.obs_list[i]["image"], osh["image"][i])
    dummy.close()
    shmem.close()
