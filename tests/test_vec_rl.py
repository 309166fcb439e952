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


def test_get_images_and_tiled_render():
    """All-env render: get_images returns one frame per env in env order
    and render() composes them with tile_images (reference:
    shmem_vec_env.py:97-100 broadcast + vec_env.py:112-121 tiling)."""
    from var_tpu.envs.vec.shmem import ShmemVecEnv
    from var_tpu.envs.vec.wrappers import tile_images

    def mk(seed):
        def fn():
            e = FakeArmEnv(max_steps=3)
            e.seed(seed)
            return e
        return fn

    for venv in (DummyVecEnv([mk(3), mk(4)]),
                 ShmemVecEnv([mk(3), mk(4)], context="fork")):
        venv.reset()
        imgs = venv.get_images()
        assert len(imgs) == 2
        # per-env frames arrive in env order (seed encoded in pixel fill)
        assert imgs[0][1, 1, 0] == 3 and imgs[1][1, 1, 0] == 4
        big = venv.render("rgb_array")
        np.testing.assert_array_equal(big, tile_images(imgs))
        assert big.shape == (16, 8, 3)  # 2x1 grid of 8x8 frames
        venv.close()


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


def test_ppo_lr_schedule():
    """Optional PPO LR decay (beats the reference's fixed Adam,
    RL.py:115): constant by default, linear/cosine decay to
    lr*final_factor over the optimizer-step horizon when enabled."""
    from var_tpu.rl.ppo import PPO, PPOConfig, PPOState

    base = dict(clip_param=0.2, ppo_epoch=4, num_mini_batch=2,
                value_loss_coef=0.5, entropy_coef=0.01, lr=3e-5,
                eps=1e-5, max_grad_norm=0.5)
    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.ones(3) * 0.1}

    # default: constant (reference parity), no schedule state cost
    ppo_const = PPO(None, PPOConfig(**base))
    st = ppo_const.init_state(params)
    assert ppo_const.current_lr(st) == pytest.approx(3e-5)

    ppo = PPO(None, PPOConfig(**base, lr_decay="linear",
                              lr_decay_start=0.5, lr_final_factor=0.1,
                              total_opt_steps=100))
    state = ppo.init_state(params)
    assert ppo.current_lr(state) == pytest.approx(3e-5, rel=1e-5)
    p, opt = params, state.opt_state
    lrs = []
    for i in range(100):
        lrs.append(ppo.current_lr(PPOState(p, opt, i)))
        upd, opt = ppo.tx.update(grads, opt, p)
    # constant for the first half, then linear down to lr/10
    assert lrs[49] == pytest.approx(3e-5, rel=1e-5)
    assert lrs[-1] < 4e-6  # one step before the horizon
    final = ppo.current_lr(PPOState(p, opt, 100))
    assert final == pytest.approx(3e-6, rel=1e-4)
    assert all(a >= b - 1e-12 for a, b in zip(lrs, lrs[1:]))  # monotone

    # config plumbing: RLLrDecay knob reaches PPOConfig.from_config
    cfg = main_config(env="arms")
    cfg.override(RLTrain=True, RLLrDecay="cosine", RLTotalSteps=8000,
                 ppoNumSteps=100, RLNumEnvs=8)
    pc = PPOConfig.from_config(cfg)
    assert pc.lr_decay == "cosine"
    assert pc.total_opt_steps == 10 * cfg.ppoEpoch * cfg.ppoNumMiniBatch
    PPO(None, pc)  # cosine schedule builds


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
    # batched lockstep eval (num_envs>1): same protocol, N episodes per
    # cycle; the rate stays a valid frequency and the CSV rows match
    rate2 = trainer.testRL(num_episodes=4, policy_path=ckpt, num_envs=2)
    assert 0.0 <= rate2 <= 1.0
    import pandas as pd

    df = pd.read_csv(str(tmp_path / "test_policy_ckpt.csv"))
    assert len(df) == 4
    assert set(df.columns) == {"objIdx", "goal area count", "rewards",
                               "results"}


@pytest.mark.slow
def test_pipelined_fused_rollout_training(tmp_path, monkeypatch):
    """The RLPipelinedRollout=True branch of _train_fused
    (train/rl.py one-step-stale protocol): (a) every dispatched step is
    read back exactly once (loop reads + the drain), so no reward is
    dropped or double-counted; (b) the stored rollout stays
    self-consistent — values[t]/log_probs[t] are the policy's outputs at
    the stored obs_t for the stored actions[t]; (c) training completes
    and saves. Engine contract: rl/rollout_device.py:_collect_step."""
    import var_tpu.rl.rollout_device as rd
    from var_tpu.models.distributions import log_probs
    from var_tpu.train.rl import RLTrainer

    class RecEngine(rd.DeviceRolloutEngine):
        created = []

        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            RecEngine.created.append(self)
            self.dispatches = 0
            self.reads = []
            self.dones = []
            self.first_params = None

        def set_policy_params(self, params):
            if self.first_params is None:
                # host snapshot: the device buffers get donated into the
                # PPO update, so keeping the jax arrays would leave
                # deleted buffers
                self.first_params = jax.tree_util.tree_map(
                    lambda x: np.asarray(x), params)
            super().set_policy_params(params)

        def step_async(self, *a, **k):
            self.dispatches += 1
            self.dones.append(np.asarray(a[3]).copy())
            return super().step_async(*a, **k)

        def read_packed(self, handle):
            action, raw = super().read_packed(handle)
            self.reads.append(np.asarray(raw).copy())
            return action, raw

    monkeypatch.setattr(rd, "DeviceRolloutEngine", RecEngine)

    cfg = _small_arm_cfg(tmp_path)
    T, N = 8, 2
    cfg.override(RLEnvMaxSteps=4, ppoNumSteps=T, RLNumEnvs=N,
                 RLTotalSteps=T * N,  # exactly one PPO update
                 fusedRollout=True, RLPipelinedRollout=True,
                 ppoEpoch=1, ppoNumMiniBatch=1)
    trainer = RLTrainer(cfg, env="arms")
    trainer.pretext_params = init_pretext_params(
        trainer.pretext_model, cfg, jax.random.PRNGKey(0))["params"]
    state = trainer.trainRL()

    # (c) completed + saved
    assert state is not None
    assert os.path.isdir(os.path.join(cfg.RLModelSaveDir, "00000"))
    assert all(bool(jnp.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(state.params))

    (engine,) = RecEngine.created
    # (a) exactly-once readback: T dispatched steps, T reads (T-1 in the
    # loop + 1 drain; step 0 has no pending read)
    assert engine.dispatches == T
    assert len(engine.reads) == T

    # (b) episode-reward bookkeeping: reconstruct the episode totals the
    # exact-mode accounting would produce from the recorded per-step raw
    # rewards + done flags (read i pairs with dispatch i's dones) and
    # require the logged episode stats to match.
    env_rewards = np.zeros(N)
    episodes = []
    for raw, done in zip(engine.reads, engine.dones):
        env_rewards = env_rewards + raw
        for idx in np.where(done)[0]:
            episodes.append(env_rewards[idx])
            env_rewards[idx] = 0.0
    assert len(episodes) == 4  # 2 episodes per env: maxSteps=4, T=8
    np.testing.assert_allclose(env_rewards, 0.0, atol=1e-6)  # all drained
    import pandas as pd

    prog = pd.read_csv(os.path.join(cfg.RLModelSaveDir, "progress.csv"))
    np.testing.assert_allclose(
        prog["eprewmean"].iloc[-1], np.mean(episodes), rtol=1e-5)
    np.testing.assert_allclose(
        prog["max"].iloc[-1], np.max(episodes), rtol=1e-5)

    # (c2) stored-rollout self-consistency: re-run the policy at the
    # stored obs/hidden/mask and require the stored value and the stored
    # action's log-prob to match what was recorded during collection.
    # Uses the PRE-update params (the rollout was collected with them;
    # after_update only rewrites index 0, so check t >= 1).
    b = engine.buffers
    params0 = engine.first_params
    for t in range(1, T):
        obs = {
            engine.extra_key: b.obs_extra[t],
            "goal_sound_feat": b.obs_goal_feat[t],
            "image": b.obs_image[t],
            "image_feat": b.obs_image_feat[t],
        }
        value, dist, _ = engine.policy.apply(
            {"params": params0}, obs, b.rnn_hx[t], b.masks[t][:, None], 1)
        np.testing.assert_allclose(
            np.asarray(value[:, 0]), np.asarray(b.values[t]),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(log_probs(dist, b.actions[t])[:, 0]),
            np.asarray(b.action_log_probs[t]), rtol=1e-5, atol=1e-5)


def test_rl_resume_restores_optax_structure(tmp_path):
    """Full-state RL resume: the structure-free Orbax restore returns the
    optimizer state as plain dicts; _resume_state must re-hang the leaves
    on the optax NamedTuple treedef so tx.update works and the Adam
    moments/step survive the round-trip (regression: resuming a fused
    training run crashed with \"'dict' object has no attribute 'mu'\")."""
    import optax

    from var_tpu.models.policy import build_policy
    from var_tpu.rl.ppo import PPO, PPOConfig
    from var_tpu.train.rl import RLTrainer

    cfg = _small_arm_cfg(tmp_path)
    trainer = RLTrainer(cfg, env="arms")
    policy = build_policy(cfg, make(cfg.RLEnvName).action_space)
    dummy = {
        "robot_pose": jnp.zeros((1, 2)),
        "goal_sound_feat": jnp.zeros((1, 3)),
        "image": jnp.zeros((1, 3, 96, 96)),
        "image_feat": jnp.zeros((1, 3)),
    }
    pv = policy.init(jax.random.PRNGKey(0), dummy,
                     jnp.zeros((1, cfg.RLRecurrentSize)), jnp.ones((1, 1)), 1)
    trainer.policy = policy
    trainer.ppo = PPO(policy, PPOConfig.from_config(cfg))
    state = trainer.ppo.init_state(pv["params"])
    # one optimizer step so the Adam moments are non-trivial
    g = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 0.01,
                               state.params)
    updates, opt_state = trainer.ppo.tx.update(g, state.opt_state,
                                               state.params)
    params2 = optax.apply_updates(state.params, updates)
    trainer.state = type(state)(params2, opt_state, state.step + 1)
    path = trainer.save_policy("00007")

    resume = trainer.load_policy_state(path)
    assert resume[1] is not None
    trainer._resume_state({"params": resume[0]}, resume)
    # structure restored: an update step runs (this crashed before)
    u2, _ = trainer.ppo.tx.update(g, trainer.state.opt_state,
                                  trainer.state.params)
    assert all(bool(jnp.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(u2))
    # and the moments survived the round-trip bit-exactly
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(trainer.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(trainer.state.step) == 1


@pytest.mark.slow
def test_fused_eval_actions_match_wrapped_eval(tmp_path):
    """The fused deterministic eval (testRL -> _test_fused, one program
    per step) must pick the same actions as the wrapped per-step path
    (VecVARReward processing + act(deterministic=True)) — same VAR
    embeddings, same policy mode, across the reset step and a following
    transition (incl. the goal-cache carry)."""
    from var_tpu.models.policy import act, build_policy
    from var_tpu.rl.rollout_device import DeviceRolloutEngine
    from var_tpu.utils.profiling import PhaseTimer

    cfg = _small_arm_cfg(tmp_path)
    gym_register(cfg, env="arms")
    model = build_pretext_model(cfg)
    params = init_pretext_params(model, cfg, jax.random.PRNGKey(0))["params"]

    N = 2
    raw_envs = make_vec_envs(cfg.RLEnvName, seed=7, num_processes=N,
                             gamma=None, randomCollect=True, config=cfg)
    raw_obs = raw_envs.reset()
    policy = build_policy(cfg, raw_envs.action_space)
    dummy = {
        "robot_pose": jnp.zeros((N, 2)),
        "goal_sound_feat": jnp.zeros((N, 3)),
        "image": jnp.zeros((N, 3, 96, 96)),
        "image_feat": jnp.zeros((N, 3)),
    }
    pvars = policy.init(jax.random.PRNGKey(3), dummy,
                        jnp.zeros((N, cfg.RLRecurrentSize)),
                        jnp.ones((N, 1)), 1)

    # wrapped path: VAR processing (the reward wrapper's math) + act(mode)
    wrapped = VecVARReward.__new__(VecVARReward)
    wrapped.config = cfg
    wrapped.model = model
    wrapped.params = params
    wrapped.ret_norm = None
    wrapped.num_envs = N
    wrapped.cached_goal_feat = np.zeros((N, 3), np.float32)
    wrapped.processing_func = wrapped._process_arm
    wrapped.timer = PhaseTimer()
    w_obs, _ = wrapped._process_arm(dict(raw_obs), np.zeros(N))
    hx = jnp.zeros((N, cfg.RLRecurrentSize))
    dev_obs = {k: jnp.asarray(v) for k, v in w_obs.items()}
    step_w = act(policy, pvars, dev_obs, hx, jnp.ones((N, 1)),
                 jax.random.PRNGKey(9), deterministic=True)

    # fused path: deterministic engine
    engine = DeviceRolloutEngine(
        model, params, policy, cfg, 1, N, "robot_pose", (2,), jnp.float32,
        raw_envs.action_space.shape, jnp.float32, gamma=cfg.RLGamma,
        deterministic=True)
    engine.set_policy_params(pvars["params"])
    action_f = engine.init(raw_obs, jax.random.PRNGKey(9))
    np.testing.assert_allclose(action_f, np.asarray(step_w.action),
                               rtol=1e-5, atol=1e-6)

    # one transition: same action into the env, same next action out
    raw_obs2, env_rew, done, _ = raw_envs.step(action_f)
    action_f2, raw_rew = engine.step(
        0, raw_obs2, np.asarray(env_rew, np.float32),
        done.astype(np.float32), np.ones(N, np.float32),
        jax.random.PRNGKey(10))
    w_obs2, w_rew2 = wrapped._process_arm(dict(raw_obs2), np.zeros(N))
    step_w2 = act(policy, pvars, {k: jnp.asarray(v) for k, v in w_obs2.items()},
                  step_w.rnn_hx, jnp.asarray((~done).astype(np.float32)[:, None]),
                  jax.random.PRNGKey(10), deterministic=True)
    np.testing.assert_allclose(action_f2, np.asarray(step_w2.action),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(raw_rew, w_rew2, rtol=1e-5, atol=1e-6)
    raw_envs.close()


def test_eval_size_per_class_derivation():
    """When the base env's counters are unreachable (shmem/adapters),
    testRL derives per-class eval quotas from config exactly as the envs
    themselves compute them — never a silent fixed default."""
    from var_tpu.config import main_config
    from var_tpu.train.rl import _eval_size_per_class

    arm = main_config(env="arms")
    # arm: summed sound-source test-set sizes (fourInARow.py:92-96)
    assert _eval_size_per_class(arm).tolist() == [1000] * 4
    thor = main_config(env="ai2thor")
    thor.override(testEpisodesPerClass=7)
    assert _eval_size_per_class(thor).tolist() == [7] * thor.taskNum
    # nothing derivable -> explicit error, not a plausible CSV
    class Bare:
        taskNum = 4
    with pytest.raises(ValueError):
        _eval_size_per_class(Bare())


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
