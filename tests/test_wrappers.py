"""Auxiliary vec wrappers, KV logger, episode recording, misc utils."""
import os

import numpy as np

from var_tpu.envs import spaces
from var_tpu.envs.fake import FakeArmEnv
from var_tpu.envs.vec.dummy import DummyVecEnv
from var_tpu.envs.vec.wrappers import (
    VecExtractDictObs,
    VecFrameStack,
    tile_images,
)
from var_tpu.utils.kvlogger import KVLogger
from var_tpu.utils.misc import rgetattr


def _venv(n=2):
    def fn():
        e = FakeArmEnv(max_steps=4)
        e.seed(0)
        return e

    return DummyVecEnv([fn] * n)


def test_extract_dict_obs():
    venv = VecExtractDictObs(_venv(), "robot_pose")
    obs = venv.reset()
    assert obs.shape == (2, 2)
    obs, r, d, i = venv.step(np.zeros((2, 2)))
    assert obs.shape == (2, 2)
    venv.close()


def test_frame_stack():
    inner = VecExtractDictObs(_venv(), "robot_pose")
    venv = VecFrameStack(inner, nstack=3)
    obs = venv.reset()
    assert obs.shape == (2, 6)
    assert np.all(obs[:, :4] == 0)  # only newest slot filled
    obs1, *_ = venv.step(np.zeros((2, 2)))
    assert np.array_equal(obs1[:, 2:4], obs[:, 4:6])  # shifted left
    venv.close()


def test_tile_images():
    imgs = np.arange(5 * 4 * 4 * 3).reshape(5, 4, 4, 3).astype(np.uint8)
    tiled = tile_images(imgs)
    assert tiled.shape[0] % 4 == 0 and tiled.shape[1] % 4 == 0
    np.testing.assert_array_equal(tiled[:4, :4], imgs[0])


def test_kvlogger(tmp_path):
    lg = KVLogger(log_dir=str(tmp_path), formats=["json", "csv"])
    lg.logkv("a", 1.0)
    lg.logkv_mean("b", 2.0)
    lg.logkv_mean("b", 4.0)
    with lg.profile_kv("phase"):
        pass
    out = lg.dumpkvs()
    assert out["a"] == 1.0 and out["b"] == 3.0 and "wait_phase" in out
    assert os.path.exists(os.path.join(str(tmp_path), "progress.jsonl"))
    assert os.path.exists(os.path.join(str(tmp_path), "progress_kv.csv"))


def test_episode_recording(tmp_path):
    from var_tpu.envs.recording import save_episode_image

    class C:
        episodeImgSaveInterval = 2
        episodeImgSaveDir = os.path.join(str(tmp_path), "imgs")
        episodeImgSize = (48, 48, 3)

    img = (np.random.rand(96, 96, 3) * 255).astype(np.uint8)
    assert save_episode_image(C, img, episode=1, step=0) is None  # off-interval
    path = save_episode_image(C, img, episode=2, step=3)
    assert path and os.path.exists(path)


def test_rgetattr():
    class A:
        class B:
            x = 7

        b = B()

    assert rgetattr(A(), "b.x") == 7


def test_nonrecurrent_ppo_update():
    import jax
    import jax.numpy as jnp

    from var_tpu.models.policy import build_policy
    from var_tpu.rl.ppo import PPO, PPOConfig

    class Cfg:
        RLPolicyBase = "arm_VAR"
        representationDim = 3
        robotStateDim = 2
        RLRecurrentPolicy = False
        RLRecurrentInputSize = 16
        RLRecurrentSize = 32
        RLActionHiddenSize = 32
        computeDtype = "float32"
        ppoClipParam = 0.2
        ppoEpoch = 2
        ppoNumMiniBatch = 2
        ppoValueLossCoef = 0.5
        ppoEntropyCoef = 0.01
        RLLr = 1e-4
        RLEps = 1e-5
        RLMaxGradNorm = 0.5

    cfg = Cfg()
    space = spaces.Box(low=-np.ones(2), high=np.ones(2))
    policy = build_policy(cfg, space)
    T, N = 4, 4
    rng = np.random.RandomState(0)
    obs0 = {
        "image": jnp.asarray((rng.rand(N, 3, 96, 96) * 255).astype(np.uint8)),
        "image_feat": jnp.zeros((N, 3)),
        "robot_pose": jnp.zeros((N, 2)),
        "goal_sound_feat": jnp.zeros((N, 3)),
    }
    hx = jnp.zeros((N, 1))
    variables = policy.init(jax.random.PRNGKey(0), obs0, hx,
                            jnp.ones((N, 1)), 1)
    ppo = PPO(policy, PPOConfig.from_config(cfg))
    state = ppo.init_state(variables["params"])
    batch = {
        "obs": {
            "image": jnp.asarray(
                (rng.rand(T, N, 3, 96, 96) * 255).astype(np.uint8)),
            "image_feat": jnp.asarray(rng.randn(T, N, 3).astype(np.float32)),
            "robot_pose": jnp.asarray(rng.randn(T, N, 2).astype(np.float32)),
            "goal_sound_feat": jnp.asarray(
                rng.randn(T, N, 3).astype(np.float32)),
        },
        "rnn_hx0": jnp.zeros((N, 1)),
        "actions": jnp.asarray(rng.randn(T, N, 2).astype(np.float32)),
        "value_preds": jnp.asarray(rng.randn(T, N).astype(np.float32)),
        "returns": jnp.asarray(rng.randn(T, N).astype(np.float32)),
        "masks": jnp.ones((T, N)),
        "old_log_probs": jnp.asarray(rng.randn(T, N).astype(np.float32)),
    }
    state, metrics = ppo.update(state, batch, jax.random.PRNGKey(1))
    import jax

    for v in metrics.values():
        assert bool(jnp.isfinite(v))


def test_kvlogger_csv_grows_columns_and_survives_restart(tmp_path):
    """New keys widen the CSV header (old rows padded) instead of being
    dropped, and a process restart adopts the existing header instead of
    appending a second one."""
    lg = KVLogger(log_dir=str(tmp_path), formats=["csv"])
    lg.logkv("a", 1)
    lg.dumpkvs()
    lg.logkv("a", 2)
    lg.logkv("b", 3)
    lg.dumpkvs()
    path = tmp_path / "progress_kv.csv"
    lines = path.read_text().splitlines()
    assert lines[0] == "a,b"
    assert lines[1].startswith("1") and lines[1].endswith(",")
    assert lines[2] == "2,3"
    # restart: header adopted, not duplicated
    lg2 = KVLogger(log_dir=str(tmp_path), formats=["csv"])
    lg2.logkv("a", 4)
    lg2.logkv("b", 5)
    lg2.dumpkvs()
    lines = path.read_text().splitlines()
    assert lines.count("a,b") == 1
    assert lines[-1] == "4,5"


def test_vec_normalize_flat_obs():
    """VecNormalize (the repaired baselines wrapper): running obs/return
    normalization with clipping, return reset at episode ends."""
    from var_tpu.envs.vec.base import VecEnv
    from var_tpu.envs.vec.wrappers import VecNormalize

    class FlatEnv(VecEnv):
        def __init__(self):
            from var_tpu.envs import spaces as S

            super().__init__(2, S.Box(-np.inf, np.inf, shape=(3,)),
                             S.Discrete(2))
            self.t = 0

        def reset(self):
            self.t = 0
            return np.ones((2, 3), np.float32)

        def step_async(self, actions):
            pass

        def step_wait(self):
            self.t += 1
            obs = np.full((2, 3), float(self.t), np.float32)
            rews = np.array([1.0, -1.0]) * self.t
            news = np.array([self.t % 3 == 0, False])
            return obs, rews, news, ({}, {})

    venv = VecNormalize(FlatEnv(), ob=True, ret=True, clipob=5.0, cliprew=5.0)
    obs = venv.reset()
    assert obs.shape == (2, 3)
    for _ in range(6):
        obs, rews, news, _ = venv.step([0, 1])
        assert np.all(np.abs(obs) <= 5.0)
        assert np.all(np.abs(rews) <= 5.0)
    # return accumulator resets where an episode ended
    assert venv.ret[0] == 0.0 or not news[0]
    venv.close()


def test_multibinary_bernoulli_head():
    """MultiBinary action space -> Bernoulli distribution head (the
    reference's Policy dispatch, models/ppo/model.py:39-41)."""
    import jax
    import jax.numpy as jnp

    from var_tpu.envs import spaces as S
    from var_tpu.models.distributions import (
        entropy, log_probs, make_head, mode, sample)

    space = S.MultiBinary(4)
    x = space.sample(np.random.RandomState(0))
    assert space.contains(x) and x.shape == (4,)
    assert not space.contains(np.array([0, 2, 1, 0]))

    head = make_head(space)
    feats = jnp.zeros((3, 8))
    params = head.init(jax.random.PRNGKey(0), feats)
    dist = head.apply(params, feats)
    a = sample(dist, jax.random.PRNGKey(1))
    assert a.shape == (3, 4)
    assert set(np.unique(np.asarray(a))) <= {0.0, 1.0}
    lp = log_probs(dist, a)
    assert lp.shape == (3, 1) and np.isfinite(np.asarray(lp)).all()
    m = mode(dist)
    assert m.shape == (3, 4)
    assert np.isfinite(float(jnp.mean(entropy(dist))))


def test_observation_wrapper_seam():
    """VecEnvObservationWrapper routes every obs batch through process()
    (reference: vec_env.py:155-190) — reset AND step_wait."""
    from var_tpu.envs.vec.base import VecEnvObservationWrapper

    class Doubler(VecEnvObservationWrapper):
        def process(self, obs):
            return {k: v * 2 for k, v in obs.items()}

    plain = _venv()
    wrapped = Doubler(_venv())
    o_plain = plain.reset()
    o_wrap = wrapped.reset()
    for k in o_plain:
        np.testing.assert_allclose(o_wrap[k], o_plain[k] * 2)
    rng = np.random.RandomState(0)
    a = [plain.action_space.sample(rng) for _ in range(plain.num_envs)]
    (op, *_), (ow, *_) = plain.step(a), wrapped.step(a)
    for k in op:
        np.testing.assert_allclose(ow[k], op[k] * 2)
    plain.close(), wrapped.close()
