"""Parity: the device-resident arm sim (envs/arm_sim_device.py) must match
the host builtin sim (envs/arm_sim.py) state-for-state — pixel-identical
renders, identical ray tests, identical action kinematics — so a policy
trained on-device evaluates unchanged on the host testRL path."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from var_tpu.config import gym_register, main_config  # noqa: E402
from var_tpu.envs import arm_sim_device as dev  # noqa: E402
from var_tpu.envs.arm_sim import FourInARowSim  # noqa: E402


@pytest.fixture(scope="module")
def cfg():
    c = main_config(env="arms")
    c.override(RLTrain=True)
    gym_register(c, env="arms")
    return c


@pytest.fixture(scope="module")
def host_env(cfg):
    env = FourInARowSim(cfg)
    env.seed(3)
    return env


def _sync_states(host_env, n=12, seed=7):
    """Randomize the host sim n times; collect (objPose, objOrder, ee)."""
    rng = np.random.RandomState(seed)
    poses, orders, ees = [], [], []
    for _ in range(n):
        host_env._randomize()
        # scatter the gripper around the workspace incl. knife-edge spots
        c = host_env.config
        host_env.ee = np.array([
            rng.uniform(c.xMin, c.xMax), rng.uniform(c.yMin, c.yMax)])
        poses.append(host_env.objPose.copy())
        orders.append([host_env.objOrder[i] for i in range(4)])
        ees.append(host_env.ee.copy())
    return (np.asarray(poses, np.float32), np.asarray(orders, np.int32),
            np.asarray(ees, np.float32))


def test_render_pixel_parity(cfg, host_env):
    poses, _, ees = _sync_states(host_env)
    k = dev.consts_from_config(cfg)
    imgs = np.asarray(dev.render(jnp.asarray(poses), jnp.asarray(ees), k))
    for i in range(len(ees)):
        host_env.objPose = poses[i].astype(np.float64)
        host_env.ee = ees[i].astype(np.float64)
        ref = host_env.get_image()
        np.testing.assert_array_equal(imgs[i], ref)


def test_ray_test_parity(cfg, host_env):
    poses, _, ees = _sync_states(host_env, n=32, seed=11)
    # also place the gripper exactly on objects so hits occur
    on_obj = poses[:, 0, :] + np.float32([0.01, -0.012])
    ees = np.concatenate([ees, on_obj])
    poses = np.concatenate([poses, poses])
    k = dev.consts_from_config(cfg)
    got = np.asarray(dev.ray_test(jnp.asarray(poses), jnp.asarray(ees)))
    for i in range(len(ees)):
        host_env.objPose = poses[i].astype(np.float64)
        host_env.ee = ees[i].astype(np.float64)
        assert got[i] == host_env.ray_test()


def test_apply_action_parity(cfg, host_env):
    k = dev.consts_from_config(cfg)
    rng = np.random.RandomState(5)
    ee = np.float32([[0.6, 0.0], [0.451, -0.249], [0.749, 0.349]])
    act = rng.uniform(-1.6, 1.6, size=(3, 2)).astype(np.float32)
    got = np.asarray(dev.apply_action(jnp.asarray(ee), jnp.asarray(act), k))
    for i in range(3):
        host_env.ee = ee[i].astype(np.float64).copy()
        host_env._apply_action_rl(act[i])
        np.testing.assert_allclose(got[i], host_env.ee, atol=1e-6)


def test_randomize_ranges_and_order(cfg):
    k = dev.consts_from_config(cfg)
    pose, order, ee = dev.randomize(jax.random.PRNGKey(0), 256, k)
    pose, order, ee = map(np.asarray, (pose, order, ee))
    c = cfg
    assert pose[..., 0].min() >= c.xMin + c.objXRand[0] - 1e-6
    assert pose[..., 0].max() <= c.xMax + c.objXRand[1] + 1e-6
    # each env's order is a permutation of 0..3
    assert (np.sort(order, axis=1) == np.arange(4)).all()
    # object i sits at randomy + order[i]*interval: reconstructable
    rel = pose[..., 1] - np.take_along_axis(
        order.astype(np.float32) * c.objInterval, np.arange(4)[None, :].repeat(
            len(order), 0), axis=1)
    np.testing.assert_allclose(rel, rel[:, :1].repeat(4, 1), atol=1e-5)
    assert ee[:, 0].min() >= c.xMin + c.eeXInitRand[0] - 1e-6
    assert ee[:, 1].max() <= c.yMax + c.eeYInitRand[1] + 1e-6
    # orders are actually shuffled across envs
    assert len({tuple(o) for o in order}) > 4


class TestDeviceSimEngine:
    """Alignment/consistency of the one-program rollout
    (rl/device_sim.py): stored (obs_t, action_t, log-prob_t) tuples must
    be self-consistent and the kinematics chain must match the stored
    actions — the invariants PPO's importance ratios depend on."""

    @pytest.fixture(scope="class")
    def setup(self, cfg):
        import jax.numpy as jnp

        from var_tpu.models.encoders import build_pretext_model
        from var_tpu.models.policy import build_policy, evaluate_actions
        from var_tpu.envs import spaces as S
        from var_tpu.rl.device_sim import DeviceSimEngine, init_rms

        T, N = 5, 3
        cfg.override(RLEnvMaxSteps=T, ppoNumSteps=T, RLNumEnvs=N,
                     RLRecurrentSize=32, RLRecurrentInputSize=16)
        pm = build_pretext_model(cfg)
        pv = pm.init(jax.random.PRNGKey(0),
                     jnp.zeros((1,) + tuple(cfg.img_dim)),
                     jnp.zeros((1,) + tuple(cfg.sound_dim)),
                     jnp.zeros((1,) + tuple(cfg.sound_dim)))
        high = np.ones(cfg.RLActionDim, np.float32)
        policy = build_policy(cfg, S.Box(-high, high, dtype=np.float32))
        dummy = {"robot_pose": jnp.zeros((N, 2)),
                 "goal_sound_feat": jnp.zeros((N, cfg.representationDim)),
                 "image": jnp.zeros((N,) + tuple(cfg.img_dim), jnp.uint8),
                 "image_feat": jnp.zeros((N, cfg.representationDim))}
        pol_v = policy.init(jax.random.PRNGKey(1), dummy,
                            jnp.zeros((N, 32)), jnp.ones((N, 1)), 1)
        eng = DeviceSimEngine(pm, pv["params"], policy, cfg, T, N)
        rms, batch, ep_raw = eng.collect(
            init_rms(N), pol_v["params"], jax.random.PRNGKey(2))
        return cfg, eng, policy, pol_v, batch, ep_raw

    def test_kinematics_chain(self, setup):
        cfg, eng, _, _, batch, _ = setup
        import var_tpu.envs.arm_sim_device as dev
        import jax.numpy as jnp

        poses = np.asarray(batch["obs"]["robot_pose"])  # (T, N, 2)
        acts = np.asarray(batch["actions"])
        for t in range(len(poses) - 1):
            nxt = np.asarray(dev.apply_action(
                jnp.asarray(poses[t]), jnp.asarray(acts[t]), eng.k))
            np.testing.assert_allclose(nxt, poses[t + 1], atol=1e-6)

    def test_log_prob_consistency(self, setup):
        cfg, eng, policy, pol_v, batch, _ = setup
        from var_tpu.models.policy import evaluate_actions

        T, N = batch["returns"].shape
        obs_flat = {k: np.asarray(v).reshape((T * N,) + v.shape[2:])
                    for k, v in batch["obs"].items()}
        _, lp, _ = evaluate_actions(
            policy, {"params": pol_v["params"]}, obs_flat,
            np.asarray(batch["rnn_hx0"]),
            np.asarray(batch["masks"]).reshape(T * N, 1),
            np.asarray(batch["actions"]).reshape(T * N, -1), T)
        np.testing.assert_allclose(
            np.asarray(lp)[:, 0],
            np.asarray(batch["old_log_probs"]).reshape(-1), atol=2e-4)

    def test_goal_feats_are_unit_bank_rows(self, setup):
        cfg, eng, _, _, batch, _ = setup
        gf = np.asarray(batch["obs"]["goal_sound_feat"])  # (T, N, D)
        # constant over the episode, and each is a row of the bank
        np.testing.assert_allclose(gf, np.broadcast_to(gf[:1], gf.shape),
                                   atol=0)
        bank = np.asarray(eng.goal_bank).reshape(-1, gf.shape[-1])
        for row in gf[0]:
            assert np.abs(bank - row[None]).sum(axis=1).min() < 1e-5

    def test_episode_rewards_finite(self, setup):
        *_, ep_raw = setup
        ep = np.asarray(ep_raw)
        assert ep.shape == (3,) and np.isfinite(ep).all()
