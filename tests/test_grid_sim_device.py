"""Parity: the device-resident grid sim (envs/grid_sim_device.py) must
match the host builtin grid sim (envs/grid_sim.py) state-for-state —
pixel-identical raycast renders, identical visibility, occupancy crops
and action semantics — so a policy trained on-device evaluates unchanged
on the host testRL path."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from var_tpu.config import gym_register, main_config  # noqa: E402
from var_tpu.envs import grid_sim_device as dev  # noqa: E402
from var_tpu.envs.grid_sim import GridHouseSim  # noqa: E402


@pytest.fixture(scope="module")
def cfg():
    c = main_config(env="ai2thor")
    c.override(RLTrain=True)
    gym_register(c, env="ai2thor")
    return c


@pytest.fixture(scope="module")
def bank(cfg):
    return dev.build_plan_bank(cfg)


@pytest.fixture(scope="module")
def host_env(cfg):
    env = GridHouseSim(cfg)
    env.seed(5)
    env.reset()
    return env


def _states(host_env, bank, n=40, seed=13):
    """Random (plan, pos, rot, toggled) states; host env synced to each."""
    rng = np.random.RandomState(seed)
    plans = rng.randint(0, int(bank.grids.shape[0]), size=n)
    out = []
    for pi in plans:
        host_env.floor_plan = host_env.config.allScene["livingRoom"][pi]
        host_env._build_world()
        free = np.argwhere(host_env.grid == 0)
        free = [c for c in free if host_env._free(c)]
        cell = free[rng.randint(len(free))]
        rot_idx = rng.randint(8)
        tog = rng.randint(0, 2, size=2).astype(bool)
        out.append((pi, np.asarray(cell), rot_idx, tog))
    return out


def _sync(host_env, bank, st):
    pi, cell, rot_idx, tog = st
    host_env.floor_plan = host_env.config.allScene["livingRoom"][pi]
    host_env._build_world()
    host_env.pos = cell.copy()
    host_env.rot = 45.0 * rot_idx
    for i, name in enumerate(dev.OBJ_NAMES):
        host_env.objects[name]["isToggled"] = bool(tog[i])


def _batch(states):
    plan = jnp.asarray([s[0] for s in states], jnp.int32)
    pos = jnp.asarray(np.stack([s[1] for s in states]), jnp.int32)
    rot = jnp.asarray([s[2] for s in states], jnp.int32)
    tog = jnp.asarray(np.stack([s[3] for s in states]))
    return plan, pos, rot, tog


def test_plan_bank_matches_world_build(cfg, bank, host_env):
    for pi, fp in enumerate(cfg.allScene["livingRoom"]):
        host_env.floor_plan = fp
        host_env._build_world()
        np.testing.assert_array_equal(np.asarray(bank.grids[pi]),
                                      host_env.grid)
        np.testing.assert_array_equal(np.asarray(bank.occ_padded[pi]),
                                      host_env.occupancy_grid)
        for i, name in enumerate(dev.OBJ_NAMES):
            np.testing.assert_array_equal(
                np.asarray(bank.obj_cells[pi, i]),
                host_env.objects[name]["cell"])


def test_render_pixel_parity(cfg, bank, host_env):
    """Near-pixel parity: the host paths (numpy + C++) ray-march in
    float64 by design; the TPU kernel is float32, so a ray that grazes a
    cell boundary can first-hit one 0.15-step later, shifting one
    column's band edge by a row. Bound: <=0.2% differing pixels per
    image, and most states bit-identical."""
    states = _states(host_env, bank)
    plan, pos, rot, tog = _batch(states)
    imgs = np.asarray(dev.render(bank, plan, pos, rot, tog, cfg))
    exact = 0
    for i, st in enumerate(states):
        _sync(host_env, bank, st)
        ref = host_env._render_numpy()
        d = (imgs[i] != ref).any(-1)
        assert d.mean() <= 0.002, (st, d.sum())
        exact += int(d.sum() == 0)
    assert exact >= int(0.8 * len(states)), f"{exact}/{len(states)} exact"


def test_visibility_parity(cfg, bank, host_env):
    """Exact on distance and FoV gates (integer-exact device math incl.
    the host's epsilon-excluded 45-degree diagonals); the line-of-sight
    sampling is f32 on device vs f64 on host, so a corner-grazing ray may
    rarely differ — tolerate <=2% of states."""
    states = _states(host_env, bank, n=60, seed=3)
    plan, pos, rot, tog = _batch(states)
    vis = np.asarray(dev.visible_mask(bank, plan, pos, rot, cfg))
    bad = 0
    for i, st in enumerate(states):
        _sync(host_env, bank, st)
        ref = host_env.visible_objects()
        got = [dev.OBJ_NAMES[j] for j in range(2) if vis[i, j]]
        bad += int(got != ref)
    assert bad <= max(1, len(states) // 50), f"{bad}/{len(states)}"


def test_occupancy_crop_parity(cfg, bank, host_env):
    states = _states(host_env, bank, n=24, seed=8)
    plan, pos, rot, tog = _batch(states)
    occ = np.asarray(dev.local_occupancy(bank, plan, pos, rot, cfg))
    for i, st in enumerate(states):
        _sync(host_env, bank, st)
        ref = host_env.get_local_occupancy_map()
        np.testing.assert_array_equal(occ[i, 0], ref)


def test_action_parity(cfg, bank, host_env):
    rng = np.random.RandomState(4)
    states = _states(host_env, bank, n=48, seed=21)
    plan, pos, rot, tog = _batch(states)
    actions = jnp.asarray(rng.randint(0, len(cfg.allActions), size=48),
                          jnp.int32)
    np_, nr, nt = dev.exe_action(bank, plan, pos, rot, tog, actions, cfg)
    np_, nr, nt = map(np.asarray, (np_, nr, nt))
    bad = 0
    for i, st in enumerate(states):
        _sync(host_env, bank, st)
        host_env._exe_action(cfg.allActions[int(actions[i])])
        np.testing.assert_array_equal(np_[i], host_env.pos)
        assert nr[i] == int(host_env.rot // 45)
        # toggles depend on visibility; same rare f32 line-of-sight caveat
        # as test_visibility_parity
        bad += int(any(
            bool(nt[i, j]) != host_env.objects[name]["isToggled"]
            for j, name in enumerate(dev.OBJ_NAMES)))
    assert bad <= max(1, len(states) // 50), f"{bad}/{len(states)}"


def test_random_reset_semantics(cfg, bank):
    n_tasks = 4
    task_obj = jnp.asarray([0, 0, 1, 1], jnp.int32)
    task_on = jnp.asarray([True, False, True, False])
    plan, pos, rot, tog, tid = dev.random_reset(
        bank, jax.random.PRNGKey(0), 256, n_tasks, task_obj, task_on, cfg)
    plan, pos, rot, tog, tid = map(np.asarray, (plan, pos, rot, tog, tid))
    # agent always on a free cell
    free = np.asarray(dev.free_at(bank, jnp.asarray(plan),
                                  jnp.asarray(pos)))
    assert free.all()
    # commanded object forced opposite to the act
    obj = np.asarray(task_obj)[tid]
    on = np.asarray(task_on)[tid]
    assert (tog[np.arange(256), obj] == ~on).all()
    assert set(np.unique(tid)) == set(range(n_tasks))
    assert rot.min() >= 0 and rot.max() <= 7


class TestGridDeviceSimEngine:
    """Rollout alignment invariants for the one-program grid collector
    (rl/device_sim.py GridDeviceSimEngine) — same contract as the arm
    engine tests in tests/test_arm_sim_device.py."""

    @pytest.fixture(scope="class")
    def setup(self, cfg):
        from var_tpu.envs import spaces as S
        from var_tpu.models.encoders import build_pretext_model
        from var_tpu.models.policy import build_policy
        from var_tpu.rl.device_sim import GridDeviceSimEngine, init_rms

        T, N = 4, 3
        cfg.override(RLEnvMaxSteps=T, ppoNumSteps=T, RLNumEnvs=N,
                     RLRecurrentSize=32, RLRecurrentInputSize=16)
        pm = build_pretext_model(cfg)
        pv = pm.init(jax.random.PRNGKey(0),
                     jnp.zeros((1,) + tuple(cfg.img_dim)),
                     jnp.zeros((1,) + tuple(cfg.sound_dim)),
                     jnp.zeros((1,) + tuple(cfg.sound_dim)))
        policy = build_policy(cfg, S.Discrete(len(cfg.allActions)))
        dummy = {"occupancy": jnp.zeros((N, 1, 9, 9), jnp.uint8),
                 "goal_sound_feat": jnp.zeros((N, cfg.representationDim)),
                 "image": jnp.zeros((N,) + tuple(cfg.img_dim), jnp.uint8),
                 "image_feat": jnp.zeros((N, cfg.representationDim))}
        pol_v = policy.init(jax.random.PRNGKey(1), dummy,
                            jnp.zeros((N, 32)), jnp.ones((N, 1)), 1)
        eng = GridDeviceSimEngine(pm, pv["params"], policy, cfg, T, N)
        rms, batch, ep_raw = eng.collect(
            init_rms(N), pol_v["params"], jax.random.PRNGKey(2))
        return cfg, eng, policy, pol_v, batch, ep_raw

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

    def test_shapes_and_dtypes(self, setup):
        cfg, eng, _, _, batch, ep = setup
        T, N = batch["returns"].shape
        assert batch["obs"]["image"].shape == (T, N, 3, 96, 96)
        assert batch["obs"]["occupancy"].shape == (T, N, 1, 9, 9)
        assert batch["obs"]["occupancy"].dtype == jnp.uint8
        assert batch["actions"].shape == (T, N, 1)
        assert np.isfinite(np.asarray(ep)).all()

    def test_goal_feats_from_bank(self, setup):
        cfg, eng, _, _, batch, _ = setup
        gf = np.asarray(batch["obs"]["goal_sound_feat"])
        bank = np.asarray(eng.goal_bank).reshape(-1, gf.shape[-1])
        for row in gf[0]:
            assert np.abs(bank - row[None]).sum(axis=1).min() < 1e-5
