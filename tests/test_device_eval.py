"""Device-resident deterministic evaluation (rl/device_sim.py eval_batch
+ train/rl.py _test_device_sim): the forced-intent reset, the per-step
trajectory, and the success rule must match the host testRL stack
(reference: VAR/RL_VAR.py:35-75 round-robin eval;
Envs/pybullet/arms/tasks/fourInARow/fourInARow.py:317-335 final-step
ray-test success; Envs/ai2thor/RL_env_VAR.py:623-636 checkTaskDone)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from var_tpu.config import gym_register, main_config
from var_tpu.envs import spaces as S
from var_tpu.models.encoders import build_pretext_model, init_pretext_params
from var_tpu.models.policy import build_policy


def _arm_setup(T=6, N=4, seed=0):
    from var_tpu.rl.device_sim import DeviceSimEngine

    cfg = main_config(env="arms")
    cfg.override(RLTrain=False, RLEnvMaxSteps=T, ppoNumSteps=T,
                 RLNumEnvs=N, RLRecurrentSize=32, RLRecurrentInputSize=16)
    gym_register(cfg, env="arms")
    pm = build_pretext_model(cfg)
    var_params = init_pretext_params(
        pm, cfg, jax.random.PRNGKey(seed))["params"]
    high = np.ones(cfg.RLActionDim, np.float32)
    policy = build_policy(cfg, S.Box(-high, high, dtype=np.float32))
    dummy = {"robot_pose": jnp.zeros((N, 2)),
             "goal_sound_feat": jnp.zeros((N, cfg.representationDim)),
             "image": jnp.zeros((N,) + tuple(cfg.img_dim), jnp.uint8),
             "image_feat": jnp.zeros((N, cfg.representationDim))}
    pv = policy.init(jax.random.PRNGKey(1), dummy, jnp.zeros((N, 32)),
                     jnp.ones((N, 1)), 1)
    eng = DeviceSimEngine(pm, var_params, policy, cfg, T, N)
    return cfg, eng, policy, pv


def test_arm_device_eval_matches_host_trajectory():
    """Cross-stack parity: the eval program's trajectory, final-step
    ray-test success, goal counts and raw reward sums equal a host
    replication that renders with FourInARowSim.get_image, steps with
    _apply_action_rl and ray-tests with FourInARowSim.ray_test from the
    SAME initial state and goal embeddings."""
    from var_tpu.envs import arm_sim_device as dev
    from var_tpu.envs.arm_sim import FourInARowSim

    T, N = 6, 4
    cfg, eng, policy, pv = _arm_setup(T, N)
    intent = jnp.asarray([0, 1, 2, 3], jnp.int32)
    key = jax.random.PRNGKey(42)
    success, counts, raw = eng.eval_batch(pv["params"], intent, key)

    # replicate the program's reset exactly (same key-split sequence)
    kr, kc, _ = jax.random.split(key, 3)
    obj_pose, obj_order, ee0 = dev.randomize(kr, N, eng.k)
    obj_pose = np.asarray(obj_pose)
    clip = jax.random.randint(kc, (N,), 0, eng.goal_bank.shape[1])
    goal_feat = np.asarray(
        eng.goal_bank[np.asarray(intent), np.asarray(clip)])

    host = FourInARowSim(cfg)
    host.seed(0)

    def render_host(e, ee):
        host.objPose = obj_pose[e].astype(np.float64)
        host.ee = ee[e].astype(np.float64)
        return host.get_image()  # HWC u8

    # lockstep host stepping with the same batched policy math
    ee = np.asarray(ee0, np.float32).copy()
    hx = jnp.zeros((N, eng.hidden))
    raw_sum = np.zeros(N)
    for _ in range(T):
        frames = np.stack([render_host(e, ee) for e in range(N)])
        img = jnp.asarray(np.transpose(frames, (0, 3, 1, 2)))
        ifeat = eng._encode_image(eng.var_params, img)
        obs = {"robot_pose": jnp.asarray(ee, jnp.float32),
               "goal_sound_feat": jnp.asarray(goal_feat),
               "image": img, "image_feat": ifeat}
        _, action, _, hx = eng._act(pv["params"], obs, hx,
                                    jnp.ones((N, 1)), key, True)
        action = np.asarray(action)
        for e in range(N):
            host.objPose = obj_pose[e].astype(np.float64)
            host.ee = ee[e].astype(np.float64).copy()
            host._apply_action_rl(action[e])
            ee[e] = np.asarray(host.ee, np.float32)
        frames2 = np.stack([render_host(e, ee) for e in range(N)])
        img2 = jnp.asarray(np.transpose(frames2, (0, 3, 1, 2)))
        ifeat2 = np.asarray(eng._encode_image(eng.var_params, img2))
        raw_sum += np.sum(ifeat2[:, :eng.D] * goal_feat, axis=1)

    exp = []
    for e in range(N):
        host.objPose = obj_pose[e].astype(np.float64)
        host.objOrder = {i: int(obj_order[e, i])
                         for i in range(eng.k.n_obj)}
        host.ee = ee[e].astype(np.float64)
        hit = host.ray_test()
        exp.append(bool(hit >= 0
                        and host.objOrder[hit] == int(intent[e])))
    np.testing.assert_array_equal(np.asarray(success), exp)
    np.testing.assert_array_equal(np.asarray(counts),
                                  np.asarray(exp, np.int32))
    np.testing.assert_allclose(np.asarray(raw), raw_sum,
                               rtol=1e-4, atol=1e-4)


def test_arm_device_eval_respects_intents():
    """The FORCED intent must actually flow into the compiled eval
    program (goal_feat = bank[intent] feeds both the policy obs and the
    reward): the same key with two different intent vectors must yield
    different raw reward sums. A mutation that ignores `intent` (e.g.
    always gathering bank[0]) makes both calls identical and fails
    this test."""
    _, eng, _, pv = _arm_setup(T=2, N=4)
    key = jax.random.PRNGKey(7)
    _, _, raw_a = eng.eval_batch(
        pv["params"], jnp.asarray([0, 1, 2, 3], jnp.int32), key)
    _, _, raw_b = eng.eval_batch(
        pv["params"], jnp.asarray([3, 2, 1, 0], jnp.int32), key)
    # identical reset/keys, different commanded classes -> different
    # goal embeddings -> different reward sums (goal_bank rows are
    # distinct normalized embeddings of distinct synthetic clips)
    assert not np.allclose(np.asarray(raw_a), np.asarray(raw_b))


def _grid_setup(T=5, N=4, seed=0):
    from var_tpu.rl.device_sim import GridDeviceSimEngine

    cfg = main_config(env="ai2thor")
    cfg.override(RLTrain=False, RLEnvMaxSteps=T, ppoNumSteps=T,
                 RLNumEnvs=N, RLRecurrentSize=32, RLRecurrentInputSize=16)
    gym_register(cfg, env="ai2thor")
    pm = build_pretext_model(cfg)
    var_params = init_pretext_params(
        pm, cfg, jax.random.PRNGKey(seed))["params"]
    policy = build_policy(cfg, S.Discrete(len(cfg.allActions)))
    dummy = {"occupancy": jnp.zeros((N, 1, cfg.RLVisibleGrid,
                                     cfg.RLVisibleGrid), jnp.uint8),
             "goal_sound_feat": jnp.zeros((N, cfg.representationDim)),
             "image": jnp.zeros((N,) + tuple(cfg.img_dim), jnp.uint8),
             "image_feat": jnp.zeros((N, cfg.representationDim))}
    pv = policy.init(jax.random.PRNGKey(1), dummy, jnp.zeros((N, 32)),
                     jnp.ones((N, 1)), 1)
    eng = GridDeviceSimEngine(pm, var_params, policy, cfg, T, N)
    return cfg, eng, policy, pv


@pytest.fixture(scope="module")
def grid_setup():
    return _grid_setup()


def test_grid_reset_with_task_forces_opposite_state(grid_setup):
    """reset_with_task: the commanded object's toggle state is forced
    OPPOSITE to the commanded act (reference RL_env_VAR.py:251-266
    setupTask), positions land on free cells, and the task ids pass
    through unchanged."""
    from var_tpu.envs import grid_sim_device as dev

    cfg, eng, _, _ = grid_setup
    n_tasks = len(eng.task_list)
    task_id = jnp.asarray(np.arange(16) % n_tasks, jnp.int32)
    plan, pos, rot, tog = dev.reset_with_task(
        eng.bank, jax.random.PRNGKey(3), task_id, eng.task_obj,
        eng.task_on, cfg)
    tog = np.asarray(tog)
    obj = np.asarray(eng.task_obj)[np.asarray(task_id)]
    want = ~np.asarray(eng.task_on)[np.asarray(task_id)]
    np.testing.assert_array_equal(tog[np.arange(16), obj], want)
    free = np.asarray(dev.free_at(eng.bank, plan, pos))
    assert free.all()
    assert (np.asarray(rot) >= 0).all() and (np.asarray(rot) < 8).all()


def test_grid_device_eval_matches_eager_replay(grid_setup):
    """The jitted eval scan equals an eager step-by-step replay using the
    same grid kernels and policy math — pins the goal-count accumulation
    (count after EVERY action, the host grid_sim.step eval branch) and
    the success threshold inside the compiled program."""
    from var_tpu.envs import grid_sim_device as dev

    cfg, eng, policy, pv = grid_setup
    T, N = eng.T, eng.N
    n_tasks = len(eng.task_list)
    task_id = jnp.asarray(np.arange(N) % n_tasks, jnp.int32)
    key = jax.random.PRNGKey(11)
    success, counts, raw = eng.eval_batch(pv["params"], task_id, key)

    kr, kc, _ = jax.random.split(key, 3)
    plan, pos, rot, tog = dev.reset_with_task(
        eng.bank, kr, task_id, eng.task_obj, eng.task_on, cfg)
    clip = jax.random.randint(kc, (N,), 0, eng.goal_bank.shape[1])
    goal_feat = eng.goal_bank[task_id, clip]
    obj = eng.task_obj[task_id]
    want_on = eng.task_on[task_id]

    img = dev.render_chw(eng.bank, plan, pos, rot, tog, cfg)
    occ = dev.local_occupancy(eng.bank, plan, pos, rot, cfg)
    ifeat = eng._encode_image(eng.var_params, img)
    hx = jnp.zeros((N, eng.hidden))
    raw_sum = np.zeros(N)
    cnt = np.zeros(N, np.int64)
    for _ in range(T):
        obs = {"occupancy": occ, "goal_sound_feat": goal_feat,
               "image": img, "image_feat": ifeat}
        _, action, _, hx = eng._act(pv["params"], obs, hx,
                                    jnp.ones((N, 1)), key, True)
        pos, rot, tog = dev.exe_action(eng.bank, plan, pos, rot, tog,
                                       action, cfg)
        done_now = np.asarray(jnp.take_along_axis(
            tog, obj[:, None], axis=1)[:, 0] == want_on)
        cnt += done_now
        img = dev.render_chw(eng.bank, plan, pos, rot, tog, cfg)
        occ = dev.local_occupancy(eng.bank, plan, pos, rot, cfg)
        ifeat = eng._encode_image(eng.var_params, img)
        raw_sum += np.asarray(
            jnp.sum(ifeat[:, :eng.D] * goal_feat, axis=1))

    np.testing.assert_array_equal(np.asarray(counts), cnt)
    np.testing.assert_array_equal(
        np.asarray(success), cnt >= int(cfg.success_threshold))
    np.testing.assert_allclose(np.asarray(raw), raw_sum,
                               rtol=1e-4, atol=1e-4)


def test_grid_success_rule_matches_host_check_task_done(grid_setup):
    """The device rule (toggled[obj] == want_on) is exactly the host
    GridHouseSim.check_task_done for every (task, toggle-state) combo."""
    from var_tpu.envs.grid_sim import GridHouseSim
    from var_tpu.envs import grid_sim_device as dev

    cfg, eng, _, _ = grid_setup
    host = GridHouseSim(cfg)
    host.seed(5)
    host.reset()
    for tid, task in enumerate(eng.task_list):
        for bits in range(4):
            tog = np.array([(bits >> i) & 1 for i in range(2)], bool)
            host.task = task
            for i, name in enumerate(dev.OBJ_NAMES):
                host.objects[name]["isToggled"] = bool(tog[i])
            expected = host.check_task_done()
            got = bool(tog[int(eng.task_obj[tid])]
                       == bool(eng.task_on[tid]))
            assert got == expected, (task, tog.tolist())


def test_trainer_device_sim_eval_csv(tmp_path):
    """testRL with RLDeviceSimEval=True: rate is a valid frequency, the
    CSV lands at test_<ckpt>_devicesim.csv (never shadowing the canonical
    host-evaluated CSV), rows follow the per-class round-robin blocks
    scaled by num_envs, and a missing checkpoint still raises."""
    from var_tpu.train.checkpoint import save_checkpoint
    from var_tpu.train.rl import RLTrainer

    cfg = main_config(env="arms")
    cfg.override(RLTrain=False, RLModelFineTune=False,
                 RLEnvMaxSteps=4, ppoNumSteps=4, RLNumEnvs=2,
                 RLRecurrentSize=32, RLRecurrentInputSize=16,
                 RLDeviceSimEval=True,
                 soundSource={"dataset": ["GoogleCommand"],
                              "max_sound_dur": {"GoogleCommand": 6.0},
                              "items": {"GoogleCommand":
                                        ["zero", "one", "two", "three"]},
                              "size": {"GoogleCommand": [1, 1, 1, 1]},
                              "train_test": "train"})
    gym_register(cfg, env="arms")
    trainer = RLTrainer(cfg, env="arms")
    trainer.pretext_params = init_pretext_params(
        trainer.pretext_model, cfg, jax.random.PRNGKey(0))["params"]
    with pytest.raises(FileNotFoundError):
        trainer.testRL(policy_path=str(tmp_path / "nope"))

    high = np.ones(cfg.RLActionDim, np.float32)
    policy = build_policy(cfg, S.Box(-high, high, dtype=np.float32))
    dummy = {"robot_pose": jnp.zeros((1, 2)),
             "goal_sound_feat": jnp.zeros((1, cfg.representationDim)),
             "image": jnp.zeros((1,) + tuple(cfg.img_dim), jnp.uint8),
             "image_feat": jnp.zeros((1, cfg.representationDim))}
    pv = policy.init(jax.random.PRNGKey(0), dummy, jnp.zeros((1, 32)),
                     jnp.ones((1, 1)), 1)
    ckpt = str(tmp_path / "policy_ckpt")
    save_checkpoint(ckpt, {"params": pv["params"]})

    rate = trainer.testRL(policy_path=ckpt, num_envs=2)
    assert 0.0 <= rate <= 1.0
    import pandas as pd

    csv = tmp_path / "test_policy_ckpt_devicesim.csv"
    assert csv.exists()
    df = pd.read_csv(str(csv))
    # 4 round-robin slots (size_per_class [1,1,1,1]) x 2 envs
    assert len(df) == 8
    np.testing.assert_array_equal(
        df["objIdx"].to_numpy(), np.repeat(np.arange(4), 2))
    assert set(df.columns) == {"objIdx", "goal area count", "rewards",
                               "results"}
    assert not os.path.exists(str(tmp_path / "test_policy_ckpt.csv"))


def test_device_eval_refuses_adapter_backend():
    """RLDeviceSimEval compiles the BUILTIN sim; with an external adapter
    backend configured the device score would describe a different
    simulator than requested — testRL must refuse, not silently score."""
    from var_tpu.train.rl import RLTrainer

    cfg = main_config(env="arms")
    cfg.override(RLTrain=False, RLDeviceSimEval=True,
                 simBackend="pybullet")
    gym_register(cfg, env="arms")
    trainer = RLTrainer(cfg, env="arms")
    with pytest.raises(ValueError, match="simBackend"):
        trainer.testRL(policy_path="/nonexistent")
