"""Contract tests for the real-simulator adapters, driven by fake backends.

PyBullet and AI2-THOR are not installable here; these tests register
recording stand-ins (tests/fake_backends.py) in sys.modules and drive the
adapter logic end to end, pinning the API contract against the reference:

- IK calls carry the null-space limits (reference:
  Envs/pybullet/arms/tasks/fourInARow/kuka/robot_manipulators.py:204-223);
- camera render is cropped to columns 12:87 then resized to 96x96
  (robot_manipulators.py:155-183);
- rayTest hit uid maps to the object index (robot_manipulators.py:185-202);
- RL actions become clipped +/-0.02 m XY deltas (robot_manipulators.py:127-153);
- GetReachablePositions -> padded occupancy grid construction
  (Envs/ai2thor/RL_env_VAR.py:169-191);
- teleports / toggle metadata handling and task setup
  (RL_env_VAR.py:212-266).
"""
from __future__ import annotations

import numpy as np
import pytest

from tests.fake_backends import (
    FakeBulletClient,
    FakeThorController,
    install_fake_ai2thor,
    install_fake_pybullet,
)
from var_tpu.config import main_config


# ---------------------------------------------------------------------------
# PyBullet arm adapter


@pytest.fixture
def pb_env(monkeypatch):
    install_fake_pybullet(monkeypatch)
    from var_tpu.envs.adapters.pybullet_arm import PyBulletFourInARow

    cfg = main_config(env="arms")
    cfg.override(RLTrain=True, RLModelFineTune=False)
    env = PyBulletFourInARow(cfg, audio=None)
    env._connect()
    return env, FakeBulletClient.instances[-1], cfg


def test_pybullet_connect_loads_models(pb_env):
    env, client, cfg = pb_env
    assert client.connection_mode == FakeBulletClient.DIRECT  # headless
    (sdf_call,) = client.calls_named("loadSDF")
    assert sdf_call[1][0].endswith("kuka_with_gripper2.sdf")
    urdfs = [c[1][0] for c in client.calls_named("loadURDF")]
    assert any(u.endswith("table.urdf") for u in urdfs)
    assert len(env.objUids) == len(cfg.objList)
    # physics params (reference: scene_abstract.py:8-49)
    assert client.calls_named("setGravity")[0][1] == (0, 0, -9.8)
    assert client.calls_named("setTimeStep")[0][1] == (1.0 / 240.0,)
    assert client.calls_named("setPhysicsEngineParameter")[0][2] == {
        "numSolverIterations": 30}


def test_pybullet_ik_nullspace_contract(pb_env):
    env, client, cfg = pb_env
    env._move_ee(0.6, 0.12)
    (ik,) = client.calls_named("calculateInverseKinematics")
    _, args, kwargs = ik
    assert args[0] == env.robotId
    assert args[1] == cfg.endEffectorIndex
    assert args[2] == [0.6, 0.12, cfg.endEffectorHeight]
    assert kwargs["lowerLimits"] == cfg.ik_ll
    assert kwargs["upperLimits"] == cfg.ik_ul
    assert kwargs["jointRanges"] == cfg.ik_jr
    assert kwargs["restPoses"] == cfg.ik_rp
    assert kwargs["jointDamping"] == cfg.ik_jd
    # position control on every joint through the end effector
    motor_calls = client.calls_named("setJointMotorControl2")
    assert len(motor_calls) == cfg.endEffectorIndex + 1
    for _, args, kwargs in motor_calls:
        assert kwargs["force"] == cfg.positionControlMaxForce
    # one sim step per frameSkip
    assert len(client.calls_named("stepSimulation")) == cfg.frameSkip
    # perfect-IK fake: the ee lands on the target
    assert np.allclose(env.ee, [0.6, 0.12])


def test_pybullet_action_clipping(pb_env):
    env, client, cfg = pb_env
    env.ee = np.array([0.55, 0.0])
    env._apply_action_rl(np.array([5.0, -5.0]))  # clipped to +/-1 then 0.02 m
    (ik,) = client.calls_named("calculateInverseKinematics")
    assert np.allclose(ik[1][2][:2], [0.57, -0.02])


def test_pybullet_raytest_uid_mapping(pb_env):
    env, client, cfg = pb_env
    client.ray_hit_uid = env.objUids[2]
    assert env.ray_test() == 2
    client.ray_hit_uid = env.tableUid
    assert env.ray_test() == -1
    # the ray starts at the gripper and ends below the table
    _, args, _ = client.calls_named("rayTest")[-1]
    assert args[1][2] == -0.1


def test_pybullet_camera_crop_resize(pb_env):
    import cv2

    env, client, cfg = pb_env
    img = env.get_image()
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    h, w, _ = cfg.robotCamRenderSize
    (cam,) = client.calls_named("getCameraImage")
    assert cam[1][:2] == (w, h)
    assert cam[2]["renderer"] == FakeBulletClient.ER_TINY_RENDERER
    rgb = client.camera_image[:, :, :3]
    expected = cv2.resize(rgb[:, 12:87], (96, 96))
    assert np.array_equal(img, expected)


def test_pybullet_full_episode(monkeypatch):
    """reset -> step drives the inherited task logic on fake physics."""
    install_fake_pybullet(monkeypatch)
    from var_tpu.envs.adapters.pybullet_arm import PyBulletFourInARow

    cfg = main_config(env="arms")
    cfg.override(RLTrain=True, RLModelFineTune=False, RLEnvMaxSteps=3)
    env = PyBulletFourInARow(cfg, audio=None)
    env.seed(0)
    obs = env.reset()
    assert obs["image"].shape == tuple(cfg.img_dim)
    assert obs["goal_sound"].shape == tuple(cfg.sound_dim)
    client = FakeBulletClient.instances[-1]
    # object poses were pushed into the simulator
    resets = client.calls_named("resetBasePositionAndOrientation")
    assert len(resets) >= len(cfg.objList)
    for t in range(3):
        obs, reward, done, info = env.step(np.array([0.5, -0.5]))
    assert done
    env.close()
    assert client.calls_named("disconnect")


def test_pybullet_pretext_episode(monkeypatch):
    install_fake_pybullet(monkeypatch)
    from var_tpu.envs.adapters.pybullet_arm import PyBulletFourInARowPretext

    cfg = main_config(env="arms")
    cfg.override(pretextEnvMaxSteps=2)
    env = PyBulletFourInARowPretext(cfg, audio=None)
    env.seed(0)
    obs = env.reset()
    assert set(obs) >= {"image", "ground_truth", "sound_negative_id"}
    obs, reward, done, info = env.step(np.zeros(2, np.float32))
    assert int(obs["ground_truth"][0]) in range(cfg.taskNum + 1)
    env.close()


# ---------------------------------------------------------------------------
# AI2-THOR adapter


@pytest.fixture
def thor_env(monkeypatch):
    install_fake_ai2thor(monkeypatch)
    from var_tpu.envs.adapters.ithor import ITHOREnv

    cfg = main_config(env="ai2thor")
    cfg.override(RLTrain=True, RLModelFineTune=False, renderUnity=False)
    env = ITHOREnv(cfg, audio=None)
    env.floor_plan = 201
    env._build_world()
    return env, FakeThorController.instances[-1], cfg


def test_ithor_controller_init_contract(thor_env):
    env, ctrl, cfg = thor_env
    k = ctrl.init_kwargs
    assert k["scene"] == "FloorPlan201"
    assert k["gridSize"] == cfg.gridSize[201]
    assert k["rotateStepDegrees"] == cfg.rotateStepDegrees
    assert k["fieldOfView"] == cfg.fieldOfView
    assert k["width"] == cfg.img_dim[2] and k["height"] == cfg.img_dim[1]
    assert k["platform"] is not None  # renderUnity=False -> CloudRendering


def test_ithor_occupancy_grid_from_reachable(thor_env):
    """GetReachablePositions -> padded grid with 0 at exactly the
    reachable cells (reference: RL_env_VAR.py:169-191)."""
    env, ctrl, cfg = thor_env
    g = cfg.gridSize[201]
    pad = cfg.RLVisibleGrid + 3
    occ = env.occupancy_grid
    xs = sorted({p["x"] for p in ctrl.reachable})
    zs = sorted({p["z"] for p in ctrl.reachable})
    assert occ.shape == (len(zs) + 2 * pad, len(xs) + 2 * pad)
    assert int((occ == 0).sum()) == len(ctrl.reachable)
    # a specific reachable cell: highest z -> top row of the free block
    rows, cols = occ.shape
    min_xz = env.min_xz[201]
    for p in ctrl.reachable:
        r = rows - int(round((p["z"] - min_xz[1]) / g)) - 1
        c = int(round((p["x"] - min_xz[0]) / g))
        assert occ[r, c] == 0


def test_ithor_teleport_lands_on_reachable(thor_env):
    env, ctrl, cfg = thor_env
    env.np_random = np.random.RandomState(3)
    env._random_teleport()
    tele = [c for c in ctrl.calls if c[0] == "Teleport"]
    assert tele and ctrl.last_event.metadata["lastActionSuccess"]
    pos = ctrl.agent["position"]
    assert any(abs(p["x"] - pos["x"]) < 1e-6 and abs(p["z"] - pos["z"]) < 1e-6
               for p in ctrl.reachable)
    assert ctrl.agent["rotation"]["y"] % cfg.rotateStepDegrees == 0


def test_ithor_setup_task_forces_opposite_state(thor_env):
    from var_tpu.envs.grid_sim import Task

    env, ctrl, cfg = thor_env
    env.np_random = np.random.RandomState(0)
    env.task = Task("livingRoom", "FloorLamp", "ToggleObjectOn")
    ctrl.objects["FloorLamp"]["isToggled"] = True
    env._setup_task()
    # commanded ToggleObjectOn -> the lamp must START off (RL_env_VAR.py:251-266)
    assert ctrl.objects["FloorLamp"]["isToggled"] is False
    assert env.check_task_done() is False
    ctrl.objects["FloorLamp"]["isToggled"] = True
    ctrl.step(action="Pass")  # refresh last_event metadata
    assert env.check_task_done() is True


def test_ithor_toggle_targets_visible_object(thor_env):
    env, ctrl, cfg = thor_env
    ctrl.objects["FloorLamp"]["visible"] = True
    ctrl.objects["Television"]["visible"] = False
    env._exe_action("ToggleObjectOn")
    toggles = [c for c in ctrl.calls if c[0] == "ToggleObjectOn"]
    assert toggles[-1][1]["objectId"] == "FloorLamp|1"
    # frame refresh after every action (RL_env_VAR.py:598)
    assert ctrl.calls[-1][0] == "Pass"


def test_ithor_local_occupancy_map(thor_env):
    env, ctrl, cfg = thor_env
    ctrl.agent["position"] = {"x": 1.25, "y": 0.9, "z": 2.0}
    ctrl.agent["rotation"] = {"x": 0.0, "y": 0.0, "z": 0.0}
    local = env.get_local_occupancy_map()
    n = cfg.RLVisibleGrid
    assert local.shape == (n, n)
    assert local[n // 2, n // 2] == 128  # agent marker
    # the agent's own cell is reachable -> its neighbors inside the block
    # are free (0), the far padding is occupied (255)
    assert local[0, 0] == 255


def test_ithor_image_resized(thor_env):
    env, ctrl, cfg = thor_env
    img = env.get_image()
    assert img.shape == (96, 96, 3)


def test_ithor_domain_randomization_toggles(thor_env):
    env, ctrl, cfg = thor_env
    env.np_random = np.random.RandomState(1)
    before = len(ctrl.calls)
    env._domain_randomization()
    names = [c[0] for c in ctrl.calls[before:]]
    assert "Teleport" in names  # randomInitialPose
    assert any(n in ("ToggleObjectOn", "ToggleObjectOff") for n in names)


def test_pybullet_debug_draw_helpers(pb_env):
    # reference: env_bases.py:135-212 — rectangle (4 green width-5 lines on
    # the z plane), grid (interior blue width-3 lines), AABB (12 edges,
    # axis colors at the min corner)
    env, client, cfg = pb_env
    lines = []
    env.drawRectangleDebug(lines, 0.0, 1.0, -0.5, 0.5, 0.2)
    rect = client.calls_named("addUserDebugLine")
    assert len(rect) == 4 and len(lines) == 4
    assert all(c[1][2] == (0, 1, 0) and c[2]["lineWidth"] == 5 for c in rect)
    assert all(c[1][0][2] == 0.2 and c[1][1][2] == 0.2 for c in rect)

    client.calls.clear()
    grid = []
    env.drawGrid(grid, 0.25, 0.0, 1.0, 0.0, 1.0, 0.1)
    gcalls = client.calls_named("addUserDebugLine")
    # arange(0,1,0.25) -> 4 points -> 3 interior lines per axis
    assert len(gcalls) == 6 == len(grid)
    assert all(c[1][2] == (0, 0, 1) and c[2]["lineWidth"] == 3
               for c in gcalls)

    client.calls.clear()
    env.drawAABB(((0.0, 0.0, 0.0), (1.0, 2.0, 3.0)))
    acalls = client.calls_named("addUserDebugLine")
    assert len(acalls) == 12
    colors = [c[1][2] for c in acalls]
    assert colors.count((1, 0, 0)) == 1  # x axis edge
    assert colors.count((0, 1, 0)) == 1  # y axis edge
    assert colors.count((0, 0, 1)) == 1  # z axis edge
    assert colors.count((1.0, 0.5, 0.5)) == 1
    assert colors.count((1, 1, 1)) == 8
    # every edge is axis-aligned with length matching the box extents
    import numpy as np

    for _, (s, e, _c), _k in acalls:
        d = np.abs(np.array(e) - np.array(s))
        assert (d > 0).sum() == 1 and d.max() in (1.0, 2.0, 3.0)
