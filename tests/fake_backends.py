"""In-memory stand-ins for the real simulator packages.

These let the adapter logic in var_tpu/envs/adapters/ be contract-tested
without installing PyBullet or AI2-THOR (neither is installable here):
`install_fake_pybullet()` / `install_fake_ai2thor()` register module
objects in sys.modules that record every call and return canned physics
/ metadata, mirroring the slices of the real APIs the adapters touch
(reference: Envs/pybullet/arms/tasks/fourInARow/kuka/
robot_manipulators.py:127-223, Envs/ai2thor/RL_env_VAR.py:169-302).
"""
from __future__ import annotations

import sys
import types

import numpy as np


# ---------------------------------------------------------------------------
# PyBullet


class FakeBulletClient:
    """Records calls; emulates perfect position control (the link lands on
    the IK target) and configurable ray hits."""

    GUI = 1
    DIRECT = 2
    POSITION_CONTROL = 21
    ER_TINY_RENDERER = 65536

    instances: list = []

    def __init__(self, connection_mode=None):
        self.connection_mode = connection_mode
        self.calls = []
        self._next_uid = 100
        self.link_pos = [0.55, 0.0, 0.22]
        self.ray_hit_uid = -1
        self.camera_image = None  # (h, w, 4) uint8; default gradient
        FakeBulletClient.instances.append(self)

    def _rec(self, name, *args, **kwargs):
        self.calls.append((name, args, kwargs))

    def calls_named(self, name):
        return [c for c in self.calls if c[0] == name]

    # -- world setup ---------------------------------------------------------

    def setGravity(self, *a, **k):
        self._rec("setGravity", *a, **k)

    def setPhysicsEngineParameter(self, *a, **k):
        self._rec("setPhysicsEngineParameter", *a, **k)

    def setTimeStep(self, *a, **k):
        self._rec("setTimeStep", *a, **k)

    def loadSDF(self, path):
        self._rec("loadSDF", path)
        self._next_uid += 1
        return [self._next_uid]

    def loadURDF(self, path, *a, **k):
        self._rec("loadURDF", path, *a, **k)
        self._next_uid += 1
        return self._next_uid

    def resetBasePositionAndOrientation(self, uid, pos, orn):
        self._rec("resetBasePositionAndOrientation", uid, list(pos), list(orn))

    def getQuaternionFromEuler(self, euler):
        self._rec("getQuaternionFromEuler", list(euler))
        return [0.0, 1.0, 0.0, 0.0]

    # -- control/kinematics ----------------------------------------------------

    def calculateInverseKinematics(self, uid, ee_index, target, orn, **kwargs):
        self._rec("calculateInverseKinematics", uid, ee_index, list(target),
                  list(orn), **kwargs)
        # perfect IK: remember the target so getLinkState reports arrival
        self.link_pos = [float(target[0]), float(target[1]), float(target[2])]
        return tuple(0.1 * i for i in range(ee_index + 1))

    def setJointMotorControl2(self, *a, **k):
        self._rec("setJointMotorControl2", *a, **k)

    def stepSimulation(self):
        self._rec("stepSimulation")

    def getLinkState(self, uid, index):
        self._rec("getLinkState", uid, index)
        return (tuple(self.link_pos), (0, 0, 0, 1), None, None, None, None)

    def rayTest(self, src, dst):
        self._rec("rayTest", list(src), list(dst))
        return [(self.ray_hit_uid, -1, 0.5, tuple(dst), (0, 0, 1))]

    # -- camera ----------------------------------------------------------------

    def computeViewMatrix(self, **k):
        self._rec("computeViewMatrix", **k)
        return tuple(np.eye(4).ravel())

    def computeProjectionMatrixFOV(self, **k):
        self._rec("computeProjectionMatrixFOV", **k)
        return tuple(np.eye(4).ravel())

    def getCameraImage(self, w, h, view, proj, renderer=None):
        self._rec("getCameraImage", w, h, renderer=renderer)
        if self.camera_image is None:
            rgba = np.zeros((h, w, 4), np.uint8)
            rgba[..., 0] = np.arange(w, dtype=np.uint32)[None, :] % 256
            rgba[..., 1] = np.arange(h, dtype=np.uint32)[:, None] % 256
            rgba[..., 2] = 7
            rgba[..., 3] = 255
            self.camera_image = rgba
        return (w, h, self.camera_image.ravel(), None, None)

    def addUserDebugLine(self, start, end, color, lineWidth=1):
        self._rec("addUserDebugLine", list(start), list(end), tuple(color),
                  lineWidth=lineWidth)
        self._next_uid += 1
        return self._next_uid

    def disconnect(self):
        self._rec("disconnect")


def install_fake_pybullet(monkeypatch):
    """Register fake pybullet/pybullet_data/pybullet_utils modules."""
    FakeBulletClient.instances.clear()
    pb = types.ModuleType("pybullet")
    pb.GUI = FakeBulletClient.GUI
    pb.DIRECT = FakeBulletClient.DIRECT
    pb.POSITION_CONTROL = FakeBulletClient.POSITION_CONTROL
    pb.ER_TINY_RENDERER = FakeBulletClient.ER_TINY_RENDERER
    pb.getQuaternionFromEuler = lambda e: [0.0, 1.0, 0.0, 0.0]
    pbd = types.ModuleType("pybullet_data")
    pbd.getDataPath = lambda: "/tmp"
    pbu = types.ModuleType("pybullet_utils")
    pbu_bc = types.ModuleType("pybullet_utils.bullet_client")
    pbu_bc.BulletClient = FakeBulletClient
    pbu.bullet_client = pbu_bc
    for name, mod in (("pybullet", pb), ("pybullet_data", pbd),
                      ("pybullet_utils", pbu),
                      ("pybullet_utils.bullet_client", pbu_bc)):
        monkeypatch.setitem(sys.modules, name, mod)
    return pb


# ---------------------------------------------------------------------------
# AI2-THOR


class FakeEvent:
    def __init__(self, metadata, frame=None):
        self.metadata = metadata
        self.frame = frame if frame is not None else np.zeros(
            (300, 300, 3), np.uint8)


class FakeThorController:
    """Canned iTHOR server: reachable positions on a grid, two toggleable
    objects, teleports always succeed."""

    instances: list = []

    def __init__(self, reachable=None, grid=0.25, **kwargs):
        self.init_kwargs = kwargs
        self.calls = []
        self.grid = grid
        # default: a 3x2 block of reachable positions
        self.reachable = reachable if reachable is not None else [
            {"x": 1.0 + i * grid, "y": 0.9, "z": 2.0 + j * grid}
            for i in range(3) for j in range(2)
        ]
        self.agent = {"position": {"x": 1.0, "y": 0.9, "z": 2.0},
                      "rotation": {"x": 0.0, "y": 0.0, "z": 0.0}}
        self.objects = {
            "FloorLamp": {"objectType": "FloorLamp", "objectId": "FloorLamp|1",
                          "visible": True, "isToggled": False},
            "Television": {"objectType": "Television",
                           "objectId": "Television|1", "visible": False,
                           "isToggled": True},
        }
        self.last_event = self._event(True)
        FakeThorController.instances.append(self)

    def _event(self, success, action_return=None):
        return FakeEvent({
            "lastActionSuccess": success,
            "actionReturn": action_return,
            "agent": {k: dict(v) for k, v in self.agent.items()},
            "objects": [dict(o) for o in self.objects.values()],
        })

    def reset(self, **kwargs):
        self.calls.append(("reset", kwargs))
        self.last_event = self._event(True)
        return self.last_event

    def step(self, action=None, **kwargs):
        self.calls.append((action, kwargs))
        success = True
        action_return = None
        if action == "GetReachablePositions":
            action_return = [dict(p) for p in self.reachable]
        elif action == "Teleport":
            pos = kwargs["position"]
            ok = any(abs(p["x"] - pos["x"]) < 1e-6
                     and abs(p["z"] - pos["z"]) < 1e-6 for p in self.reachable)
            success = ok
            if ok:
                self.agent["position"] = dict(pos)
                self.agent["rotation"] = dict(kwargs.get(
                    "rotation", self.agent["rotation"]))
        elif action in ("ToggleObjectOn", "ToggleObjectOff"):
            oid = kwargs.get("objectId")
            for o in self.objects.values():
                if o["objectId"] == oid:
                    o["isToggled"] = action == "ToggleObjectOn"
        self.last_event = self._event(success, action_return)
        return self.last_event

    def stop(self):
        self.calls.append(("stop", {}))


def install_fake_ai2thor(monkeypatch, controller_cls=FakeThorController):
    FakeThorController.instances.clear()
    pkg = types.ModuleType("ai2thor")
    ctrl_mod = types.ModuleType("ai2thor.controller")
    ctrl_mod.Controller = controller_cls
    plat_mod = types.ModuleType("ai2thor.platform")
    plat_mod.CloudRendering = object()
    pkg.controller = ctrl_mod
    pkg.platform = plat_mod
    for name, mod in (("ai2thor", pkg), ("ai2thor.controller", ctrl_mod),
                      ("ai2thor.platform", plat_mod)):
        monkeypatch.setitem(sys.modules, name, mod)
    return ctrl_mod
