"""Device-resident batched fourInARow simulator (pure jax.numpy).

The host builtin sim (var_tpu/envs/arm_sim.py, itself a behavioral rebuild
of the reference's PyBullet task — Envs/pybullet/arms/tasks/fourInARow/
fourInARow.py, robot_manipulators.py) is deterministic geometry: clipped
XY kinematics, axis-aligned box objects, a rasterized top-down camera,
and a point-in-box ray test. Nothing in it needs a CPU — so this module
re-implements the whole environment as batched jnp kernels that run on
the TPU itself. With the sim on device, an entire PPO rollout
(reset -> T steps of render/VAR-reward/policy-act -> GAE -> update)
compiles into ONE XLA program with zero per-step host round-trips
(var_tpu/rl/device_sim.py) — the tunnel's ~33 ms/step readback cost and
the simulator process pool disappear entirely.

Parity contract (tested in tests/test_arm_sim_device.py):
- `render` is PIXEL-IDENTICAL to FourInARowSim.get_image for the same
  (objPose, ee) state;
- `ray_test` matches FourInARowSim.ray_test on the same state;
- `apply_action` matches _apply_action_rl numerics (f32);
- `randomize` draws from the same distributions (ranges asserted; the
  PRNG stream differs — jax.random vs np.RandomState — by design).

A policy trained on this sim is therefore evaluated unchanged on the
host-path `testRL` (same geometry, same renders, same success rule).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# object footprint — keep in sync with arm_sim.OBJ_HALF_X/Y
OBJ_HALF_X = 0.035
OBJ_HALF_Y = 0.03
H = W = 96


class SimConsts(NamedTuple):
    """Static (python-float) workspace constants captured at trace time.

    Mirrors the reference kuka env_config ranges
    (Envs/pybullet/arms/tasks/fourInARow/kuka/env_config.py) as surfaced
    through config/arm.py.
    """

    x_min: float
    x_max: float
    y_min: float
    y_max: float
    obj_interval: float
    n_obj: int
    # uniform ranges, already folded with the workspace bounds
    rand_x_lo: float
    rand_x_hi: float
    rand_y_lo: float
    rand_y_hi: float
    objs_x_lo: float
    objs_x_hi: float
    objs_y_lo: float
    objs_y_hi: float
    ee_x_lo: float
    ee_x_hi: float
    ee_y_lo: float
    ee_y_hi: float


def consts_from_config(c) -> SimConsts:
    return SimConsts(
        x_min=float(c.xMin), x_max=float(c.xMax),
        y_min=float(c.yMin), y_max=float(c.yMax),
        obj_interval=float(c.objInterval), n_obj=len(c.objList),
        rand_x_lo=float(c.xMin + c.objXRand[0]),
        rand_x_hi=float(c.xMax + c.objXRand[1]),
        rand_y_lo=float(c.yMin + c.objYRand[0]),
        rand_y_hi=float(c.yMax + c.objYRand[1]),
        objs_x_lo=float(c.objsXRand[0]), objs_x_hi=float(c.objsXRand[1]),
        objs_y_lo=float(c.objsYRand[0]), objs_y_hi=float(c.objsYRand[1]),
        ee_x_lo=float(c.xMin + c.eeXInitRand[0]),
        ee_x_hi=float(c.xMax + c.eeXInitRand[1]),
        ee_y_lo=float(c.yMin + c.eeYInitRand[0]),
        ee_y_hi=float(c.yMax + c.eeYInitRand[1]),
    )


def randomize(key, n: int, k: SimConsts):
    """Batched object shuffle + pose/ee randomization
    (host twin: arm_sim._randomize, reference fourInARow.py:141-170).

    Returns (obj_pose (n, n_obj, 2) f32, obj_order (n, n_obj) i32,
    ee (n, 2) f32). obj_order[e, i] is the row-order class of object i —
    the same mapping as the host sim's objOrder dict.
    """
    k_rx, k_ry, k_perm, k_jx, k_jy, k_ee = jax.random.split(key, 6)
    randomx = jax.random.uniform(k_rx, (n, 1), minval=k.rand_x_lo,
                                 maxval=k.rand_x_hi)
    randomy = jax.random.uniform(k_ry, (n, 1), minval=k.rand_y_lo,
                                 maxval=k.rand_y_hi)
    obj_order = jax.vmap(
        lambda kk: jax.random.permutation(kk, k.n_obj))(
        jax.random.split(k_perm, n)).astype(jnp.int32)
    jx = jax.random.uniform(k_jx, (n, k.n_obj), minval=k.objs_x_lo,
                            maxval=k.objs_x_hi) if k.objs_x_hi > k.objs_x_lo \
        else jnp.zeros((n, k.n_obj))
    jy = jax.random.uniform(k_jy, (n, k.n_obj), minval=k.objs_y_lo,
                            maxval=k.objs_y_hi) if k.objs_y_hi > k.objs_y_lo \
        else jnp.zeros((n, k.n_obj))
    x = randomx + jx
    y = randomy + obj_order.astype(jnp.float32) * k.obj_interval + jy
    obj_pose = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    ee = jnp.stack([
        jax.random.uniform(k_ee, (n,), minval=k.ee_x_lo, maxval=k.ee_x_hi),
        jax.random.uniform(jax.random.fold_in(k_ee, 1), (n,),
                           minval=k.ee_y_lo, maxval=k.ee_y_hi),
    ], axis=-1).astype(jnp.float32)
    return obj_pose, obj_order, ee


def apply_action(ee, action, k: SimConsts):
    """2-D action -> clipped +/-0.02 m deltas, workspace-clipped
    (host twin: arm_sim._apply_action_rl, robot_manipulators.py:127-153)."""
    a = jnp.clip(action[..., :2], -1.0, 1.0)
    ee = ee + jnp.clip(a * 0.02, -0.02, 0.02)
    return jnp.stack([
        jnp.clip(ee[..., 0], k.x_min, k.x_max),
        jnp.clip(ee[..., 1], k.y_min, k.y_max),
    ], axis=-1)


def ray_test(obj_pose, ee):
    """(n,) i32: nearest object under the gripper, or -1
    (host twin: arm_sim.ray_test)."""
    d = jnp.abs(obj_pose - ee[:, None, :])  # (n, n_obj, 2)
    hit = (d[..., 0] <= OBJ_HALF_X) & (d[..., 1] <= OBJ_HALF_Y)
    dist = jnp.where(hit, jnp.linalg.norm(d, axis=-1), jnp.inf)
    idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    return jnp.where(hit.any(axis=-1), idx, jnp.int32(-1))


def _render_consts(k: SimConsts):
    x0, x1 = k.x_min - 0.08, k.x_max + 0.08
    y0, y1 = k.y_min - 0.12, k.y_max + 0.12
    hx = int(OBJ_HALF_X / (x1 - x0) * H) + 2
    hy = int(OBJ_HALF_Y / (y1 - y0) * W) + 2
    return x0, x1, y0, y1, hx, hy


def render(obj_pose, ee, k: SimConsts):
    """(n, 96, 96, 3) u8 top-down view, pixel-identical to
    FourInARowSim.get_image (table gray 70, golden keys, red gripper disc
    with a darker arm shadow toward the base)."""
    x0, x1, y0, y1, hx, hy = _render_consts(k)
    n = ee.shape[0]

    def to_px(x, y):
        r = jnp.clip(jnp.floor((x - x0) / (x1 - x0) * (H - 1)), 0, H - 1)
        c = jnp.clip(jnp.floor((y - y0) / (y1 - y0) * (W - 1)), 0, W - 1)
        return r.astype(jnp.int32), c.astype(jnp.int32)

    rr = jnp.arange(H)[None, :, None]   # (1, H, 1)
    cc = jnp.arange(W)[None, None, :]   # (1, 1, W)

    ro, co = to_px(obj_pose[..., 0], obj_pose[..., 1])  # (n, n_obj)
    obj_mask = (
        (rr[..., None] >= (ro[:, None, None, :] - hx))
        & (rr[..., None] < (ro[:, None, None, :] + hx))
        & (cc[..., None] >= (co[:, None, None, :] - hy))
        & (cc[..., None] < (co[:, None, None, :] + hy))
    ).any(axis=-1)  # (n, H, W)

    rg, cg = to_px(ee[:, 0], ee[:, 1])  # (n,)
    rg = rg[:, None, None]
    cg = cg[:, None, None]
    arm_mask = (cc <= cg) & (jnp.abs(rr - rg) <= 2)
    disc_mask = (rr - rg) ** 2 + (cc - cg) ** 2 <= 16

    img = jnp.full((n, H, W, 3), 70, dtype=jnp.uint8)
    key_color = jnp.asarray([200, 170, 40], jnp.uint8)
    arm_color = jnp.asarray([90, 40, 40], jnp.uint8)
    disc_color = jnp.asarray([220, 40, 40], jnp.uint8)
    img = jnp.where(obj_mask[..., None], key_color, img)
    img = jnp.where(arm_mask[..., None], arm_color, img)
    img = jnp.where(disc_mask[..., None], disc_color, img)
    return img


def render_chw(obj_pose, ee, k: SimConsts):
    """(n, 3, 96, 96) u8 — the obs-dict layout."""
    return jnp.transpose(render(obj_pose, ee, k), (0, 3, 1, 2))
