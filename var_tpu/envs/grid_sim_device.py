"""Device-resident batched grid (iTHOR-profile) simulator (pure jnp).

Companion to envs/arm_sim_device.py for the navigation+toggle task: the
host builtin grid sim (envs/grid_sim.py, a behavioral rebuild of the
reference's iTHOR env — Envs/ai2thor/RL_env_VAR.py) is deterministic
integer-grid geometry, so it ports to batched jnp kernels that run on
the TPU: discrete moves/rotations, fixed-count raycast rendering,
LUT-based egocentric occupancy rotation, FoV+line-of-sight visibility,
and toggle actions. With the sim on device, an entire PPO rollout is one
XLA program (rl/device_sim.py GridDeviceSimEngine) — no per-step host
round-trips and no env process pool.

Parity contract (tests/test_grid_sim_device.py): for the same env state,
`render` is PIXEL-IDENTICAL to GridHouseSim._render_numpy (which the
native C++ renderer is itself bit-identical to), `visible_mask` matches
visible_objects, `local_occupancy` matches get_local_occupancy_map, and
`move`/`toggle` match _exe_action.

Static per-floor-plan data (grids, padded occupancy, object cells, free
cells) is precomputed ONCE on the host by `build_plan_bank` and lives as
constant device arrays; per-episode randomization gathers from it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.envs.grid_sim import (CEIL_COLOR, FLOOR_COLOR, OBJ_COLORS,
                                   WALL_COLOR, _gen_room)

OBJ_NAMES = ("FloorLamp", "Television")  # host dict insertion order
H = W = 96
MAX_RANGE = 12.0
RAY_STEP = 0.15


class PlanBank(NamedTuple):
    """Per-floor-plan constants, stacked over the K training scenes."""

    grids: jnp.ndarray        # (K, 16, 16) u8
    occ_padded: jnp.ndarray   # (K, 16+2p, 16+2p) u8 (255 = occupied)
    obj_cells: jnp.ndarray    # (K, 2, 2) i32
    free_cells: jnp.ndarray   # (K, F, 2) i32 (padded with repeats)
    free_count: jnp.ndarray   # (K,) i32
    grid_size: jnp.ndarray    # (K,) f32  (meters per cell)
    rot_lut: jnp.ndarray      # (8, g, g) i32 flat source index per heading
    rot_valid: jnp.ndarray    # (8, g, g) bool (False = outside -> 0)


def build_plan_bank(config) -> PlanBank:
    """Host-side precompute mirroring GridHouseSim._build_world for every
    training floor plan (grid_sim.py:146-171) plus the 8 occupancy
    rotation LUTs (the crop angles are multiples of 45 deg, so
    ndimage.rotate order=0 is a fixed permutation-with-holes per
    heading — grid_sim.py:243-263)."""
    from scipy import ndimage

    c = config
    plans = list(c.allScene[next(iter(c.allTasks))])
    p = c.RLVisibleGrid + 3
    g = c.RLVisibleGrid
    grids, occs, objs, frees, fcounts, gsizes = [], [], [], [], [], []
    for fp in plans:
        grid = _gen_room(fp)
        occ = np.full((grid.shape[0] + 2 * p, grid.shape[1] + 2 * p), 255,
                      np.uint8)
        occ[p:p + grid.shape[0], p:p + grid.shape[1]] = grid * 255
        rng = np.random.RandomState(fp + 7777)
        free = np.argwhere(grid == 0)
        order = rng.permutation(len(free))
        cells = {}
        for name in OBJ_NAMES:
            for k in order:
                cell = free[k]
                if any((v == cell).all() for v in cells.values()):
                    continue
                cells[name] = cell.copy()
                break
            order = rng.permutation(len(free))
        obj_cells = np.stack([cells[n] for n in OBJ_NAMES])
        free_rc = np.array([f for f in free
                            if not any((f == v).all()
                                       for v in cells.values())])
        grids.append(grid)
        occs.append(occ)
        objs.append(obj_cells)
        frees.append(free_rc)
        fcounts.append(len(free_rc))
        gsizes.append(c.gridSize.get(fp, 0.25))
    fmax = max(fcounts)
    frees = [np.concatenate([f] * (-(-fmax // len(f))))[:fmax] for f in frees]

    luts, valids = [], []
    idx = np.arange(1, g * g + 1, dtype=np.int64).reshape(g, g)
    for k in range(8):
        rot = ndimage.rotate(idx, 180.0 - 45.0 * k, reshape=False, order=0)
        luts.append(np.where(rot > 0, rot - 1, 0))
        valids.append(rot > 0)
    return PlanBank(
        grids=jnp.asarray(np.stack(grids)),
        occ_padded=jnp.asarray(np.stack(occs)),
        obj_cells=jnp.asarray(np.stack(objs), jnp.int32),
        free_cells=jnp.asarray(np.stack(frees), jnp.int32),
        free_count=jnp.asarray(fcounts, jnp.int32),
        grid_size=jnp.asarray(gsizes, jnp.float32),
        rot_lut=jnp.asarray(np.stack(luts), jnp.int32),
        rot_valid=jnp.asarray(np.stack(valids)),
    )


def visible_mask(bank: PlanBank, plan, pos, rot_idx, config):
    """(N, 2) bool — per-object visibility (grid_sim.py visible_objects):
    within RLVisibilityDistance (meters), inside the 90-degree FoV, with
    line of sight sampled at the host's exact linspace points."""
    di = bank.obj_cells[plan] - pos[:, None, :]  # (N, 2obj, 2) int32
    n2 = di[..., 0] ** 2 + di[..., 1] ** 2  # |d|^2, exact integer
    # distance gate: n2 * gridSize^2 <= visDist^2 — all quantities exact
    # in f32 (n2 <= 1024 integer, gridSize in {0.25, 0.5})
    gs2 = bank.grid_size[plan][:, None] ** 2
    ok_dist = n2.astype(jnp.float32) * gs2 <= (
        float(config.RLVisibilityDistance) ** 2)

    # 90-degree FoV gate, integer-exact. The host compares
    # cosang = (d.h)/(|d| + 1e-9) >= cos(45deg) in float64
    # (grid_sim.py:226-229): the epsilon makes EXACT-45deg diagonals
    # invisible, a distinction far below f32 resolution. With headings on
    # 45-degree multiples, h = u/|u| for integer u in {0,+-1}^2, and the
    # strict condition is equivalent to  s > 0  and  c*s^2 > |d|^2  with
    # s = d.u, c = 2 for axis headings (|u|^2=1), c = 1 for diagonals
    # (|u|^2=2) — evaluated exactly in int32.
    u_tab = np.round(np.stack([np.cos(np.deg2rad(45.0 * np.arange(8))),
                               np.sin(np.deg2rad(45.0 * np.arange(8)))],
                              axis=1)).astype(np.int32)
    c_tab = np.where(np.abs(u_tab).sum(1) == 1, 2, 1).astype(np.int32)
    u = jnp.asarray(u_tab)[rot_idx]  # (N, 2)
    cfac = jnp.asarray(c_tab)[rot_idx]  # (N,)
    s = di[..., 0] * u[:, None, 0] + di[..., 1] * u[:, None, 1]
    ok_fov = (n2 == 0) | ((s > 0) & (cfac[:, None] * s * s > n2))

    # line_blocked: host samples t = linspace(0,1,n)[1:-1] with
    # n = 2*max(|dr|,|dc|)+1 (grid_sim.py:235-241); replicate every
    # interior point k/(n-1), k=1..n-2, with a fixed-size masked sweep
    n = 2 * jnp.max(jnp.abs(di), axis=-1) + 1  # (N, 2)
    kmax = 2 * 16 + 1
    ks = jnp.arange(1, kmax - 1, dtype=jnp.float32)  # (K,)
    t = ks[None, None, :] / jnp.maximum(n[..., None] - 1, 1).astype(jnp.float32)
    active = ks[None, None, :] <= (n[..., None] - 2).astype(jnp.float32)
    pt = (pos[:, None, None, :].astype(jnp.float32)
          + di.astype(jnp.float32)[:, :, None, :] * t[..., None])  # (N,2,K,2)
    rc = jnp.round(pt).astype(jnp.int32)
    rc = jnp.clip(rc, 0, bank.grids.shape[1] - 1)
    blocked_pt = bank.grids[plan[:, None, None], rc[..., 0], rc[..., 1]] > 0
    blocked = jnp.any(blocked_pt & active, axis=-1)
    return ok_dist & ok_fov & ~blocked


def render(bank: PlanBank, plan, pos, rot_idx, toggled, config):
    """(N, 96, 96, 3) u8 — pixel-identical twin of
    GridHouseSim._render_numpy (grid_sim.py:305-352)."""
    fov = np.deg2rad(config.fieldOfView)
    col_off = np.rad2deg(np.arctan(
        np.linspace(-np.tan(fov / 2), np.tan(fov / 2), W)))  # (W,)
    ts = np.arange(RAY_STEP, MAX_RANGE, RAY_STEP)  # host's exact samples
    ts_j = jnp.asarray(ts, jnp.float32)

    ang = 45.0 * rot_idx[:, None].astype(jnp.float32) + col_off[None, :]
    th = jnp.deg2rad(ang)
    d = jnp.stack([jnp.cos(th), jnp.sin(th)], axis=-1)  # (N, W, 2)
    origin = pos.astype(jnp.float32) + 0.5  # (N, 2)
    pts = (origin[:, None, None, :]
           + d[:, :, None, :] * ts_j[None, None, :, None])  # (N, W, T, 2)
    rc = jnp.trunc(pts).astype(jnp.int32)  # host int() truncation
    G = bank.grids.shape[1]
    oob = ((rc[..., 0] < 0) | (rc[..., 0] >= G)
           | (rc[..., 1] < 0) | (rc[..., 1] >= G))
    rcc = jnp.clip(rc, 0, G - 1)
    p4 = plan[:, None, None]
    wall = (bank.grids[p4, rcc[..., 0], rcc[..., 1]] > 0) & ~oob
    cells = bank.obj_cells[plan]  # (N, 2, 2)
    obj_hit = ((rcc[..., 0][..., None] == cells[:, None, None, :, 0])
               & (rcc[..., 1][..., None] == cells[:, None, None, :, 1])
               & ~oob[..., None])  # (N, W, T, 2obj)
    any_obj = obj_hit.any(-1)
    event = oob | wall | any_obj  # (N, W, T)
    # first event sample (host's sequential break)
    first = jnp.argmax(event, axis=-1)  # (N, W)
    has = event.any(-1)
    dist = jnp.where(has, ts_j[first], jnp.float32(MAX_RANGE))
    take = jnp.take_along_axis
    first1 = first[..., None]
    hit_is_obj = take(any_obj, first1, axis=-1)[..., 0] & has
    # host object priority: first matching dict entry at that sample
    which = jnp.argmax(take(
        obj_hit, first1[..., None], axis=-2)[..., 0, :], axis=-1)  # (N, W)

    # column band geometry (host int() = floor for positive operands)
    hgt = jnp.clip(jnp.trunc(H / (dist + 0.3)), 4, H).astype(jnp.int32)
    top = (H - hgt) // 2
    shade = jnp.clip(1.5 / (0.4 + 0.25 * dist), 0.15, 1.0)  # (N, W)

    off_on = np.stack([np.stack(OBJ_COLORS[n]) for n in OBJ_NAMES])
    off_on = jnp.asarray(off_on, jnp.float32)  # (2obj, 2, 3)
    tog = take(toggled.astype(jnp.int32), which, axis=1)  # (N, W)
    obj_color = off_on[which, tog]  # (N, W, 3)
    base = jnp.where(hit_is_obj[..., None], obj_color,
                     jnp.asarray(WALL_COLOR, jnp.float32))
    band = jnp.clip(base * shade[..., None], 0, 255).astype(jnp.uint8)

    rows = jnp.arange(H)[None, :, None]  # (1, H, 1)
    ceil_half = rows < (H // 2)
    bg = jnp.where(ceil_half[..., None],
                   jnp.asarray(CEIL_COLOR, jnp.uint8),
                   jnp.asarray(FLOOR_COLOR, jnp.uint8))  # (1, H, 1, 3)
    in_band = ((rows >= top[:, None, :]) & (rows < (top + hgt)[:, None, :]))
    img = jnp.where(in_band[..., None], band[:, None, :, :],
                    jnp.broadcast_to(bg, (pos.shape[0], H, W, 3)))
    return img


def render_chw(bank, plan, pos, rot_idx, toggled, config):
    return jnp.transpose(render(bank, plan, pos, rot_idx, toggled, config),
                         (0, 3, 1, 2))


def local_occupancy(bank: PlanBank, plan, pos, rot_idx, config):
    """(N, 1, g, g) u8 — egocentric rotated crop
    (grid_sim.py get_local_occupancy_map), via the per-heading LUTs."""
    g = config.RLVisibleGrid
    p = config.RLVisibleGrid + 3
    radius = g // 2
    r0 = pos[:, 0] + p - radius
    c0 = pos[:, 1] + p - radius
    rr = r0[:, None, None] + jnp.arange(g)[None, :, None]
    cc = c0[:, None, None] + jnp.arange(g)[None, None, :]
    win = bank.occ_padded[plan[:, None, None], rr, cc]  # (N, g, g)
    flat = win.reshape(win.shape[0], -1)
    lut = bank.rot_lut[rot_idx].reshape(win.shape[0], -1)
    valid = bank.rot_valid[rot_idx].reshape(win.shape[0], -1)
    rot = jnp.where(valid, jnp.take_along_axis(flat, lut, axis=1), 0)
    rot = rot.reshape(win.shape[0], g, g)
    rot = rot.at[:, radius, radius].set(128)
    return rot[:, None].astype(jnp.uint8)


def free_at(bank: PlanBank, plan, cell):
    """(N,) bool — grid_sim.py _free: in-bounds, not wall, not object."""
    G = bank.grids.shape[1]
    inb = ((cell[:, 0] >= 0) & (cell[:, 0] < G)
           & (cell[:, 1] >= 0) & (cell[:, 1] < G))
    cc = jnp.clip(cell, 0, G - 1)
    not_wall = bank.grids[plan, cc[:, 0], cc[:, 1]] == 0
    on_obj = ((bank.obj_cells[plan][:, :, 0] == cell[:, None, 0])
              & (bank.obj_cells[plan][:, :, 1] == cell[:, None, 1])).any(1)
    return inb & not_wall & ~on_obj


def exe_action(bank: PlanBank, plan, pos, rot_idx, toggled, action, config):
    """Batched _exe_action (grid_sim.py:481-503) over the 8-action space
    [MoveAhead, MoveBack, MoveLeft, MoveRight, RotateLeft, RotateRight,
    ToggleObjectOn, ToggleObjectOff] (allActions order from env config).
    Returns (pos, rot_idx, toggled)."""
    acts = list(config.allActions)
    move_deg = {"MoveAhead": 0.0, "MoveBack": 180.0,
                "MoveLeft": -90.0, "MoveRight": 90.0}
    # per-action step table indexed by (action, rot_idx)
    step_tab = np.zeros((len(acts), 8, 2), np.int32)
    is_move = np.zeros(len(acts), bool)
    drot = np.zeros(len(acts), np.int32)
    tog_val = -np.ones(len(acts), np.int32)  # -1 = not a toggle
    rot_step = int(config.rotateStepDegrees // 45)
    for i, a in enumerate(acts):
        if a in move_deg:
            is_move[i] = True
            for k in range(8):
                th = np.deg2rad(45.0 * k + move_deg[a])
                step_tab[i, k] = np.round(
                    [np.cos(th), np.sin(th)]).astype(np.int64)
        elif a == "RotateLeft":
            drot[i] = -rot_step
        elif a == "RotateRight":
            drot[i] = rot_step
        elif a == "ToggleObjectOn":
            tog_val[i] = 1
        elif a == "ToggleObjectOff":
            tog_val[i] = 0
    step_tab = jnp.asarray(step_tab)
    is_move_j = jnp.asarray(is_move)
    drot_j = jnp.asarray(drot)
    tog_j = jnp.asarray(tog_val)

    a = action.reshape(-1).astype(jnp.int32)
    target = pos + step_tab[a, rot_idx]
    can = free_at(bank, plan, target) & is_move_j[a]
    new_pos = jnp.where(can[:, None], target, pos)
    new_rot = (rot_idx + drot_j[a]) % 8

    vis = visible_mask(bank, plan, pos, rot_idx, config)  # (N, 2)
    any_vis = vis.any(1)
    first_vis = jnp.argmax(vis, axis=1)  # host: visible[0] dict order
    tv = tog_j[a]
    do_tog = (tv >= 0) & any_vis
    sel = jax.nn.one_hot(first_vis, 2, dtype=jnp.bool_) & do_tog[:, None]
    new_tog = jnp.where(sel, tv[:, None] > 0, toggled)
    return new_pos, new_rot, new_tog


def reset_with_task(bank: PlanBank, key, task_id, task_obj, task_on, config):
    """Batched episode reset with FORCED commanded tasks (the test-time
    round-robin path, grid_sim.py reset:433-439): random floor plan,
    random teleport + random object states, then the commanded object
    forced opposite to the act (_setup_task, reference
    RL_env_VAR.py:251-266). task_id (n,) i32 selects each env's task.
    Returns (plan, pos, rot_idx, toggled)."""
    n = task_id.shape[0]
    k2, k3, k4, k5 = jax.random.split(key, 4)
    plan = jax.random.randint(k2, (n,), 0, bank.grids.shape[0])
    fidx = (jax.random.uniform(k3, (n,))
            * bank.free_count[plan].astype(jnp.float32)).astype(jnp.int32)
    pos = bank.free_cells[plan, fidx]
    rot_idx = jax.random.randint(k4, (n,), 0, 8)
    toggled = jax.random.bernoulli(k5, 0.5, (n, 2))
    obj = task_obj[task_id]
    want = ~task_on[task_id]  # forced OPPOSITE of the commanded act
    sel = jax.nn.one_hot(obj, 2, dtype=jnp.bool_)
    toggled = jnp.where(sel, want[:, None], toggled)
    return plan, pos.astype(jnp.int32), rot_idx, toggled


def random_reset(bank: PlanBank, key, n, n_tasks, task_obj, task_on, config):
    """Batched episode reset (grid_sim.py reset + _setup_task):
    random task, then reset_with_task. Returns (plan, pos, rot_idx,
    toggled, task_id)."""
    k1, krest = jax.random.split(key)
    task_id = jax.random.randint(k1, (n,), 0, n_tasks)
    plan, pos, rot_idx, toggled = reset_with_task(
        bank, krest, task_id, task_obj, task_on, config)
    return plan, pos, rot_idx, toggled, task_id
