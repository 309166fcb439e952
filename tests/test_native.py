"""Native C++ simcore parity tests against the numpy fallbacks."""
import numpy as np
import pytest

from var_tpu.native import simcore


@pytest.fixture(scope="module")
def lib():
    lib = simcore()
    if lib is None:
        pytest.skip("native simcore not buildable here")
    return lib


def _make_env(seed=3):
    from var_tpu.config import main_config
    from var_tpu.envs.grid_sim import GridHouseSim

    cfg = main_config(env="ai2thor")
    env = GridHouseSim(cfg)
    env.seed(seed)
    env.floor_plan = 205
    env._build_world()
    env.task = env.taskList[0]
    env._random_teleport()
    return env


def test_raycast_render_parity(lib):
    env = _make_env()
    for trial in range(8):
        env._random_teleport()
        for name in env.objects:
            env.objects[name]["isToggled"] = bool(trial % 2)
        native = env._render_native(lib)
        ref = env._render_numpy()
        # identical up to boundary-pixel float ties
        frac_diff = np.mean(np.any(native != ref, axis=-1))
        assert frac_diff < 0.005, f"trial {trial}: {frac_diff:.4f} pixels differ"


def _rotate(lib, window, angle):
    import ctypes

    n = window.shape[0]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    out = np.empty((n, n), dtype=np.uint8)
    win = np.ascontiguousarray(window)
    lib.rotate_crop(win.ctypes.data_as(u8p), n, ctypes.c_float(angle),
                    out.ctypes.data_as(u8p))
    return out


def test_rotate_crop_geometry(lib):
    rng = np.random.RandomState(0)
    n = 9
    window = (rng.rand(n, n) > 0.5).astype(np.uint8) * 255
    # identity at 0 degrees
    np.testing.assert_array_equal(_rotate(lib, window, 0.0), window)
    # 90-degree CCW rotation equals numpy rot90 (scipy's direction)
    from scipy import ndimage

    golden90 = ndimage.rotate(window, 90.0, reshape=False, order=0)
    np.testing.assert_array_equal(_rotate(lib, window, 90.0), golden90)
    # rotating forth and back restores the interior
    back = _rotate(lib, _rotate(lib, window, 45.0), -45.0)
    center = (slice(3, 6), slice(3, 6))
    assert np.mean(back[center] == window[center]) > 0.6


def test_native_renderer_speedup(lib):
    import time

    env = _make_env()
    # warm both paths
    env._render_native(lib), env._render_numpy()
    t0 = time.perf_counter()
    for _ in range(10):
        env._render_native(lib)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        env._render_numpy()
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
