"""Multi-device (8x virtual CPU) sharding tests.

Validates that the dp-sharded train steps compile, execute, and agree with
single-device execution — the property the real ICI deployment relies on
(XLA inserts the gradient all-reduce; replicated params must stay in sync).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from var_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    pad_to_multiple,
    replicated,
)


def test_mesh_construction():
    mesh = build_mesh({"dp": 8})
    assert mesh.devices.shape == (8,)
    mesh2 = build_mesh({"dp": 4, "mp": 2})
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        build_mesh({"dp": 64})


def test_pad_to_multiple():
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 1) and n == 10


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("VAR_TPU_RUN_DRYRUN_TEST") != "1",
    reason="duplicates the driver's own MULTICHIP dryrun check (~5 min on "
           "one core); set VAR_TPU_RUN_DRYRUN_TEST=1 to run it in-tree")
def test_graft_dryrun_8dev():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_init_distributed_noop_single_host():
    """Without a coordinator or process count, init_distributed must be a
    no-op (safe to call unconditionally from drivers)."""
    from var_tpu.parallel.mesh import init_distributed

    init_distributed()  # must not raise or touch jax.distributed
    assert jax.process_count() == 1


@pytest.mark.slow
def test_init_distributed_loopback():
    """Full jax.distributed coordination handshake, loopback
    (num_processes=1), in a fresh subprocess (the service must start
    before backend resolution, which pytest already did here)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = (
        "import os\n"
        "import sys\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import jax\n"
        # env vars alone are too late (sitecustomize imports jax first);
        # config.update actually pins the platform — without it this child
        # silently computes on the tunneled TPU and hangs when it is flaky
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from var_tpu.parallel.mesh import init_distributed\n"
        "init_distributed('localhost:12973', num_processes=1, process_id=0)\n"
        "assert jax.process_count() == 1, jax.process_count()\n"
        "assert jax.process_index() == 0\n"
        "import jax.numpy as jnp\n"
        "assert float(jnp.arange(4.0).sum()) == 6.0\n"
        "print('DIST_OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=240)
    assert "DIST_OK" in out.stdout, out.stdout + "\n" + out.stderr


@pytest.mark.slow
def test_two_process_spmd_grad():
    """REAL multi-process SPMD (the DCN path without hardware): two
    OS processes, 4 virtual CPU devices each, one global 8-device 'dp'
    mesh. Each rank contributes its process-local batch shard; a jitted
    grad over replicated params must all-reduce across the process
    boundary and agree bit-wise with the single-process result."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = (
        "import os, sys\n"
        "rank = int(sys.argv[1]); port = sys.argv[2]\n"
        "os.environ['XLA_FLAGS'] = ('--xla_force_host_platform_device_count=4"
        " --xla_backend_optimization_level=0"
        " --xla_llvm_disable_expensive_passes=true')\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_cpu_collectives_implementation', 'gloo')\n"
        "from var_tpu.parallel.mesh import init_distributed, build_mesh, "
        "batch_sharding, replicated\n"
        "init_distributed(f'localhost:{port}', num_processes=2, "
        "process_id=rank)\n"
        "import jax.numpy as jnp, numpy as np\n"
        "assert jax.process_count() == 2 and jax.device_count() == 8\n"
        "mesh = build_mesh({'dp': 8})\n"
        "rng = np.random.RandomState(0)  # same params on both ranks\n"
        "w1 = rng.randn(6, 16).astype(np.float32)\n"
        "w2 = rng.randn(16, 1).astype(np.float32)\n"
        "x_global = np.linspace(-1, 1, 16 * 6).reshape(16, 6)"
        ".astype(np.float32)\n"
        "x_local = x_global[rank * 8:(rank + 1) * 8]\n"
        "params = jax.device_put((w1, w2), replicated(mesh))\n"
        "x = jax.make_array_from_process_local_data("
        "batch_sharding(mesh), x_local, (16, 6))\n"
        "def loss(params, x):\n"
        "    h = jnp.tanh(x @ params[0])\n"
        "    return jnp.mean((h @ params[1]) ** 2)\n"
        "g = jax.jit(jax.grad(loss))(params, x)\n"
        "g_ref = jax.jit(jax.grad(loss))("
        "(jnp.asarray(w1), jnp.asarray(w2)), jnp.asarray(x_global))\n"
        "for a, b in zip(g, g_ref):\n"
        "    np.testing.assert_allclose(np.asarray(a), np.asarray(b), "
        "rtol=1e-6, atol=1e-7)\n"
        "print('DIST2_OK', rank, flush=True)\n"
    )
    port = "13941"
    procs = [subprocess.Popen([sys.executable, "-c", worker, str(r), port],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True)
             for r in range(2)]
    outs = [p.communicate(timeout=240) for p in procs]
    for r, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and f"DIST2_OK {r}" in out, (
            f"rank {r}: rc={p.returncode}\n{out}\n{err[-2000:]}")


@pytest.mark.slow
def test_sharded_device_rollout_engine():
    """The RL rollout engine with env-axis-sharded buffers: collect steps +
    GAE execute over an 8-device mesh with finite outputs."""
    import jax.numpy as jnp

    from var_tpu.config import main_config
    from var_tpu.models.encoders import build_pretext_model, init_pretext_params
    from var_tpu.models.policy import build_policy
    from var_tpu.envs.spaces import Box
    from var_tpu.rl.rollout_device import DeviceRolloutEngine

    cfg = main_config(env="arms")
    cfg.override(RLRecurrentSize=32, RLRecurrentInputSize=16)
    mesh = build_mesh({"dp": 8})
    N, T = 8, 3
    model = build_pretext_model(cfg)
    vparams = init_pretext_params(model, cfg, jax.random.PRNGKey(0))["params"]
    policy = build_policy(cfg, Box(low=-np.ones(2), high=np.ones(2)))
    eng = DeviceRolloutEngine(model, vparams, policy, cfg, T, N,
                              "robot_pose", (2,), jnp.float32, (2,),
                              jnp.float32, mesh=mesh)
    rng = np.random.RandomState(0)

    def raw_obs():
        return {
            "image": (rng.rand(N, 3, 96, 96) * 255).astype(np.uint8),
            "goal_sound": rng.randn(N, 1, 100, 40).astype(np.float32),
            "robot_pose": rng.randn(N, 2).astype(np.float32),
        }

    dummy = {
        "robot_pose": jnp.zeros((N, 2)),
        "goal_sound_feat": jnp.zeros((N, 3)),
        "image": jnp.zeros((N, 3, 96, 96), jnp.uint8),
        "image_feat": jnp.zeros((N, 3)),
    }
    pv = policy.init(jax.random.PRNGKey(1), dummy, jnp.zeros((N, 32)),
                     jnp.ones((N, 1)), 1)
    eng.set_policy_params(pv["params"])
    action = eng.init(raw_obs(), jax.random.PRNGKey(2))
    assert action.shape == (N, 2)
    for t in range(T):
        obs = raw_obs()
        # step 1+: inf sentinel goal sounds (cached path)
        obs["goal_sound"] = np.full_like(obs["goal_sound"], np.inf)
        action, raw_rew = eng.step(t, obs, np.zeros(N), np.zeros(N, bool),
                                   np.ones(N), jax.random.PRNGKey(3 + t))
        assert np.isfinite(raw_rew).all()
    eng.compute_returns(True, 0.99, 0.95, False)
    batch = eng.device_batch()
    assert np.isfinite(np.asarray(batch["returns"])).all()
    # buffers actually sharded over the mesh
    assert len(eng.buffers.values.sharding.device_set) == 8


@pytest.mark.slow
def test_sharded_pretext_step_matches_single_device():
    """Same batch, same init: the dp-sharded step must produce the same
    loss and parameters as the unsharded step."""
    from var_tpu.config import main_config
    from var_tpu.train.pretext import PretextTrainer, TrainState, make_optimizer

    def run(mesh_shape):
        cfg = main_config(env="arms")
        cfg.override(meshShape=mesh_shape)
        tr = PretextTrainer(cfg)
        tr._ensure_audio()
        tr.tx = make_optimizer(cfg, steps_per_epoch=10)
        tr.init_model(seed=0)
        params = tr.variables["params"]
        if mesh_shape:
            mesh = build_mesh(mesh_shape)
            params = jax.device_put(params, replicated(mesh))
            data_s = batch_sharding(mesh)
        else:
            data_s = None
        state = TrainState(params, tr.tx.init(params), jnp.asarray(0, jnp.int32))

        rng = np.random.RandomState(0)
        B = 16
        buf_len = tr.audio.buf_len
        arrays = (
            (rng.rand(B, 3, 96, 96) * 255).astype(np.uint8),
            (rng.randn(B, buf_len) * 3000).astype(np.int16),
            np.full((B,), 8000, np.int32),
            np.zeros((B,), bool),
            (rng.randn(B, buf_len) * 3000).astype(np.int16),
            np.full((B,), 8000, np.int32),
            np.zeros((B,), bool),
        )
        if data_s is not None:
            dev = tuple(jax.device_put(a, data_s) for a in arrays)
        else:
            dev = tuple(jnp.asarray(a) for a in arrays)
        state, loss = tr._train_step_wav(state, *dev)
        return float(loss), state.params

    loss_1, params_1 = run(None)
    loss_8, params_8 = run({"dp": 8})
    np.testing.assert_allclose(loss_1, loss_8, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
