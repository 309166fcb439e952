"""Fast device-sim eval of the SI run's newest checkpoint (fallback when
the host-path eval would not fit in the round budget)."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np, jax, jax.numpy as jnp
    from e2e_run import build_config, binom_ci95
    from var_tpu.train.checkpoint import latest_checkpoint
    from var_tpu.train.rl import RLTrainer

    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/si_arm_r4"
    eps_per_class = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = build_config("arms", work, 1, 1, extra_set=["representationDim=8"])
    cfg.override(RLTrain=False, RLDeviceSimEval=True,
                 pretextModelLoadDir=latest_checkpoint(
                     os.path.join(work, "var_model")))
    tr = RLTrainer(cfg, env="arms")
    tr.load_pretext()
    eng = tr.device_eval_engine(128)
    ckpt = latest_checkpoint(os.path.join(work, "rl_model"))
    params = tr.load_policy_params(ckpt)
    rng = jax.random.PRNGKey(11)
    per_class = []
    batches = -(-eps_per_class // 128)
    for c in range(cfg.taskNum):
        hits = tot = 0
        for _ in range(batches):
            rng, sub = jax.random.split(rng)
            s, _, _ = eng.eval_batch(params, jnp.full((128,), c, jnp.int32), sub)
            hits += int(np.sum(np.asarray(s))); tot += 128
        per_class.append(hits / tot)
    rate = float(np.mean(per_class))
    n = batches * 128 * cfg.taskNum
    out = {"checkpoint": ckpt, "success_rate": round(rate, 4),
           "eval_episodes": n, "ci95": round(binom_ci95(rate, n), 4),
           "per_class": [round(r, 3) for r in per_class],
           "evaluator": "device-sim (RLDeviceSimEval twin)"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
