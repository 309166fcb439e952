"""Diagnose the D=8 run's even/odd class failure."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    import jax, jax.numpy as jnp
    from e2e_run import build_config
    from var_tpu.train.rl import RLTrainer

    cfg = build_config("arms", "/tmp/e2e_arm_r4", 12000000, 1,
                       collect_per_class=1600, var_epochs=80,
                       device_sim=True,
                       extra_set=["representationDim=8",
                                  "pretextCoverageCollect=True",
                                  "pretextHardNegProb=0.7",
                                  "RLModelSaveInterval=100"])
    cfg.override(RLTrain=False, RLDeviceSimEval=True)
    tr = RLTrainer(cfg, env="arms")
    tr.load_pretext()
    eng = tr.device_eval_engine(64)
    bank = np.asarray(eng.goal_bank)  # (taskNum, C, D)
    mean = bank.mean(axis=1)
    mean /= np.linalg.norm(mean, axis=1, keepdims=True)
    print("goal-embedding class-mean dot matrix:")
    print(np.round(mean @ mean.T, 3))
    print("per-class within-bank spread (mean pairwise dot):")
    for c in range(bank.shape[0]):
        b = bank[c]
        print(c, round(float((b @ b.T).mean()), 3), "clips", b.shape[0])
    params = tr.load_policy_params("/tmp/e2e_arm_r4/rl_model/00800")
    rng = jax.random.PRNGKey(5)
    for c in range(cfg.taskNum):
        rng, sub = jax.random.split(rng)
        intent = jnp.full((64,), c, jnp.int32)
        success, counts, rewsum = eng.eval_batch(params, intent, sub)
        print(f"class {c}: success {np.mean(np.asarray(success)):.2f} "
              f"raw-reward-sum mean {np.mean(np.asarray(rewsum)):.1f} "
              f"goal_counts mean {np.mean(np.asarray(counts)):.1f}")


if __name__ == "__main__":
    main()
