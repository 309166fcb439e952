#!/usr/bin/env python
"""Task-success learning curve: sweep every saved checkpoint of a run
with the device-resident evaluator.

The reference only logs reward curves during training (RL.py:230-243
progress.csv) and scores task success once, on the final checkpoint
(VAR/RL_VAR.py:57-76). The device evaluator (rl/device_sim.py
eval_batch, ~150x faster per episode than the host stack) makes success
cheap enough to measure at EVERY checkpoint, turning the one-shot final
score into a success-vs-steps curve — the task-level metric the
framework actually optimizes for.

    python scripts/success_curve.py arms /tmp/e2e_arm_r3b \
        --episodes-per-class 128 --envs 64

Writes <work>/rl_model/success_curve.csv: one row per checkpoint with
the overall rate, per-class rates, and a 95% binomial CI.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from var_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from e2e_run import binom_ci95, build_config  # noqa: E402


def list_checkpoints(rl_dir):
    """Numeric checkpoint dirs sorted by update label."""
    out = []
    for name in os.listdir(rl_dir):
        if name.isdigit() and os.path.isdir(os.path.join(rl_dir, name)):
            out.append((int(name), os.path.join(rl_dir, name)))
    return [p for _, p in sorted(out)]


def select_best(rows):
    """Best curve row: highest success rate; ties go to the LATEST
    checkpoint (more env-steps at the same measured rate — the policy
    with more training behind an identical score)."""
    if not rows:
        raise ValueError("empty curve")
    return max(rows, key=lambda r: (r["success_rate"], r["update"]))


def run_curve(env, work, episodes_per_class=128, envs=64, every=1,
              out_csv=None, extra_set=None):
    """Sweep every (k-th) checkpoint of a finished run with the
    device-resident evaluator; returns the list of per-checkpoint rows
    and writes them as CSV. The run's own config snapshot drives net
    shapes and the episode protocol (see the snapshot note below);
    extra_set carries the invoking run's --set overrides so sweep-time
    config matches train-time config for knobs outside the snapshot
    whitelist."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from var_tpu.train.rl import RLTrainer

    cfg = build_config(env, work, rl_steps=1, eval_per_class=1,
                       extra_set=extra_set)
    cfg.override(RLTrain=False)

    rl_dir = os.path.join(work, "rl_model")
    # the run's own config snapshot is the source of truth for everything
    # that shapes the nets and the episode protocol: the run may have
    # used a different --var-epochs than this invocation's default (so
    # pretextModelLoadDir MUST come from the snapshot — var_model/39
    # exists as a mid-training save even when the final VAR is epoch 59,
    # and loading it would silently score every policy against an
    # encoder it was never trained with), different recurrent sizes, or
    # different T/N
    snap_path = os.path.join(rl_dir, "config.json")
    if os.path.exists(snap_path):
        import json

        snap = json.load(open(snap_path))
        cfg.override(**{k: snap[k] for k in (
            "pretextModelLoadDir", "pretextEpoch", "representationDim",
            "RLRecurrentSize", "RLRecurrentInputSize", "RLEnvMaxSteps",
            "RLDeterministic") if k in snap})
        steps_per_update = (int(snap["ppoNumSteps"])
                            * int(snap["RLNumEnvs"]))
    else:
        steps_per_update = int(cfg.ppoNumSteps) * int(cfg.RLNumEnvs)

    trainer = RLTrainer(cfg, env=env)
    trainer.load_pretext()
    engine = trainer.device_eval_engine(envs)

    all_ckpts = list_checkpoints(rl_dir)
    if not all_ckpts:
        raise SystemExit(f"no checkpoints under {rl_dir}")
    ckpts = all_ckpts[:: max(1, every)]
    if ckpts[-1] != all_ckpts[-1]:
        # never drop the endpoint: the final checkpoint is the policy
        # the run actually ships (and the one e2e_run scores)
        ckpts.append(all_ckpts[-1])
    out_csv = out_csv or os.path.join(rl_dir, "success_curve.csv")
    batches = -(-episodes_per_class // envs)
    n_classes = int(cfg.taskNum)

    rows = []
    rng = jax.random.PRNGKey(3)
    for path in ckpts:
        params = trainer.load_policy_params(path)
        t0 = time.time()
        per_class = []
        for c in range(n_classes):
            hits = total = 0
            for _ in range(batches):
                rng, sub = jax.random.split(rng)
                intent = jnp.full((envs,), c, jnp.int32)
                success, _, _ = engine.eval_batch(params, intent, sub)
                hits += int(np.sum(np.asarray(success)))
                total += envs
            per_class.append(hits / total)
        rate = float(np.mean(per_class))
        n_eps = batches * envs * n_classes
        ci = binom_ci95(rate, n_eps)
        update = int(os.path.basename(path))
        rows.append({"checkpoint": os.path.basename(path),
                     "update": update,
                     "env_steps": (update + 1) * steps_per_update,
                     "success_rate": round(rate, 4),
                     "ci95": round(ci, 4),
                     **{f"class_{c}": round(r, 4)
                        for c, r in enumerate(per_class)}})
        print(f"{os.path.basename(path)}: {rate:.3f} ±{ci:.3f} "
              f"({time.time() - t0:.1f}s, per-class "
              f"{[round(r, 2) for r in per_class]})")

    import pandas as pd

    pd.DataFrame(rows).to_csv(out_csv, index=False)
    print("curve saved to", out_csv)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env", choices=["arms", "ai2thor"])
    ap.add_argument("work")
    ap.add_argument("--episodes-per-class", type=int, default=128)
    ap.add_argument("--envs", type=int, default=64,
                    help="episodes per eval batch (one class per batch)")
    ap.add_argument("--every", type=int, default=1,
                    help="evaluate every k-th checkpoint")
    ap.add_argument("--out", default=None,
                    help="CSV path (default <work>/rl_model/"
                         "success_curve.csv)")
    args = ap.parse_args()
    rows = run_curve(args.env, args.work,
                     episodes_per_class=args.episodes_per_class,
                     envs=args.envs, every=args.every, out_csv=args.out)
    best = select_best(rows)
    print(f"best checkpoint: {best['checkpoint']} "
          f"({best['success_rate']:.3f} ±{best['ci95']:.3f} "
          f"at {best['env_steps']} env-steps)")


if __name__ == "__main__":
    main()
