#!/usr/bin/env python
"""End-to-end task-capability run: collect -> VAR -> PPO -> eval.

Runs the complete two-stage pipeline on a built-in simulator profile at a
scale that actually learns the task, then evaluates the trained policy
deterministically with per-class round-robin episodes and records the
success rate — the reference's only task-level metric
(reference: VAR/RL_VAR.py:57-76 success-rate eval;
Envs/pybullet/arms/tasks/fourInARow/fourInARow.py:317-335 goal_area_count).

    python scripts/e2e_run.py arms    work/e2e_arm     --rl-steps 200000
    python scripts/e2e_run.py ai2thor work/e2e_ai2thor --rl-steps 200000

Each invocation writes/updates ONE profile entry in the JSON given by
--out (default E2E_r03.json at the repo root). Stages are selectable for
resume/iteration: --stages collect,var,rl,eval.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from var_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def build_config(env, work, rl_steps, eval_per_class, rl_lr=None,
                 num_envs=None, ent_coef=None, collect_per_class=None,
                 var_epochs=None, pipelined=False, device_sim=False,
                 extra_set=None):
    from var_tpu.config import gym_register, main_config

    cfg = main_config(env=env)
    overrides = dict(
        pretextDataDir=[os.path.join(work, "triplets")],
        pretextModelSaveDir=os.path.join(work, "var_model"),
        pretextModelFineTune=False,
        pretextDataset="VARDataset",
        RLModelSaveDir=os.path.join(work, "rl_model"),
        RLModelFineTune=False,
        RLTrain=True,
        RLTotalSteps=rl_steps,
        RLLogInterval=1,
        episodeImgSaveInterval=-1,
    )
    if collect_per_class:
        # reference-scale quotas (50-100/class) underfit the VAR on the
        # builtin renders (reward-landscape probe: near-chance); measured
        # recipe: 400/class + 2x empty + 60 epochs -> triplet loss ~0.008,
        # on-object class accuracy ~0.93 (scripts/var_probe.py)
        overrides["pretextCollectNum"] = (
            [collect_per_class] * cfg.taskNum + [2 * collect_per_class])
        # generous episode cap: collection stops at quota anyway, and a
        # fixed 2000 would starve >1600/class quotas
        overrides["pretextDataEpisode"] = max(2000, 5 * collect_per_class)
    if var_epochs:
        overrides["pretextEpoch"] = var_epochs
        overrides["pretextLRDecayEpoch"] = [var_epochs // 2,
                                            var_epochs * 5 // 6]
    if hasattr(cfg, "testEpisodesPerClass"):
        overrides["testEpisodesPerClass"] = eval_per_class
    if rl_lr is not None:
        overrides["RLLr"] = rl_lr
    if num_envs is not None:
        overrides["RLNumEnvs"] = num_envs
    if ent_coef is not None:
        overrides["ppoEntropyCoef"] = ent_coef
    if pipelined:
        overrides["RLPipelinedRollout"] = True
    if device_sim:
        overrides["RLDeviceSimRollout"] = True
    if extra_set:
        # raw KNOB=VALUE overrides (same syntax as the pretext/RL CLIs)
        # applied last, so they win over the runner's own derivations
        from var_tpu.cli import parse_set_items

        overrides.update(parse_set_items(extra_set))
    cfg.override(**overrides)
    cfg.override(pretextModelLoadDir=os.path.join(
        work, "var_model", str(cfg.pretextEpoch - 1)))
    gym_register(cfg, env=env)
    return cfg


def binom_ci95(rate, n_episodes):
    """95% normal-approximation binomial confidence half-width."""
    return 1.96 * (max(rate * (1 - rate), 1e-9) / n_episodes) ** 0.5


def scale_eval_quotas(cfg, eval_per_class):
    """Scale the per-class eval episode quotas to the eval budget.

    The arm env derives per-class episode counts from the sound-source
    test-set sizes (reference fourInARow.py:92-96: 1000/class -> 4000
    eval episodes); rescaling them makes the round-robin cycle through
    every class within eval_per_class episodes each. Done only at eval
    time so training keeps the full clip inventory. The grid sim reads
    testEpisodesPerClass directly.
    """
    sizes = cfg.soundSource.get("size", {})
    if not isinstance(sizes, dict):
        # grid profile: size is a scalar clip count; eval quotas come from
        # testEpisodesPerClass instead (grid_sim.py size_per_class)
        return
    n = max((len(v) for v in sizes.values()), default=0)
    total = [0] * n
    for v in sizes.values():
        for i, x in enumerate(v):
            total[i] += x
    for ds in sizes:
        sizes[ds] = [eval_per_class * v // t if t else 0
                     for v, t in zip(sizes[ds], total)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env", choices=["arms", "ai2thor"])
    ap.add_argument("work")
    ap.add_argument("--rl-steps", type=int, default=200_000)
    ap.add_argument("--eval-per-class", type=int, default=16)
    ap.add_argument("--eval-envs", type=int, default=8)
    ap.add_argument("--rl-lr", type=float, default=None)
    ap.add_argument("--num-envs", type=int, default=None)
    ap.add_argument("--ent-coef", type=float, default=None)
    ap.add_argument("--collect-per-class", type=int, default=400)
    ap.add_argument("--var-epochs", type=int, default=60)
    ap.add_argument("--pipelined", action="store_true",
                    help="one-step-stale pipelined fused rollout "
                         "(RLPipelinedRollout=True); throughput mode only — "
                         "the unobservable action delay stalls learning "
                         "(ROADMAP.md round-3 finding)")
    ap.add_argument("--device-sim", action="store_true",
                    help="train on the device-resident sim "
                         "(RLDeviceSimRollout=True, both profiles): the "
                         "whole rollout is one XLA program, ~20x the exact "
                         "host path; eval still runs on the host testRL "
                         "stack")
    ap.add_argument("--eval-backend", default=None,
                    choices=["dummy", "shmem", "auto"],
                    help="vec-env backend for the eval stage (forkserver "
                         "workers can be unreliable after heavy in-process "
                         "device work; 'dummy' sidesteps them)")
    ap.add_argument("--device-eval-per-class", type=int, default=0,
                    help="additionally run the device-resident evaluator "
                         "(RLDeviceSimEval) at this many episodes per "
                         "class for a tight-CI corroboration of the host "
                         "eval (0 = off)")
    ap.add_argument("--device-eval-envs", type=int, default=128)
    ap.add_argument("--select-best-per-class", type=int, default=0,
                    help="sweep saved checkpoints with the device "
                         "evaluator at this many episodes per class and "
                         "record the best one (the reference only ever "
                         "scores the final checkpoint; success typically "
                         "saturates early and oscillates after — see "
                         "artifacts/arm_success_curve_16M.csv); 0 = off")
    ap.add_argument("--select-best-every", type=int, default=1,
                    help="curve stride: evaluate every k-th checkpoint")
    ap.add_argument("--set", nargs="*", default=[], metavar="KNOB=VALUE",
                    dest="set_items",
                    help="extra config overrides, same syntax as the "
                         "pretext/RL CLIs; applied after the runner's "
                         "own overrides (e.g. --set "
                         "RLModelSaveInterval=10)")
    ap.add_argument("--stages", default="collect,var,rl,eval")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "E2E_r03.json"))
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from var_tpu.train.pretext import PretextTrainer
    from var_tpu.train.rl import RLTrainer

    cfg = build_config(args.env, args.work, args.rl_steps,
                       args.eval_per_class, args.rl_lr, args.num_envs,
                       args.ent_coef, args.collect_per_class,
                       args.var_epochs, args.pipelined, args.device_sim,
                       extra_set=args.set_items)
    timings = {}
    result = {
        # resolved config, not args.rl_steps: --set RLTotalSteps=X wins
        # over the runner's --rl-steps (parse order in build_config)
        "rl_steps": int(cfg.RLTotalSteps),
        "collect_quota": list(cfg.pretextCollectNum),
        "num_envs": cfg.RLNumEnvs,
        "rl_lr": cfg.RLLr,
    }

    if "collect" in stages or "var" in stages:
        pretext = PretextTrainer(cfg)
        if "collect" in stages:
            t0 = time.time()
            pretext.collectPretextData()
            timings["collect_s"] = round(time.time() - t0, 1)
        if "var" in stages:
            t0 = time.time()
            pretext.trainRepresentation()
            timings["var_train_s"] = round(time.time() - t0, 1)

    # checkpoint labels come from the training loop's resolved config
    # (RLTotalSteps may have been overridden via --set), so derive the
    # final label from cfg, not the raw --rl-steps argument
    updates = int(cfg.RLTotalSteps) // (cfg.ppoNumSteps * cfg.RLNumEnvs)
    final_ckpt = os.path.join(args.work, "rl_model", "%.5i" % (updates - 1))
    if "rl" in stages:
        t0 = time.time()
        rl = RLTrainer(cfg, env=args.env)
        rl.load_pretext()
        rl.trainRL()
        timings["rl_train_s"] = round(time.time() - t0, 1)

    if "eval" in stages:
        t0 = time.time()
        cfg.override(RLTrain=False)
        if args.eval_backend:
            cfg.override(vecEnvBackend=args.eval_backend)
        # batched lockstep eval: N envs complete N same-class episodes per
        # round-robin cycle, so per-env quotas are eval_per_class / N
        per_env = max(1, args.eval_per_class // args.eval_envs)
        scale_eval_quotas(cfg, per_env)
        if hasattr(cfg, "testEpisodesPerClass"):
            cfg.override(testEpisodesPerClass=per_env)
        rl_eval = RLTrainer(cfg, env=args.env)
        rl_eval.load_pretext()
        rate = rl_eval.testRL(policy_path=final_ckpt,
                              num_envs=args.eval_envs)
        timings["eval_s"] = round(time.time() - t0, 1)
        n_classes = cfg.taskNum
        result.update(
            success_rate=rate,
            eval_episodes=per_env * args.eval_envs * n_classes,
            episodes_per_class=per_env * args.eval_envs,
            task_classes=n_classes,
            checkpoint=final_ckpt,
            eval_csv=os.path.join(
                args.work, "rl_model",
                f"test_{os.path.basename(final_ckpt)}.csv"),
        )

    if args.device_eval_per_class:
        # high-precision corroboration on the device-resident evaluator
        # (RLDeviceSimEval, ~150x/episode vs the host path): thousands of
        # episodes tighten the binomial CI from +-0.08 at 64 eps to
        # +-0.01-0.02; the host-path result above stays canonical
        t0 = time.time()
        cfg_d = build_config(args.env, args.work, args.rl_steps,
                             args.eval_per_class, args.rl_lr,
                             args.num_envs, args.ent_coef,
                             args.collect_per_class, args.var_epochs,
                             extra_set=args.set_items)
        cfg_d.override(RLTrain=False, RLDeviceSimEval=True)
        per_env_d = max(1, args.device_eval_per_class
                        // args.device_eval_envs)
        scale_eval_quotas(cfg_d, per_env_d)
        if hasattr(cfg_d, "testEpisodesPerClass"):
            cfg_d.override(testEpisodesPerClass=per_env_d)
        rl_dev = RLTrainer(cfg_d, env=args.env)
        rl_dev.load_pretext()
        rate_d = rl_dev.testRL(policy_path=final_ckpt,
                               num_envs=args.device_eval_envs)
        n_eps = per_env_d * args.device_eval_envs * cfg_d.taskNum
        ci = binom_ci95(rate_d, n_eps)
        result["device_eval"] = {
            "success_rate": rate_d,
            "eval_episodes": n_eps,
            "ci95": round(ci, 4),
            "eval_s": round(time.time() - t0, 1),
            "note": "device-resident evaluator (trajectory-parity-tested "
                    "twin of the host success rules); host-path "
                    "success_rate above is the canonical number",
        }

    if args.select_best_per_class:
        # checkpoint selection: curve every saved policy on the device
        # evaluator and ship the best, not merely the last — the curve
        # tool measured final checkpoints oscillating ~0.1 below the
        # band's top once success saturates (ROADMAP round-3 finding)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from success_curve import run_curve, select_best

        t0 = time.time()
        rows = run_curve(args.env, args.work,
                         episodes_per_class=args.select_best_per_class,
                         envs=args.device_eval_envs,
                         every=args.select_best_every,
                         extra_set=args.set_items)
        best = select_best(rows)
        # materialize the selection: rl_model/best points at the chosen
        # checkpoint so downstream consumers load the shipped artifact,
        # not merely read its name from best_checkpoint.json
        best_link = os.path.join(args.work, "rl_model", "best")
        # a stale 'best' may exist as a symlink, file, or directory; any
        # of them would make os.symlink raise after the expensive sweep
        if os.path.lexists(best_link):
            if os.path.isdir(best_link) and not os.path.islink(best_link):
                shutil.rmtree(best_link)
            else:
                os.unlink(best_link)
        try:
            os.symlink(best["checkpoint"], best_link)
        except OSError as e:
            print(f"# best symlink failed ({e}); selection recorded in "
                  "best_checkpoint.json regardless", file=sys.stderr)
        sel = {
            "best_checkpoint": os.path.join(
                args.work, "rl_model", best["checkpoint"]),
            "shipped_as": best_link,
            "best_success_rate": best["success_rate"],
            "best_ci95": best["ci95"],
            "best_env_steps": best["env_steps"],
            "final_success_rate": rows[-1]["success_rate"],
            # eval_batch runs whole envs-sized batches, so per-class
            # episodes round up to a multiple of the batch size
            "episodes_per_point": (
                -(-args.select_best_per_class // args.device_eval_envs)
                * args.device_eval_envs
                * len([k for k in rows[0] if k.startswith("class_")])),
            "curve_csv": os.path.join(args.work, "rl_model",
                                      "success_curve.csv"),
            "select_s": round(time.time() - t0, 1),
        }
        with open(os.path.join(args.work, "rl_model",
                               "best_checkpoint.json"), "w") as f:
            json.dump(sel, f, indent=2)
        result["checkpoint_selection"] = sel
        print(f"selected {sel['best_checkpoint']}: "
              f"{best['success_rate']:.3f} ±{best['ci95']:.3f} "
              f"(final: {rows[-1]['success_rate']:.3f})")

    result["timings_s"] = timings
    import jax

    result["hardware"] = str(jax.devices()[0])
    doc = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            doc = json.load(f)
    doc.setdefault("profiles", {})
    doc["profiles"].setdefault(args.env, {}).update(result)
    doc["date"] = time.strftime("%Y-%m-%d")
    doc["pipeline"] = "collect -> VAR train -> PPO (frozen-VAR reward) -> deterministic per-class eval"
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
    print("E2E result:", json.dumps(result))


if __name__ == "__main__":
    main()
