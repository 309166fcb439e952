#!/usr/bin/env python
"""Self-improvement capability demonstration: weak VAR -> low success ->
one self_improve() round -> measurably higher success.

The standard E2E runs (scripts/e2e_run.py, E2E_r03.json) exercise the
self-improvement flow from an already-saturated VAR, so success cannot
visibly rise. This script proves the flow's *purpose* (reference
examples/README.md:31-45: deploy, gather new pairs, fine-tune the VAR
with the frozen association, fine-tune the policy): it deliberately
starts from a WEAK VAR — reference-scale collect quota (50/class),
which underfits the builtin renders (reward-landscape probe
scripts/var_probe.py: near-chance class separation) — trains a policy
to that VAR's ceiling, evaluates it, then runs `--rounds` rounds of the
shipped `var_tpu.train.self_improve.self_improve()` driver, evaluating
and reward-landscape-probing after each. Collected shards accumulate
across rounds (selfimprove_<i> naming), so the artifact records the
whole improvement curve — E2E_r03.json's arm curve
(0.031 -> 0.48 -> 0.61 -> 0.78) is this script's output shape.

    python scripts/self_improve_demo.py arms /tmp/si_demo --rounds 3

Writes/updates profiles.<env>.self_improve_demo in --out
(default E2E_r03.json).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import e2e_run  # noqa: E402  (shares build_config / scale_eval_quotas)


def run_eval(args, var_ckpt, rl_ckpt):
    """Deterministic per-class round-robin eval of one checkpoint pair.

    A FRESH config per eval: scale_eval_quotas mutates soundSource sizes
    in place, which must not leak into later collect/fine-tune stages.

    With --eval-backend device the device-resident evaluator
    (RLDeviceSimEval, trajectory-parity-tested twin of the host success
    rules) scores per-class forced batches instead — ~150x cheaper per
    episode, enabling 1024-episode CIs and a per-class breakdown; returns
    (rate, n_eps, extra_dict).
    """
    from var_tpu.train.rl import RLTrainer

    if getattr(args, "eval_backend", "host") == "device":
        import numpy as np
        import jax
        import jax.numpy as jnp

        cfg = e2e_run.build_config(
            args.env, args.work, rl_steps=1, eval_per_class=1,
            extra_set=args.set_items)
        cfg.override(RLTrain=False, RLDeviceSimEval=True,
                     pretextModelLoadDir=var_ckpt)
        tr = RLTrainer(cfg, env=args.env)
        tr.load_pretext()
        eng = tr.device_eval_engine(args.eval_envs)
        params = tr.load_policy_params(rl_ckpt)
        rng = jax.random.PRNGKey(11)
        per_class = []
        batches = -(-args.eval_per_class // args.eval_envs)
        for c in range(cfg.taskNum):
            hits = tot = 0
            for _ in range(batches):
                rng, sub = jax.random.split(rng)
                s, _, _ = eng.eval_batch(
                    params, jnp.full((args.eval_envs,), c, jnp.int32), sub)
                hits += int(np.sum(np.asarray(s)))
                tot += args.eval_envs
            per_class.append(hits / tot)
        rate = float(np.mean(per_class))
        n = batches * args.eval_envs * cfg.taskNum
        return rate, n, {
            "per_class": [round(r, 3) for r in per_class],
            "ci95": round(e2e_run.binom_ci95(rate, n), 4),
            "evaluator": "device-sim (RLDeviceSimEval twin)"}

    cfg = e2e_run.build_config(
        args.env, args.work, rl_steps=0, eval_per_class=args.eval_per_class,
        num_envs=args.num_envs, device_sim=True,
        extra_set=args.set_items)
    cfg.override(RLTrain=False, vecEnvBackend="dummy")
    per_env = max(1, args.eval_per_class // args.eval_envs)
    e2e_run.scale_eval_quotas(cfg, per_env)
    if hasattr(cfg, "testEpisodesPerClass"):
        cfg.override(testEpisodesPerClass=per_env)
    rl_eval = RLTrainer(cfg, env=args.env)
    rl_eval.load_pretext(path=var_ckpt)
    rate = rl_eval.testRL(policy_path=rl_ckpt, num_envs=args.eval_envs)
    return rate, per_env * args.eval_envs * cfg.taskNum, {}


def run_probe(args, var_ckpt):
    """Reward-landscape probe of one VAR checkpoint (profile-appropriate:
    scripts/var_probe.py probe_2d for the arm, scripts/grid_probe.py for
    the grid) — the quantity that predicts task success."""
    from var_tpu.config import gym_register, main_config
    from var_tpu.train.pretext import PretextTrainer

    from var_tpu.cli import parse_set_items

    cfg = main_config(env=args.env)
    if args.set_items:
        cfg.override(**parse_set_items(args.set_items))
    cfg.override(pretextModelLoadDir=var_ckpt, RLTrain=True)
    gym_register(cfg, env=args.env)
    pt = PretextTrainer(cfg)
    pt.loadPretextModel()
    params = pt.variables["params"]
    # round-3 lesson (VERDICT weak #2): n_layouts=2/3 gave 8-12 binary
    # samples per probe — the "probe falls while success rises" SI-grid
    # anomaly was 5/8 vs 3/8, i.e. sampling noise. Probe with >=8
    # layouts so the probe can actually corroborate (or contradict) the
    # eval trend.
    if args.env == "arms":
        import var_probe

        rate, mean_off = var_probe.probe_2d(cfg, pt.model, params,
                                            n_layouts=8, verbose=False)
        return {"peak_in_hitbox": round(rate, 3),
                "mean_peak_offset_cm": round(mean_off * 100, 1),
                "n_samples": 8 * cfg.taskNum}
    import grid_probe

    pk, ca = grid_probe.probe(cfg, pt.model, params, n_layouts=8,
                              verbose=False)
    return {"peak_accuracy": round(pk, 3),
            "on_object_class_accuracy": round(ca, 3),
            "n_samples": 8 * cfg.taskNum}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env", choices=["arms", "ai2thor"])
    ap.add_argument("work")
    # weak baseline: reference-scale quota (config.py:86 pretextCollectNum
    # 50/class) + reference epoch budget -> an underfit VAR on the builtin
    # renders, the realistic "deployed with too little data" starting point
    ap.add_argument("--weak-per-class", type=int, default=50)
    ap.add_argument("--weak-var-epochs", type=int, default=40)
    ap.add_argument("--weak-rl-steps", type=int, default=8_000_000)
    # improvement round: the E2E-recipe data scale
    ap.add_argument("--improve-per-class", type=int, default=800)
    ap.add_argument("--ft-var-epochs", type=int, default=80)
    ap.add_argument("--ft-rl-steps", type=int, default=6_000_000)
    ap.add_argument("--rounds", type=int, default=1,
                    help="number of self_improve() rounds; collected "
                         "shards accumulate across rounds (selfimprove_<i> "
                         "naming), each round is evaluated and probed "
                         "separately so the artifact records the curve")
    ap.add_argument("--num-envs", type=int, default=64)
    ap.add_argument("--rl-lr", type=float, default=None)
    ap.add_argument("--ent-coef", type=float, default=0.02)
    ap.add_argument("--eval-per-class", type=int, default=16)
    ap.add_argument("--eval-envs", type=int, default=8)
    ap.add_argument("--eval-backend", default="host",
                    choices=["host", "device"],
                    help="'device' = RLDeviceSimEval per-class forced "
                         "batches (~150x cheaper/episode, 1024-ep CIs + "
                         "per-class breakdown); 'host' = the canonical "
                         "testRL stack")
    ap.add_argument("--var-mode", default="finetune",
                    choices=["finetune", "scratch"],
                    help="step-2 recipe per round: 'finetune' = reference "
                         "frozen-association VARFineTuneDataset fine-tune; "
                         "'scratch' = from-scratch VARDataset retrain over "
                         "all accumulated shards (round-3 finding: the "
                         "frozen association caps arm SI at ~0.7-0.8 vs "
                         "~0.89 from scratch)")
    ap.add_argument("--set", nargs="*", default=[], metavar="KNOB=VALUE",
                    dest="set_items",
                    help="extra config overrides applied to every stage "
                         "(collect, VAR train, policy train, eval, probe) "
                         "-- e.g. the round-4 arm recipe: --set "
                         "representationDim=8 pretextCoverageCollect=True "
                         "pretextHardNegProb=0.7")
    ap.add_argument("--improve-set", nargs="*", default=[],
                    metavar="KNOB=VALUE", dest="improve_set_items",
                    help="extra overrides applied ONLY to the improve "
                         "rounds' collect/VAR/policy stages (on top of "
                         "--set), keeping the weak baseline at reference "
                         "semantics -- e.g. pretextEndFlankFrac=0.2")
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the reward-landscape probes recorded after "
                         "each eval stage")
    ap.add_argument("--stages", default="weak,weak_eval,improve,final_eval")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "E2E_r03.json"))
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    from var_tpu.train.checkpoint import latest_checkpoint
    from var_tpu.train.pretext import PretextTrainer
    from var_tpu.train.rl import RLTrainer

    def persist(result):
        """Merge the current result into --out immediately. Called after
        every eval stage so a killed run (session restarts, OOM — see
        ROADMAP 'known environment issues') keeps its completed rounds."""
        import jax

        result["hardware"] = str(jax.devices()[0])
        doc = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc.setdefault("profiles", {}).setdefault(args.env, {})[
            "self_improve_demo"] = result
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=2)

    var_step = ("VARFineTuneDataset fine-tune" if args.var_mode == "finetune"
                else "from-scratch VARDataset retrain over accumulated shards")
    result = {
        "pipeline": "weak VAR -> PPO -> eval, then self_improve() rounds "
                    f"(collect -> {var_step} -> policy "
                    "fine-tune, full-state resume) -> eval after each",
        "var_mode": args.var_mode,
        "weak": {"collect_per_class": args.weak_per_class,
                 "var_epochs": args.weak_var_epochs,
                 "rl_steps": args.weak_rl_steps},
        "recipe_set": list(args.set_items),
        "improve_set": list(args.improve_set_items),
        "rounds": [],
    }
    timings = {}
    # continuation support: a later invocation (e.g. --stages
    # improve,final_eval to add rounds) preloads the artifact's existing
    # weak baseline + rounds so persist() keeps the whole curve
    if "weak" not in stages and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f).get("profiles", {}).get(
                args.env, {}).get("self_improve_demo", {})
        if prev.get("rounds") or prev.get("weak", {}).get("success_rate"):
            result["weak"] = prev.get("weak", result["weak"])
            result["rounds"] = prev.get("rounds", [])
            timings.update(prev.get("timings_s", {}))
    weak_var_ckpt = os.path.join(args.work, "var_model",
                                 str(args.weak_var_epochs - 1))
    ft_var_ckpt = os.path.join(args.work, "var_model",
                               str(args.ft_var_epochs - 1))

    if "weak" in stages:
        t0 = time.time()
        cfg = e2e_run.build_config(
            args.env, args.work, args.weak_rl_steps, args.eval_per_class,
            rl_lr=args.rl_lr, num_envs=args.num_envs,
            ent_coef=args.ent_coef, collect_per_class=args.weak_per_class,
            var_epochs=args.weak_var_epochs, device_sim=True,
            extra_set=args.set_items)
        pretext = PretextTrainer(cfg)
        pretext.collectPretextData()
        pretext.trainRepresentation()
        timings["weak_var_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        rl = RLTrainer(cfg, env=args.env)
        rl.load_pretext()
        rl.trainRL()
        timings["weak_rl_s"] = round(time.time() - t0, 1)

    if "weak_eval" in stages:
        t0 = time.time()
        ckpt = latest_checkpoint(os.path.join(args.work, "rl_model"))
        rate, n_eps, extra = run_eval(args, weak_var_ckpt, ckpt)
        timings["weak_eval_s"] = round(time.time() - t0, 1)
        result["weak"].update(success_rate=rate, eval_episodes=n_eps,
                              checkpoint=ckpt, **extra)
        print(f"WEAK baseline success: {rate:.3f} over {n_eps} episodes")
        if not args.no_probe:
            result["weak"]["reward_landscape_probe"] = run_probe(
                args, weak_var_ckpt)
            print("weak probe:", result["weak"]["reward_landscape_probe"])
        result["timings_s"] = timings
        persist(result)

    if "improve" in stages:
        from var_tpu.train.self_improve import self_improve

        cfg = e2e_run.build_config(
            args.env, args.work, args.ft_rl_steps, args.eval_per_class,
            rl_lr=args.rl_lr, num_envs=args.num_envs,
            ent_coef=args.ent_coef,
            collect_per_class=args.improve_per_class,
            var_epochs=args.weak_var_epochs, device_sim=True,
            extra_set=list(args.set_items) + list(args.improve_set_items))
        # build_config points pretextModelLoadDir at the weak VAR's last
        # epoch — exactly the checkpoint round 1's fine-tune must start
        # from; self_improve() itself advances it to the newly fine-tuned
        # checkpoint, so reusing ONE cfg across rounds chains them (and
        # next_selfimprove_index keeps each round's collected shard, so
        # the fine-tune dataset accumulates)
        for r in range(args.rounds):
            t0 = time.time()
            self_improve(cfg, rounds=1, env=args.env,
                         pretext_epochs=args.ft_var_epochs,
                         rl_steps=args.ft_rl_steps,
                         var_mode=args.var_mode)
            round_rec = {
                "round": len(result["rounds"]) + 1,
                "var_mode": args.var_mode,
                "collect_per_class": args.improve_per_class,
                "ft_var_epochs": args.ft_var_epochs,
                "ft_rl_steps": args.ft_rl_steps,
                "train_s": round(time.time() - t0, 1),
            }
            if "final_eval" in stages:
                t0 = time.time()
                ckpt = latest_checkpoint(
                    os.path.join(args.work, "rl_model"))
                rate, n_eps, extra = run_eval(args, ft_var_ckpt, ckpt)
                round_rec.update(success_rate=rate, eval_episodes=n_eps,
                                 checkpoint=ckpt,
                                 eval_s=round(time.time() - t0, 1), **extra)
                print(f"ROUND {r + 1} success: {rate:.3f} over "
                      f"{n_eps} episodes")
                if not args.no_probe:
                    round_rec["reward_landscape_probe"] = run_probe(
                        args, ft_var_ckpt)
                    print(f"round {r + 1} probe:",
                          round_rec["reward_landscape_probe"])
            result["rounds"].append(round_rec)
            result["timings_s"] = timings
            persist(result)
    elif "final_eval" in stages:
        # standalone eval of whatever the work dir currently holds (e.g.
        # re-scoring after an out-of-band resume)
        ckpt = latest_checkpoint(os.path.join(args.work, "rl_model"))
        rate, n_eps, extra = run_eval(args, ft_var_ckpt, ckpt)
        rec = {"success_rate": rate, "eval_episodes": n_eps,
               "checkpoint": ckpt, **extra}
        if not args.no_probe:
            rec["reward_landscape_probe"] = run_probe(args, ft_var_ckpt)
        result["rounds"].append(rec)
        print(f"EVAL success: {rate:.3f} over {n_eps} episodes")

    result["timings_s"] = timings
    persist(result)
    print("self-improve demo result:", json.dumps(result))


if __name__ == "__main__":
    main()
