#!/usr/bin/env python
"""VAR recipe sweep for the arm profile, scored by the reward-landscape
probe instead of full RL runs.

Round-3 finding (VERDICT.md weak #1): the arm VAR's reward peak lands
inside the ray-test success box only ~50% of the time, capping task
success at ~0.76-0.84 while the grid profile reaches 0.95+. This sweep
searches the collection/training recipe axes the probes isolated:

- collection: reference random-walk vs coverage teleport sampling,
  uniform vs spatially-hard negatives (arm_sim.py knobs);
- training: tripletMargin, representationDim, epochs.

Each variant is scored with scripts/var_probe.py's probe_2d
(peak-in-hitbox rate over full 2-D sweeps — the metric that predicts
PPO task success) plus the 1-D peak/classification probe. Results go to
artifacts/var_sweep.json; the best recipe feeds the round-4 E2E run.

    python scripts/var_sweep.py /tmp/var_sweep [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from var_tpu.utils.jit_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def make_cfg(work, collect_per_class, var_epochs, extra):
    from e2e_run import build_config

    cfg = build_config(
        "arms", work, rl_steps=1000, eval_per_class=1,
        collect_per_class=collect_per_class, var_epochs=var_epochs,
        extra_set=[f"{k}={v}" for k, v in extra.items()])
    return cfg


def collect(work, collect_per_class, knobs):
    """One collection per (coverage, hard-neg) setting; reused across
    training variants."""
    from var_tpu.train.pretext import PretextTrainer

    cfg = make_cfg(work, collect_per_class, 40, knobs)
    marker = os.path.join(work, "triplets", "DONE")
    if os.path.exists(marker):
        return
    pt = PretextTrainer(cfg)
    t0 = time.time()
    pt.collectPretextData()
    open(marker, "w").write(f"{time.time() - t0:.1f}s\n")
    print(f"collected {work} in {time.time() - t0:.1f}s")


def train_and_probe(work, collect_per_class, var_epochs, train_knobs,
                    collect_knobs, n_layouts=8):
    from var_probe import probe, probe_2d

    from var_tpu.train.pretext import PretextTrainer

    tag = "_".join(f"{k}{v}" for k, v in sorted(train_knobs.items()))
    model_dir = os.path.join(work, f"var_{tag}")
    knobs = dict(collect_knobs)
    knobs.update(train_knobs)
    knobs["pretextModelSaveDir"] = model_dir
    cfg = make_cfg(work, collect_per_class, var_epochs, knobs)
    pt = PretextTrainer(cfg)
    t0 = time.time()
    losses = pt.trainRepresentation(plot=False)
    train_s = time.time() - t0
    t0 = time.time()
    pk1d, cls_acc = probe(cfg, pt.model, pt.variables["params"],
                          n_layouts, verbose=False)
    in_box, mean_off = probe_2d(cfg, pt.model, pt.variables["params"],
                                n_layouts, verbose=False)
    return {
        "collect": collect_knobs, "train": train_knobs,
        "epochs": var_epochs,
        "final_loss": round(losses[-1], 5),
        "train_s": round(train_s, 1),
        "probe_s": round(time.time() - t0, 1),
        "peak_in_hitbox": round(in_box, 3),
        "mean_peak_offset_cm": round(mean_off * 100, 2),
        "peak_1d": round(pk1d, 3),
        "class_acc": round(cls_acc, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--collect-per-class", type=int, default=800)
    ap.add_argument("--var-epochs", type=int, default=40)
    ap.add_argument("--layouts", type=int, default=8)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--preset", default=None, choices=[None, "focused"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "var_sweep.json"))
    args = ap.parse_args()

    collect_variants = {
        "ref": {},  # reference semantics: random walk, uniform negatives
        "cov": {"pretextCoverageCollect": True},
        "covhard3": {"pretextCoverageCollect": True,
                     "pretextHardNegProb": 0.3},
        "covhard7": {"pretextCoverageCollect": True,
                     "pretextHardNegProb": 0.7},
    }
    train_variants = [
        {"tripletMargin": 1.0, "representationDim": 3},
        {"tripletMargin": 1.0, "representationDim": 8},
        {"tripletMargin": 1.0, "representationDim": 16},
        {"tripletMargin": 0.5, "representationDim": 8},
    ]
    if args.quick:
        collect_variants = {k: collect_variants[k] for k in ("ref", "covhard3")}
        train_variants = train_variants[:2]
    if args.preset == "focused":
        # confirmation sweep around the 800/class winner (covhard7 D8):
        # E2E-scale data, margin/dim/hardness neighborhood, tighter CI
        collect_variants = {
            "ch7": {"pretextCoverageCollect": True,
                    "pretextHardNegProb": 0.7},
            "ch9": {"pretextCoverageCollect": True,
                    "pretextHardNegProb": 0.9},
        }
        train_variants = [
            {"tripletMargin": 1.0, "representationDim": 8},
            {"tripletMargin": 2.0, "representationDim": 8},
            {"tripletMargin": 1.0, "representationDim": 16},
        ]

    results = []
    for cname, cknobs in collect_variants.items():
        work = os.path.join(args.root, cname)
        collect(work, args.collect_per_class, cknobs)
        for tknobs in train_variants:
            row = train_and_probe(
                work, args.collect_per_class, args.var_epochs,
                tknobs, cknobs, n_layouts=args.layouts)
            row["collect_name"] = cname
            results.append(row)
            print(json.dumps(row))
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                json.dump({"collect_per_class": args.collect_per_class,
                           "results": results}, f, indent=2)
    best = max(results, key=lambda r: (r["peak_in_hitbox"],
                                       -r["mean_peak_offset_cm"]))
    print("best:", json.dumps(best))


if __name__ == "__main__":
    main()
