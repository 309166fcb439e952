"""Self-improvement loop: collect -> fine-tune VAR -> fine-tune policy.

The reference describes this flow in examples/README.md:31-45: after an
initial VAR + policy are trained, the deployed policy gathers new
(unlabeled) image/sound pairs, the VAR is fine-tuned on them with the
frozen association (VARFineTuneDataset), and the policy is fine-tuned
against the improved VAR (RLModelFineTune). This module wires those
existing pieces into one driver.
"""
from __future__ import annotations

import os
from typing import Optional

from var_tpu.config import gym_register
from var_tpu.data.triplets import load_env_data
from var_tpu.train.pretext import PretextTrainer
from var_tpu.train.rl import RLTrainer


def next_selfimprove_index(config) -> int:
    """First unused selfimprove_<i> shard index. Shard names must be
    unique across self_improve() *invocations* too, or a later call's
    collect overwrites an earlier round's data and the fine-tune dataset
    stops accumulating."""
    train_dir = os.path.join(config.pretextDataDir[0], "train")
    base = 0
    while os.path.exists(os.path.join(train_dir,
                                      f"selfimprove_{base}.pickle")):
        base += 1
    return base


def self_improve(
    config,
    rounds: int = 1,
    env: Optional[str] = None,
    pretext_epochs: Optional[int] = None,
    rl_steps: Optional[int] = None,
):
    """One or more improvement rounds.

    Each round:
      1. collect fresh pretext data with the current policy's env
         (random-collect protocol — label-free pairs);
      2. fine-tune the VAR on the new shards (frozen association);
      3. fine-tune the PPO policy against the updated frozen VAR.
    """
    gym_register(config, env=env)
    base = next_selfimprove_index(config)
    for r in range(rounds):
        print(f"=== self-improvement round {base + r} ===")

        # 1. collect
        pretext = PretextTrainer(config)
        pretext.collectPretextData(fileName=f"selfimprove_{base + r}")

        # 2. fine-tune the VAR (frozen image<->sound association)
        config.override(
            pretextDataset="VARFineTuneDataset",
            pretextModelFineTune=True,
        )
        pretext.loadPretextModel()
        ds = load_env_data(config, pretext._ensure_audio())
        pretext.trainRepresentation(
            epoch=pretext_epochs or config.pretextEpoch, dataset=ds)
        # newest checkpoint becomes the load target for the RL phase
        last_ep = (pretext_epochs or config.pretextEpoch) - 1
        config.override(pretextModelLoadDir=os.path.join(
            config.pretextModelSaveDir, str(last_ep)))

        # 3. fine-tune the policy against the improved VAR, resuming from
        # the NEWEST checkpoint of the previous round (not the stale
        # first-interval save the default RLModelLoadDir points at)
        from var_tpu.train.checkpoint import latest_checkpoint

        newest = latest_checkpoint(config.RLModelSaveDir)
        if newest is not None:
            config.override(RLModelLoadDir=newest)
        config.override(RLTrain=True, RLModelFineTune=True)
        rl = RLTrainer(config, env=env)
        rl.load_pretext()
        rl.trainRL(total_steps=rl_steps)
    print("self-improvement complete")
