#!/usr/bin/env python
"""Quick-start: the complete two-stage pipeline in one script.

Runs (1) triplet collection, (2) VAR training, (3) PPO training with the
frozen-VAR reward, and (4) deterministic evaluation — on the built-in
simulators with the synthetic audio source, scaled down so it finishes in
minutes. This is the programmatic equivalent of the CLI recipes in
examples/README.md.

    python examples/run_full_pipeline.py [arms|ai2thor] [workdir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from var_tpu.config import gym_register, main_config  # noqa: E402
from var_tpu.train.pretext import PretextTrainer  # noqa: E402
from var_tpu.train.rl import RLTrainer  # noqa: E402


def main():
    env = sys.argv[1] if len(sys.argv) > 1 else "arms"
    work = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        "data", "quickstart")

    cfg = main_config(env=env)
    cfg.override(
        pretextDataDir=[os.path.join(work, "triplets")],
        pretextModelSaveDir=os.path.join(work, "var_model"),
        pretextModelLoadDir=os.path.join(work, "var_model", "4"),
        RLModelSaveDir=os.path.join(work, "rl_model"),
        RLModelLoadDir=os.path.join(work, "rl_model", "00000"),
        pretextCollectNum=[20, 20, 20, 20, 40],
        pretextDataEpisode=20,
        pretextEnvMaxSteps=10,
        pretextEpoch=5,
        pretextModelSaveInterval=5,
        pretextTrainBatchSize=32,
        pretextModelFineTune=False,
        pretextDataset="VARDataset",
        RLTrain=True,
        RLModelFineTune=False,
        RLNumEnvs=4,
        RLEnvMaxSteps=20,
        ppoNumSteps=20,
        RLTotalSteps=4 * 20 * 5,  # 5 PPO updates
        RLModelSaveInterval=5,
        RLLogInterval=1,
    )
    cfg.skillInfos[0]["path"] = os.path.join(work, "rl_model", "00004")
    gym_register(cfg, env=env)

    print("=== stage 1: collect triplets + train the VAR ===")
    pretext = PretextTrainer(cfg)
    pretext.collectPretextData()
    pretext.trainRepresentation()
    pretext.plotRepresentation(
        __import__("var_tpu.data.triplets", fromlist=["load_env_data"])
        .load_env_data(cfg, pretext._ensure_audio()))

    print("=== stage 2: PPO with frozen-VAR reward ===")
    rl = RLTrainer(cfg, env=env)
    rl.load_pretext()
    rl.trainRL()

    print("=== stage 3: deterministic evaluation ===")
    cfg.override(RLTrain=False)
    rl_eval = RLTrainer(cfg, env=env)
    rl_eval.load_pretext()
    rate = rl_eval.testRL(num_episodes=4)
    print(f"quickstart complete; success rate {rate:.2f}; artifacts in {work}")


if __name__ == "__main__":
    main()
