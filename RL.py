#!/usr/bin/env python
"""RL entry point: train or evaluate the PPO policy with frozen-VAR reward.

Mirrors the reference `python RL.py` (reference: RL.py:286-291): loads the
frozen VAR, then trains (RLTrain=True) or evaluates (RLTrain=False) per the
active config profile. Env profile via VAR_TPU_ENV=arms|ai2thor.
"""
from var_tpu.config import main_config
from var_tpu.train.rl import RLTrainer


def main():
    config = main_config()
    config.pretext_RL = "RL"
    trainer = RLTrainer(config)
    trainer.run()


if __name__ == "__main__":
    main()
