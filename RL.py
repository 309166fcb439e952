#!/usr/bin/env python
"""RL entry point: train or evaluate the PPO policy with frozen-VAR reward.

Mirrors the reference `python RL.py` (reference: RL.py:286-291): loads the
frozen VAR, then trains (RLTrain=True) or evaluates (RLTrain=False) per the
active config profile. Env profile via --env / VAR_TPU_ENV; any knob can be
overridden with --set KNOB=VALUE.
"""
from var_tpu.cli import build_config, parse_args
from var_tpu.train.rl import RLTrainer


def main(argv=None):
    args = parse_args(argv, description=__doc__)
    config = build_config(args, role="RL")
    trainer = RLTrainer(config, env=args.env)
    trainer.run()


if __name__ == "__main__":
    main()
