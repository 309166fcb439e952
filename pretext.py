#!/usr/bin/env python
"""Pretext entry point: collect triplets and/or train the VAR.

Mirrors the reference `python pretext.py` (reference: pretext.py:331-335):
behavior is selected by the active config profile's booleans
(pretextCollection / pretextTrain / ...). The env profile comes from
--env / VAR_TPU_ENV; any knob can be overridden with --set KNOB=VALUE.
"""
from var_tpu.cli import build_config, parse_args
from var_tpu.train.pretext import PretextTrainer


def main(argv=None):
    args = parse_args(argv, description=__doc__)
    config = build_config(args, role="pretext")
    trainer = PretextTrainer(config)
    trainer.run()


if __name__ == "__main__":
    main()
