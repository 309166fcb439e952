#!/usr/bin/env python
"""Pretext entry point: collect triplets and/or train the VAR.

Mirrors the reference `python pretext.py` (reference: pretext.py:331-335):
behavior is selected by the active config profile's booleans
(pretextCollection / pretextTrain / ...). The active env profile comes
from var_tpu.config.ENV (override with VAR_TPU_ENV=arms|ai2thor).
"""
from var_tpu.config import main_config
from var_tpu.train.pretext import PretextTrainer


def main():
    config = main_config()
    config.pretext_RL = "pretext"
    trainer = PretextTrainer(config)
    trainer.run()


if __name__ == "__main__":
    main()
