"""Shared CLI handling for the pretext.py / RL.py entry points.

The reference has no CLI at all — behavior is selected by editing config
files (reference: examples/README.md "### cfg.py"). Here the config-file
workflow still works unchanged, plus knobs can be overridden per run:

    python pretext.py --env arms --set pretextEpoch=5 'pretextDataDir=["d"]'
    python RL.py --set RLTrain=True RLTotalSteps=1e5
"""
from __future__ import annotations

import argparse
import ast
from typing import Optional, Sequence

from var_tpu.config import main_config


def parse_args(argv: Optional[Sequence[str]] = None, description: str = ""):
    # every CLI entry benefits from the persistent executable cache
    # (multi-minute fused-program compiles through a remote-compile
    # tunnel drop to seconds on any run after the first)
    from var_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "--env", choices=["arms", "ai2thor"], default=None,
        help="environment profile (default: VAR_TPU_ENV or 'ai2thor')")
    p.add_argument(
        "--set", nargs="*", default=[], metavar="KNOB=VALUE",
        help="config overrides; values are Python literals "
             "(e.g. --set pretextEpoch=5 RLTrain=True)")
    return p.parse_args(argv)


def parse_set_items(items):
    """KNOB=VALUE strings -> override dict; values are Python literals
    with bare-string and true/false/none fallbacks."""
    overrides = {}
    for item in items:
        if "=" not in item:
            raise SystemExit(
                f"--set expects KNOB=VALUE, got {item!r}")
        key, _, raw = item.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            low = raw.strip().lower()
            if low in ("true", "false"):
                # 'false' must not become a TRUTHY string silently
                value = low == "true"
            elif low in ("none", "null"):
                value = None
            else:
                value = raw  # bare strings: --set RLPolicyBase=arm_VAR
        overrides[key] = value
    return overrides


def build_config(args, role: str):
    config = main_config(env=args.env)
    config.pretext_RL = role
    overrides = parse_set_items(args.set)
    if overrides:
        try:
            config.override(**overrides)
        except AttributeError as e:
            raise SystemExit(str(e))
        # re-validate: the __init__-time check only saw the defaults
        config.cfg_check()
    return config
