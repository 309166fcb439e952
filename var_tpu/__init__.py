"""tpu-var: a TPU-native (JAX/XLA/Pallas) visual-audio representation framework.

A from-scratch rebuild of the capabilities of PeixinC/VoiceControlledRobot-VAR
(ICRA 2023, "Learning Visual-Audio Representations for Voice-Controlled
Robots") designed for TPU hardware:

- a fused MFCC audio frontend executed on-device (GEMM-native DFT -> mel ->
  log -> DCT, all MXU matmuls; reference: Envs/audioLoader.py),
- VAR encoders (image CNN / sound CNN+BiGRU) with an L2-normalized shared
  embedding sphere trained with a triplet margin loss
  (reference: models/pretext/*),
- an ikostrikov-lineage PPO learner rebuilt as pure jitted JAX with on-device
  GAE and clipped-surrogate updates (reference: models/ppo/*),
- host-side vectorized simulators behind a VecEnv protocol with batched
  frozen-VAR reward inference on-device every rollout step
  (reference: Envs/vec_env/*),
- data-parallel sharding of both training phases over a jax.sharding.Mesh.

The public surface mirrors the reference's two entry points (pretext.py, RL.py)
and cfg.py configuration semantics while the internals are idiomatic JAX.
"""

__version__ = "0.1.0"
