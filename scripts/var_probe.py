#!/usr/bin/env python
"""VAR quality probe for the builtin arm task: reward-landscape accuracy.

Sweeps the gripper across the object row over several randomized layouts
and scores, per commanded class, whether the VAR reward
dot(image_feat, goal_feat) peaks over the commanded object — the property
PPO training depends on. Used to size the pretext stage for the E2E runs.

    python scripts/var_probe.py <model_dir> [n_layouts]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def probe(cfg, model, params, n_layouts=5, seed=11, verbose=True):
    """Returns (peak_accuracy, argmax_class_accuracy):
    - peak_accuracy: fraction of (layout, class) pairs where the reward
      peak along the sweep lands on the commanded object;
    - argmax_class_accuracy: fraction of on-object sweep points whose
      best-matching class embedding is the object actually under the
      gripper (a 4-way classification view of the same embeddings)."""
    import jax.numpy as jnp

    from var_tpu.envs.core import make

    env = make(cfg.RLEnvName)
    env.seed(seed)
    env.reset()
    rng = np.random.RandomState(seed)

    feats = np.stack([
        np.asarray(model.apply(
            {"params": params},
            jnp.asarray(env.audio.genSoundFeat(
                intentIdx=c, featType="MFCC", rand_fn=rng.randint)[0])[None],
            method=model.encode_sound)[1])[0]
        for c in range(cfg.taskNum)])

    peak_hits, cls_hits, cls_total = 0, 0, 0
    for _ in range(n_layouts):
        env._randomize()
        xs = env.objPose[:, 0].mean()
        ys = np.linspace(cfg.yMin, cfg.yMax, 61)
        imgs = []
        for y in ys:
            env.ee = np.array([xs, y])
            imgs.append(env.get_image().transpose(2, 0, 1))
        imgs = jnp.asarray(np.stack(imgs), jnp.float32) / 255.0
        img_feat = np.asarray(model.apply(
            {"params": params}, imgs, method=model.encode_image)[1])
        slot_of = env.objOrder  # object index -> row slot (= class label)
        inv = {v: k for k, v in slot_of.items()}
        R = img_feat @ feats.T  # (61, taskNum)
        for cls in range(cfg.taskNum):
            ytrue = env.objPose[inv[cls]][1]
            peak_hits += int(abs(ys[np.argmax(R[:, cls])] - ytrue) <= 0.04)
        # classification view on on-object points
        for j, y in enumerate(ys):
            env.ee = np.array([xs, y])
            hit = env.ray_test()
            if hit >= 0:
                cls_total += 1
                cls_hits += int(np.argmax(R[j]) == slot_of[hit])
    pk = peak_hits / (n_layouts * cfg.taskNum)
    ca = cls_hits / max(1, cls_total)
    if verbose:
        print(f"probe: peak_accuracy {pk:.2f} "
              f"({peak_hits}/{n_layouts * cfg.taskNum}), "
              f"on-object class accuracy {ca:.2f} ({cls_hits}/{cls_total})")
    return pk, ca


def probe_2d(cfg, model, params, n_layouts=3, seed=11, verbose=True):
    """Full (x, y) reward-landscape sweep scored against the ray-test
    hit box — the metric that actually predicts task success.

    testPolicy success requires the FINAL-step ray cast to hit the
    commanded object (reference fourInARow.py:317-335), i.e. the gripper
    inside a ~±3 cm box, while dot(image_feat, goal_feat) saturates at
    ~1.0 over a plateau wider than that box. This probe reports, per
    (layout, class): the 2-D peak offset from the object and whether the
    peak pose's ray cast hits the commanded object (``in_box``). A VAR
    whose peaks are in-box gives PPO a landscape whose optimum IS the
    success criterion; peak offsets larger than the box predict policies
    that hover with high reward yet fail the eval (the 200k-step probe
    run failure mode: eprewmean ~41 but success ~0.05)."""
    import jax.numpy as jnp

    from var_tpu.envs.core import make

    env = make(cfg.RLEnvName)
    env.seed(seed)
    env.reset()
    rng = np.random.RandomState(seed)

    feats = np.stack([
        np.asarray(model.apply(
            {"params": params},
            jnp.asarray(env.audio.genSoundFeat(
                intentIdx=c, featType="MFCC", rand_fn=rng.randint)[0])[None],
            method=model.encode_sound)[1])[0]
        for c in range(cfg.taskNum)])

    xs = np.linspace(cfg.xMin, cfg.xMax, 21)
    ys = np.linspace(cfg.yMin, cfg.yMax, 41)
    in_box, offsets = 0, []
    for _ in range(n_layouts):
        env._randomize()
        imgs = []
        for x in xs:
            for y in ys:
                env.ee = np.array([x, y])
                imgs.append(env.get_image().transpose(2, 0, 1))
        imgs = jnp.asarray(np.stack(imgs), jnp.float32) / 255.0
        img_feat = np.asarray(model.apply(
            {"params": params}, imgs, method=model.encode_image)[1])
        R = (img_feat @ feats.T).reshape(len(xs), len(ys), cfg.taskNum)
        inv = {v: k for k, v in env.objOrder.items()}
        for cls in range(cfg.taskNum):
            i, j = np.unravel_index(np.argmax(R[:, :, cls]), R.shape[:2])
            tgt = env.objPose[inv[cls]]
            off = np.array([xs[i], ys[j]]) - tgt
            offsets.append(off)
            env.ee = np.array([xs[i], ys[j]])
            hit = env.ray_test()
            ok = hit >= 0 and env.objOrder[hit] == cls
            in_box += int(ok)
            if verbose:
                print(f"  cls{cls}: peak offset ({off[0]:+.3f},{off[1]:+.3f})"
                      f" R={R[i, j, cls]:.2f} in_box={ok}")
    n = n_layouts * cfg.taskNum
    rate = in_box / n
    mean_off = float(np.mean(np.linalg.norm(offsets, axis=1)))
    if verbose:
        print(f"probe_2d: peak-in-hit-box {rate:.2f} ({in_box}/{n}), "
              f"mean |peak offset| {mean_off * 100:.1f} cm")
    return rate, mean_off


def main():
    from var_tpu.config import gym_register, main_config
    from var_tpu.train.pretext import PretextTrainer

    model_dir = sys.argv[1]
    n_layouts = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cfg = main_config(env="arms")
    cfg.override(pretextModelLoadDir=model_dir, RLTrain=True)
    gym_register(cfg, env="arms")
    pt = PretextTrainer(cfg)
    pt.loadPretextModel()
    probe(cfg, pt.model, pt.variables["params"], n_layouts)
    probe_2d(cfg, pt.model, pt.variables["params"], max(1, n_layouts // 2))


if __name__ == "__main__":
    main()
