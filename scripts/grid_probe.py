#!/usr/bin/env python
"""VAR quality probe for the builtin grid (iTHOR-profile) task.

Sweeps the agent over free cells x all headings in several floor plans
and scores, per commanded task class, whether the VAR reward
dot(image_feat, goal_feat) peaks at a pose that actually sees the
commanded object in the progress-consistent toggle state — the property
PPO training depends on (the reward the policy climbs is exactly this
dot product, reference: Envs/vec_env/vec_pretext_normalize.py:96-101).
Used to size the pretext stage for the grid E2E runs, like
scripts/var_probe.py does for the arm.

    python scripts/grid_probe.py <model_dir> [n_layouts]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def probe(cfg, model, params, n_layouts=3, seed=11, verbose=True,
          max_cells=40, return_per_class=False):
    """Returns (peak_accuracy, argmax_class_accuracy):
    - peak_accuracy: fraction of (layout, class) pairs where the
      highest-reward pose in the sweep is labeled with the commanded
      class (sees exactly the commanded object, progress-consistent act);
    - argmax_class_accuracy: fraction of single-object-visible sweep
      poses whose best-matching class embedding is the pose's RL label
      (the grid labeling rule, grid_sim.py get_positive_negative)."""
    import jax.numpy as jnp

    from var_tpu.envs.core import make
    from var_tpu.envs.grid_sim import Task

    env = make(cfg.RLEnvName)
    env.seed(seed)
    env.reset()
    rng = np.random.RandomState(seed)

    # class goal embeddings (one utterance per class, like the RL episode)
    feats = np.stack([
        np.asarray(model.apply(
            {"params": params},
            jnp.asarray(env.audio.getAudioFromTask(rng, t, Task)[0])[None],
            method=model.encode_sound)[1])[0]
        for t in env.taskList])

    rots = np.arange(0, 360, cfg.rotateStepDegrees, dtype=np.float64)
    peak_hits, cls_hits, cls_total, n_pairs = 0, 0, 0, 0
    # per-class breakdown (round-5: locate the Television/off drag)
    pc_peak = np.zeros((cfg.taskNum, 2), np.int64)   # hits, totals
    pc_cls = np.zeros((cfg.taskNum, 2), np.int64)
    scenes = cfg.allScene[env.taskList[0].loc]
    for li in range(n_layouts):
        env.floor_plan = int(scenes[li % len(scenes)])
        env._build_world()
        free = np.argwhere(env.grid == 0)
        free = [c for c in free if env._free(c)]
        if len(free) > max_cells:
            free = [free[i] for i in
                    rng.choice(len(free), max_cells, replace=False)]
        for cls, task in enumerate(env.taskList):
            env.task = task
            env.taskID = cls
            env._setup_task()
            # The VAR is trained with STATE-consistent labels (a view of
            # the lamp ON pairs with the "turn on" utterance — reference
            # pretext_env_VAR.py:34-43), so the reward peaks only in the
            # task-DONE state. _setup_task forces the anti state (episode
            # start); flip the commanded object to the post-act state so
            # the sweep probes the landscape PPO must climb to.
            env.objects[task.obj]["isToggled"] = (
                task.act == "ToggleObjectOn")
            imgs, labels = [], []
            for cell in free:
                for rot in rots:
                    env.pos = np.asarray(cell)
                    env.rot = float(rot)
                    visible = env.visible_objects()
                    if len(visible) == 1:
                        lbl = env.task2ID[
                            Task(task.loc, visible[0],
                                 env._pos_act(visible[0]))]
                    else:
                        lbl = cfg.taskNum
                    imgs.append(env.get_image().transpose(2, 0, 1))
                    labels.append(lbl)
            labels = np.asarray(labels)
            imgs = jnp.asarray(np.stack(imgs), jnp.float32) / 255.0
            img_feat = np.asarray(model.apply(
                {"params": params}, imgs, method=model.encode_image)[1])
            R = img_feat @ feats.T  # (P, taskNum)
            n_pairs += 1
            hit = int(labels[int(np.argmax(R[:, cls]))] == cls)
            peak_hits += hit
            pc_peak[cls] += (hit, 1)
            on_obj = labels < cfg.taskNum
            if on_obj.any():
                cls_hits += int(np.sum(
                    np.argmax(R[on_obj], axis=1) == labels[on_obj]))
                cls_total += int(np.sum(on_obj))
                for c2 in range(cfg.taskNum):
                    sel = labels == c2
                    if sel.any():
                        pc_cls[c2] += (int(np.sum(
                            np.argmax(R[sel], axis=1) == c2)),
                            int(np.sum(sel)))
    peak_acc = peak_hits / max(1, n_pairs)
    cls_acc = cls_hits / max(1, cls_total)
    per_class = {
        str(task): {
            "peak": round(pc_peak[c, 0] / max(1, pc_peak[c, 1]), 3),
            "cls_acc": round(pc_cls[c, 0] / max(1, pc_cls[c, 1]), 3),
            "n_views": int(pc_cls[c, 1]),
        }
        for c, task in enumerate(env.taskList)
    }
    if verbose:
        print(f"probe: peak_accuracy {peak_acc:.2f} ({peak_hits}/{n_pairs}), "
              f"on-object class accuracy {cls_acc:.2f} "
              f"({cls_hits}/{cls_total})")
        for k, v in per_class.items():
            print(f"  {k}: peak {v['peak']:.2f} cls_acc {v['cls_acc']:.2f} "
                  f"({v['n_views']} views)")
    if return_per_class:
        return peak_acc, cls_acc, per_class
    return peak_acc, cls_acc


def main():
    from var_tpu.config import gym_register, main_config
    from var_tpu.train.pretext import PretextTrainer
    from var_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    model_dir = sys.argv[1]
    n_layouts = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg = main_config(env="ai2thor")
    cfg.override(pretextModelLoadDir=model_dir, RLTrain=True)
    gym_register(cfg, env="ai2thor")
    pt = PretextTrainer(cfg)
    pt.loadPretextModel()
    probe(cfg, pt.model, pt.variables["params"], n_layouts=n_layouts)


if __name__ == "__main__":
    main()
