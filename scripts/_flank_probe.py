"""Round-5 probe: does end-slot flank coverage close the outward reward
leak (class_3 drag, ROADMAP round-4 notes) without hurting the in-box
peak? Compares ref-collection vs ref+pretextEndFlankFrac on
representationDim=8 at 800/class, reporting the existing probes plus a
1-D outward-leak metric for the two end slots.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def end_leak(cfg, model, params, n_layouts=8, seed=11):
    """For each end slot: on-object reward vs max reward in the OUTWARD
    zone (hitbox edge + 1 cm .. 10 cm from centre). A well-covered VAR
    keeps the outward zone well below the on-object value; the round-4
    failure mode keeps it near-peak out to 6-8 cm."""
    import jax.numpy as jnp

    from var_tpu.envs.arm_sim import OBJ_HALF_Y
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
    out = {}
    for cls, sign in ((0, -1.0), (cfg.taskNum - 1, +1.0)):
        on_peak, leak_max, leak_frac = [], [], []
        for li in range(n_layouts):
            env._randomize()
            inv = {v: k for k, v in env.objOrder.items()}
            obj = env.objPose[inv[cls]]
            dys = np.concatenate([[0.0], sign * np.linspace(
                OBJ_HALF_Y + 0.01, 0.10, 19)])
            imgs = []
            for dy in dys:
                env.ee = np.array([obj[0], obj[1] + dy])
                imgs.append(env.get_image().transpose(2, 0, 1))
            ifeat = np.asarray(model.apply(
                {"params": params},
                jnp.asarray(np.stack(imgs), jnp.float32) / 255.0,
                method=model.encode_image)[1])
            R = ifeat @ feats[cls]
            on_peak.append(float(R[0]))
            leak_max.append(float(R[1:].max()))
            # fraction of outward points whose best class is still cls
            allR = ifeat[1:] @ feats.T  # (19, taskNum)
            leak_frac.append(float(np.mean(allR.argmax(1) == cls)))
        out[f"class_{cls}"] = {
            "on_object_reward": round(float(np.mean(on_peak)), 3),
            "outward_leak_max": round(float(np.mean(leak_max)), 3),
            "outward_argmax_frac": round(float(np.mean(leak_frac)), 3),
        }
    return out


def main():
    from var_probe import probe, probe_2d
    from var_sweep import collect, make_cfg

    from var_tpu.train.pretext import PretextTrainer

    results = {}
    for name, cknobs in (
            ("ref", {}),
            ("flank25b", {"pretextEndFlankFrac": 0.25}),
            ("flank15b", {"pretextEndFlankFrac": 0.15}),
    ):
        work = f"/tmp/flank_probe/{name}"
        os.makedirs(work, exist_ok=True)
        collect(work, 800, cknobs)
        knobs = dict(cknobs)
        knobs["representationDim"] = 8
        cfg = make_cfg(work, 800, 60, knobs)
        pt = PretextTrainer(cfg)
        t0 = time.time()
        losses = pt.trainRepresentation(plot=False)
        row = {
            "final_loss": round(losses[-1], 5),
            "train_s": round(time.time() - t0, 1),
        }
        pk1d, cls_acc = probe(cfg, pt.model, pt.variables["params"], 8,
                              verbose=False)
        in_box, mean_off = probe_2d(cfg, pt.model, pt.variables["params"],
                                    8, verbose=False)
        row.update(peak_1d=round(pk1d, 3), class_acc=round(cls_acc, 3),
                   peak_in_hitbox=round(in_box, 3),
                   mean_peak_offset_cm=round(mean_off * 100, 2))
        row["end_leak"] = end_leak(cfg, pt.model, pt.variables["params"])
        results[name] = row
        print(name, json.dumps(row, indent=1))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "flank_probe_r5.json")
    if os.path.exists(out):
        prev = json.load(open(out))
        prev.update(results)
        results = prev
    json.dump(results, open(out, "w"), indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
