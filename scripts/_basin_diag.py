"""Compare approach-basin profiles: smooth (ref) vs sharp (covhard7)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np, jax.numpy as jnp
    from e2e_run import build_config
    from var_tpu.train.pretext import PretextTrainer
    from var_tpu.envs.core import make

    for name, work, md in [
        ("ref_D8", "/tmp/var_sweep_full/ref",
         "/tmp/var_sweep_full/ref/var_representationDim8_tripletMargin1.0/59"),
        ("ch7_D8", "/tmp/var_sweep_1600/ch7",
         "/tmp/var_sweep_1600/ch7/var_representationDim8_tripletMargin1.0/79"),
    ]:
        cfg = build_config("arms", work, 1000, 1, collect_per_class=800,
                           var_epochs=60, extra_set=["representationDim=8"])
        cfg.override(pretextModelLoadDir=md)
        pt = PretextTrainer(cfg)
        pt.loadPretextModel()
        env = make(cfg.RLEnvName); env.seed(3); env.reset(); env._randomize()
        rng = np.random.RandomState(4)
        feats = np.stack([np.asarray(pt.model.apply(
            {"params": pt.variables["params"]},
            jnp.asarray(env.audio.genSoundFeat(intentIdx=c, featType="MFCC",
                        rand_fn=rng.randint)[0])[None],
            method=pt.model.encode_sound)[1])[0] for c in range(cfg.taskNum)])
        print(f"--- {name}: class-mean goal dot matrix")
        print(np.round(feats @ feats.T, 2))
        inv = {v: k for k, v in env.objOrder.items()}
        for cls in (1, 3):
            obj = env.objPose[inv[cls]]
            ys = obj[1] + np.linspace(-0.10, 0.10, 21)
            imgs = []
            for y in ys:
                env.ee = np.array([obj[0], y])
                imgs.append(env.get_image().transpose(2, 0, 1))
            ifeat = np.asarray(pt.model.apply(
                {"params": pt.variables["params"]},
                jnp.asarray(np.stack(imgs), jnp.float32) / 255.0,
                method=pt.model.encode_image)[1])
            R = ifeat @ feats[cls]
            print(f"{name} cls{cls} dy -10..+10cm:",
                  " ".join(f"{r:+.2f}" for r in R))


if __name__ == "__main__":
    main()
