import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np, jax.numpy as jnp
    from e2e_run import build_config
    from var_tpu.train.pretext import PretextTrainer
    from var_probe import probe_2d, probe

    cfg = build_config("arms", "/tmp/e2e_arm_r4", 1000, 1,
                       collect_per_class=1600, var_epochs=80,
                       extra_set=["representationDim=8"])
    pt = PretextTrainer(cfg)
    pt.loadPretextModel()
    probe(cfg, pt.model, pt.variables["params"], n_layouts=8)
    probe_2d(cfg, pt.model, pt.variables["params"], n_layouts=4)


if __name__ == "__main__":
    main()
