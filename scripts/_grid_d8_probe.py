"""Quick probe: does representationDim=8 help the grid VAR too?
(round-5 planning evidence; compares D=3 vs D=8 on one collection)"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from var_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    import grid_probe
    from e2e_run import build_config
    from var_tpu.train.pretext import PretextTrainer

    work = "/tmp/grid_d8"
    out = []
    for dim in (3, 8):
        cfg = build_config(
            "ai2thor", work, 1000, 1, collect_per_class=800, var_epochs=60,
            extra_set=[f"representationDim={dim}",
                       f"pretextModelSaveDir='{work}/var_d{dim}'"])
        cfg.override(pretextModelLoadDir=os.path.join(
            work, f"var_d{dim}", "59"))
        pt = PretextTrainer(cfg)
        if dim == 3 and not os.path.exists(
                os.path.join(work, "triplets", "train")):
            pt.collectPretextData()
        losses = pt.trainRepresentation(log_csv=False)
        pk, ca = grid_probe.probe(cfg, pt.model, pt.variables["params"],
                                  n_layouts=8, verbose=False)
        row = {"dim": dim, "final_loss": round(losses[-1], 5),
               "peak_accuracy": round(pk, 3),
               "on_object_class_accuracy": round(ca, 3)}
        out.append(row)
        print(json.dumps(row), flush=True)
    print("RESULT", json.dumps(out))


if __name__ == "__main__":
    main()
