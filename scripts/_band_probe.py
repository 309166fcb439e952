"""One-off: ch7 + widened collection band (end-slot leak fix probe).

NOTE: body must stay under the __main__ guard — the vec-env forkserver
imports the main module in its server process (spawn.import_main_path),
so unguarded top-level work re-executes there and kills the server
(BrokenPipeError on worker start).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from var_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    from var_sweep import collect, train_and_probe

    cknobs = {"pretextCoverageCollect": True, "pretextHardNegProb": 0.7,
              "pretextBoundaryBand": 0.06}
    work = "/tmp/var_sweep_band6"
    collect(work, 1600, cknobs)
    row = train_and_probe(work, 1600, 80,
                          {"tripletMargin": 1.0, "representationDim": 8},
                          cknobs, n_layouts=16)
    row["collect_name"] = "ch7band6"
    print(json.dumps(row))


if __name__ == "__main__":
    main()
