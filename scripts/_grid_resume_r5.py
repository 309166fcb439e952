"""Round-5 grid E2E RL resume: continue the 10M-step run from the newest
checkpoint (full-state Orbax resume) — used by the stall babysitter
because the tunneled TPU backend intermittently freezes connections
mid-run (ROADMAP round-5 'tunnel stalls')."""
import os, sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from var_tpu.utils.jit_cache import enable_persistent_cache
enable_persistent_cache()
from e2e_run import build_config
from var_tpu.train.checkpoint import latest_checkpoint
from var_tpu.train.rl import RLTrainer

WORK = "/tmp/e2e_grid_r5"
TOTAL = 10_000_000
latest = latest_checkpoint(os.path.join(WORK, "rl_model"))
done_updates = int(os.path.basename(latest)) + 1
remaining = TOTAL - done_updates * 3200
print(f"resuming from {latest} ({done_updates} updates done, "
      f"{remaining} steps remaining)")
if remaining <= 0:
    open(os.path.join(WORK, "rl_model", "DONE_RL"), "w").write("done\n")
    sys.exit(0)
cfg = build_config("ai2thor", WORK, remaining, 64,
                   num_envs=64, collect_per_class=800, var_epochs=60,
                   device_sim=True,
                   extra_set=["pretextCollectNum=[800,800,1600,1600,3200]",
                              "RLLrDecay=linear", "RLModelSaveInterval=50"])
cfg.override(RLModelFineTune=True, RLModelLoadDir=latest)
t0 = time.time()
rl = RLTrainer(cfg, env="ai2thor")
rl.load_pretext()
rl.trainRL()
print("resume leg rl_train_s", round(time.time() - t0, 1))
open(os.path.join(WORK, "rl_model", "DONE_RL"), "w").write("done\n")
