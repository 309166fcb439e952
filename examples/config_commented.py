"""Fully commented configuration walkthrough (AI2Thor profile).

The counterpart of the reference's examples/config_commented.py: every knob
of AI2ThorConfig explained. This file is documentation — import
var_tpu.config.AI2ThorConfig for the real thing; all knob names and
defaults match it.
"""
import os


class AI2ThorConfigCommented:
    def __init__(self):
        # ------------------------------------------------------------------
        # Visualization
        # ------------------------------------------------------------------
        # Open a live view of the env (requires a display + real simulator).
        self.render = False
        # Add a third-person camera view (iTHOR adapter only).
        self.use3rdCam = False
        # Render with the local Unity window (False = headless CloudRendering).
        self.renderUnity = True
        # Live quiver plot of embeddings while controlling the agent.
        self.realTimeVec = False

        # ------------------------------------------------------------------
        # VAR (pretext) stage
        # ------------------------------------------------------------------
        # Run triplet collection when pretext.py executes.
        self.pretextCollection = True
        # Run VAR training when pretext.py executes.
        self.pretextTrain = True
        # Interactive modes (need a TTY/display).
        self.pretextManualControl = False
        self.pretextManualCollect = False
        # Per-class triplet quotas; the last entry is the "empty" class
        # (agent sees nothing). Collection stops when all quotas are met.
        self.pretextCollectNum = [100, 100, 100, 100, 100]
        # Store raw sound features inside the shards (True) or pair sounds
        # with images at load time (False, recommended — pairs re-randomize
        # every epoch, a free augmentation).
        self.pretextDataHasSound = False
        # Fine-tune mode: the image<->sound association is frozen at dataset
        # construction (no labels at fine-tune time).
        self.pretextModelFineTune = False
        # Shard directories; each holds <dir>/train/*.pickle.
        self.pretextDataDir = [os.path.join("data", "pretext_training", "d")]
        # Per-directory cap on shard files ('all' or an int).
        self.pretextDataFileLoadNum = ["all"]
        # Dataset semantics ('VARDataset' resamples sounds per epoch,
        # 'VARFineTuneDataset' freezes the pairing).
        self.pretextDataset = "VARDataset"
        # Encoder architecture registry key.
        self.pretextModel = "ai2thor_VARPretextNet"
        # Checkpointing.
        self.pretextModelSaveDir = os.path.join("data", "pretext_model", "d")
        self.pretextModelLoadDir = os.path.join("data", "pretext_model", "d", "39")
        self.pretextModelSaveInterval = 10  # epochs between checkpoints
        # Host-side data-prep workers (the MFCC itself runs on the TPU).
        self.pretextDataNumWorkers = 8
        # Collection episode budget per shard file / number of shard files.
        self.pretextDataEpisode = 200
        self.pretextDataNumFiles = 20
        # Optimization.
        self.pretextTrainBatchSize = 128
        self.pretextTestBatchSize = 128
        self.pretextLR = 1e-4
        self.pretextAdamL2 = 1e-6        # torch-Adam-style L2 on gradients
        self.pretextLRStep = "step"      # MultiStepLR stepping per epoch
        self.pretextEpoch = 40
        self.pretextLRDecayEpoch = [20, 30]  # milestones
        self.pretextLRDecayGamma = 0.2
        # Embedding sphere dimensionality (3 = plot-friendly unit sphere).
        self.representationDim = 3
        self.tripletMargin = 1.0
        # Evaluation of the VAR ('plot' renders the embedding sphere).
        self.pretextTestMethod = "plot"
        self.plotRepresentation = 50     # plot every N epochs (-1 = off)
        self.plotNumBatch = 7            # batches of points on the plot
        self.annotateLastBatch = False
        self.plotRepresentationExtra = False
        self.plotExtraPath = os.path.join("data", "episodeRecord", "extra")
        # Pretext env.
        self.pretextEnvName = "ai2thor-pretext-v2"
        self.pretextEnvMaxSteps = 15     # steps per collection episode
        self.pretextEnvSeed = 977
        self.pretextNumEnvs = 4          # parallel collection workers
        self.pretextVisibilityDistance = 100.0  # label-anything collection

        # ------------------------------------------------------------------
        # RL stage
        # ------------------------------------------------------------------
        self.RLTrain = True              # train (True) or evaluate (False)
        self.RLManualControl = False     # keyboard control (TTY required)
        self.RLManualControlLoaded = False
        self.RLModelFineTune = False     # warm-start from RLModelLoadDir
        self.RLPolicyBase = "ai2thor_VAR"  # policy architecture key
        self.RLGamma = 0.99
        self.RLRecurrentPolicy = True    # GRU policy core
        self.RLLr = 6e-5
        self.RLEps = 1e-5                # Adam epsilon
        self.RLMaxGradNorm = 0.5
        self.RLTotalSteps = 1e6          # total env steps
        self.RLModelSaveInterval = 200   # updates between checkpoints
        self.RLLogInterval = 100         # updates between log rows
        self.RLModelSaveDir = os.path.join("data", "RL_model", "d")
        self.RLModelLoadDir = os.path.join("data", "RL_model", "d", "00000")
        self.RLUseProperTimeLimits = False  # bad_masks handling in GAE
        self.RLRecurrentSize = 1024      # GRU hidden size
        self.RLRecurrentInputSize = 128
        self.RLActionHiddenSize = 128
        # RL env.
        self.RLEnvMaxSteps = 50          # episode horizon
        self.RLRewardSoundSound = False  # add dot(current_sound, goal_sound)
        self.RLEnvName = "ai2thor-RL-v2"
        self.RLEnvSeed = 349
        self.RLNumEnvs = 8               # parallel env workers
        self.RLVisibilityDistance = 1.5  # toggle reach at RL time
        self.RLVisibleGrid = 9           # egocentric occupancy crop size
        # Obs keys excluded from rollout storage (consumed by the reward
        # wrapper instead of the policy).
        self.RLObsIgnore = {"current_sound", "goal_sound", "goal_sound_label"}
        # Episode image dumps.
        self.episodeImgSaveDir = os.path.join("data", "episodeRecord", "tmp")
        self.episodeImgSaveInterval = -1
        self.episodeImgSize = (480, 480, 3)
        # PPO.
        self.ppoClipParam = 0.2
        self.ppoEpoch = 4
        self.ppoNumMiniBatch = 2
        self.ppoValueLossCoef = 0.5
        self.ppoEntropyCoef = 0.01
        self.ppoUseGAE = True
        self.ppoGAELambda = 0.95
        self.ppoNumSteps = self.RLEnvMaxSteps  # rollout length T
        # Evaluation.
        self.success_threshold = 1       # goal_area_count >= this -> success
        self.RLDeterministic = True      # mode() actions at eval
        self.skillInfos = [{             # checkpoints to evaluate
            "path": os.path.join("data", "RL_model", "d", "00000"),
            "actionDim": 8, "actionOffset": 0,
        }]

        # ------------------------------------------------------------------
        # Sound commands
        # ------------------------------------------------------------------
        self.sound_dim = (1, 600, 40)    # (channel, frames, MFCC coeffs)
        self.commonMediaPath = os.path.join("commonMedia")
        self.soundSource = {
            "dataset": "FSC",            # Fluent Speech Commands
            "train_test": "train",
            "FSC_max_sound_dur": 6.0,    # skip longer clips (seconds)
            "size": 1000,                # clips per (obj, act)
            "FSC_obj_act": {             # FSC vocabulary to load
                "lights": ["activate", "deactivate"],
                "music": ["activate", "deactivate"],
                "lamp": ["activate", "deactivate"],
            },
            "FSC_locations": ["none"],
        }
        # Scene splits.
        self.trainingRoom = list(range(201, 221))
        self.testingRoom = [226, 227, 228, 229, 230]

        # ------------------------------------------------------------------
        # TPU / backend (new in this framework)
        # ------------------------------------------------------------------
        self.meshShape = None            # {'dp': 8} shards batches over chips
        self.computeDtype = "float32"    # 'bfloat16' for MXU conv stacks
        self.audioBackend = "gemm"       # 'gemm' | 'fft' | 'pallas'
        self.simBackend = "builtin"      # 'builtin' | 'ithor'
        self.vecEnvBackend = "auto"      # 'auto' | 'dummy' | 'shmem'
