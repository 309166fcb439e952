#!/usr/bin/env python
"""Headline benchmark: VAR pretext throughput (triplets/sec/chip).

Measures the full pretext training pipeline — host triplet batch assembly
(clip sampling + packing) + on-device fused MFCC (pos+neg) + both encoders
+ triplet loss + Adam — on the arm profile, batch 128 (the reference's
configuration: Envs/pybullet/arms/tasks/fourInARow/config.py:37,25).

Baseline: a faithful PyTorch-CPU twin of the reference's training step
(per-sample MFCC exactly as torchaudio computes it, via torch.stft, inside
the batch loop, then the same conv/MLP triplet forward/backward with Adam
— reference: VAR/pretext_VAR.py:44-70, Envs/audioLoader.py:147-164,
models/pretext/arm_pretext_model.py). Measured live each run.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "triplets/s", "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


BATCH = 128
REP_DIM = 3


def _make_batches(n_batches: int, seed: int = 0):
    """Shared workload: images + per-row (clip, class) draws."""
    from var_tpu.config import main_config
    from var_tpu.data.audio_store import AudioStore

    cfg = main_config(env="arms")
    audio = AudioStore(cfg)
    audio.loadData()
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n_batches):
        image = rng.rand(BATCH, 3, 96, 96).astype(np.float32)
        gt = rng.randint(0, cfg.taskNum + 1, size=BATCH)
        sn = rng.randint(0, cfg.taskNum + 1, size=BATCH)
        batches.append((image, gt, sn))
    return cfg, audio, batches


def bench_tpu(cfg, audio, batches, warmup: int = 3, iters: int = 96):
    """The production pretext path: device-resident dataset (images + clip
    bank uploaded once), per-step transfer = int32 indices only, MFCC +
    forward + update fused in one program. Host index sampling included."""
    import jax
    import jax.numpy as jnp

    from var_tpu.train.pretext import PretextTrainer, TrainState, make_optimizer

    trainer = PretextTrainer(cfg, audio=audio)
    trainer._ensure_audio()
    trainer.tx = make_optimizer(cfg, steps_per_epoch=100)
    trainer.init_model(seed=0)
    params = trainer.variables["params"]
    state = TrainState(params, trainer.tx.init(params), jnp.asarray(0, jnp.int32))

    # dataset: images from the synthetic workload, clip bank from the store
    rng = np.random.RandomState(1)
    images = np.concatenate(
        [(b[0] * 255).astype(np.uint8) for b in batches])  # (N, 3, 96, 96)
    gts = np.concatenate([b[1] for b in batches])
    sns = np.concatenate([b[2] for b in batches])
    bank_wav, bank_len, ranges = audio.build_clip_bank()
    d_img = jax.device_put(images)
    d_wav = jax.device_put(bank_wav)
    d_len = jax.device_put(bank_len)
    N = len(images)

    def epoch_indices(S, B=None):
        """Host index sampling for S steps (included in the measurement)."""
        B = BATCH if B is None else B
        idx = rng.randint(0, N, size=(S, B)).astype(np.int32)
        pos_ids, pos_zero = audio.sample_clip_ids(
            gts[idx.ravel()], ranges, rng)
        neg_ids, neg_zero = audio.sample_clip_ids(
            sns[idx.ravel()], ranges, rng)
        sh = (S, B)
        return (jnp.asarray(idx), jnp.asarray(pos_ids.reshape(sh)),
                jnp.asarray(pos_zero.reshape(sh)),
                jnp.asarray(neg_ids.reshape(sh)),
                jnp.asarray(neg_zero.reshape(sh)))

    S = 32  # steps per scanned epoch program
    # warmup/compile. Timing note: on the tunneled backend
    # block_until_ready returns WITHOUT waiting (ROADMAP known issue) —
    # round-3's 3.36M triplets/s headline was dispatch-only because of
    # exactly this. Every timed region below ends in np.asarray, which
    # cannot lie: it performs the real device->host readback of a value
    # data-dependent on the whole chained computation.
    state, losses = trainer._train_epoch_scan(
        state, d_img, d_wav, d_len, *epoch_indices(S))
    float(np.asarray(losses)[-1])

    t0 = time.perf_counter()
    epochs = max(1, iters // S)
    for _ in range(epochs):
        state, losses = trainer._train_epoch_scan(
            state, d_img, d_wav, d_len, *epoch_indices(S))
    float(np.asarray(losses)[-1])  # real sync
    dt = time.perf_counter() - t0
    resident_tps = BATCH * S * epochs / dt

    # FLOP/MFU grounding for the headline program (the S-step scanned
    # epoch: fused MFCC + both encoders + triplet loss + Adam per step)
    pretext_cost = None
    try:
        from var_tpu.utils.flops import program_report

        pretext_cost = program_report(
            type(trainer)._train_epoch_scan,
            (trainer, state, d_img, d_wav, d_len, *epoch_indices(S)),
            dt / (S * epochs), steps_per_call=S,
            items_per_call=S * BATCH)
    except Exception as e:  # pragma: no cover - cost model optional
        print(f"# pretext cost analysis failed: {e}", file=sys.stderr)

    # Batch-width headroom (VERDICT r4 item 5 "address the cheap part"):
    # the identical epoch-scan program at batch 1024 instead of the
    # reference's 128. The tiny-batch MFU (~0.1%) is mostly launch/
    # bandwidth overhead per small kernel; widening the batch is the
    # one-knob fix available when throughput (not reference parity)
    # is the goal, and this row quantifies exactly how much it buys.
    wide = None
    try:
        WIDE_B, S_w = 1024, 8
        # the epoch scan DONATES its state argument: run the wide rows on
        # a deep copy so the shared `state` stays alive for the streaming
        # and chunked sections below
        state_w = jax.tree_util.tree_map(jnp.array, state)
        state_w, losses_w = trainer._train_epoch_scan(  # compile
            state_w, d_img, d_wav, d_len, *epoch_indices(S_w, WIDE_B))
        float(np.asarray(losses_w)[-1])
        t0 = time.perf_counter()
        reps_w = 3
        for _ in range(reps_w):
            state_w, losses_w = trainer._train_epoch_scan(
                state_w, d_img, d_wav, d_len, *epoch_indices(S_w, WIDE_B))
        float(np.asarray(losses_w)[-1])
        dt_w = time.perf_counter() - t0
        wide = {"batch": WIDE_B,
                "triplets_per_sec": round(WIDE_B * S_w * reps_w / dt_w, 1)}
        try:
            from var_tpu.utils.flops import program_report

            wc = program_report(
                type(trainer)._train_epoch_scan,
                (trainer, state_w, d_img, d_wav, d_len,
                 *epoch_indices(S_w, WIDE_B)),
                dt_w / (S_w * reps_w), steps_per_call=S_w,
                items_per_call=S_w * WIDE_B)
            if wc:
                wide["cost"] = wc
        except Exception:
            pass
    except Exception as e:  # pragma: no cover - defensive
        print(f"# wide-batch bench failed: {e}", file=sys.stderr)

    # Streaming fallback (larger-than-HBM datasets): per-step full-batch
    # host->device transfer (u8 images + i16 waveforms) + the fused
    # wav-step, with the next batch's assembly + transfer double-buffered
    # on a worker thread exactly like PretextTrainer._prefetch_epoch.
    import concurrent.futures as cf

    rng3 = np.random.RandomState(5)

    def host_batch():
        i = rng3.randint(0, N, size=BATCH)
        p_ids, p_zero = audio.sample_clip_ids(gts[i], ranges, rng3)
        n_ids, n_zero = audio.sample_clip_ids(sns[i], ranges, rng3)
        return (images[i], bank_wav[p_ids], bank_len[p_ids], p_zero,
                bank_wav[n_ids], bank_len[n_ids], n_zero)

    def produce():
        return tuple(jax.device_put(a) for a in host_batch())

    state, loss = trainer._train_step_wav(state, *produce())  # compile
    float(np.asarray(loss))
    S2 = 16
    with cf.ThreadPoolExecutor(max_workers=1) as ex:
        t0 = time.perf_counter()
        fut = ex.submit(produce)
        for _ in range(S2):
            dev = fut.result()
            fut = ex.submit(produce)
            state, loss = trainer._train_step_wav(state, *dev)
        float(np.asarray(loss))  # real sync
        streaming_tps = BATCH * S2 / (time.perf_counter() - t0)

    # Chunked device-residency (the >HBM path, VERDICT r4 item 4): a
    # synthetic dataset well beyond the per-chunk budget, trained via
    # _run_epoch_chunked — globally-shuffled image chunks uploaded as
    # single large transfers double-buffered against the epoch scan.
    # Chunk size is forced small (64 MB) so the mechanism (gather +
    # upload + swap) is exercised many times; real deployments would use
    # multi-GB chunks and amortize even better.
    chunked_tps = None
    try:
        from var_tpu.data.triplets import TripletDataset

        n_items = 16384  # ~450 MB of images: 7 chunks at 64 MB
        rng4 = np.random.RandomState(7)
        ds = TripletDataset.__new__(TripletDataset)
        ds.config = cfg
        ds.audio = audio
        ds.rng = np.random.RandomState(8)
        ds.images = rng4.randint(
            0, 255, size=(n_items, 3, 96, 96), dtype=np.uint8)
        ds.gts = rng4.randint(0, cfg.taskNum + 1, size=n_items).astype(np.int32)
        ds.sn_ids = rng4.randint(0, cfg.taskNum + 1, size=n_items).astype(np.int32)
        ds._sn_random = np.zeros(n_items, bool)
        ds.pos_feats = ds.neg_feats = None
        ds.has_sound = False
        ds._frozen_seed = 1
        trainer.state = state
        bank2 = {
            "chunked": True,
            "wav": d_wav, "len": d_len, "ranges": ranges,
            "chunk_bytes": 64 * 2 ** 20,
        }
        trainer._run_epoch_chunked(ds, bank2, BATCH, epoch=0)  # compile
        t0 = time.perf_counter()
        _, n_done = trainer._run_epoch_chunked(ds, bank2, BATCH, epoch=1)
        chunked_tps = n_done / (time.perf_counter() - t0)
        state = trainer.state
    except Exception as e:  # pragma: no cover - defensive
        print(f"# chunked bench failed: {e}", file=sys.stderr)
    return resident_tps, streaming_tps, chunked_tps, pretext_cost, wide


def bench_torch_cpu(cfg, audio, batches, iters: int = 2):
    """Reference-style step: per-sample torch MFCC + torch conv model."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(max(1, torch.get_num_threads()))
    param = audio._default_param()
    n_fft, win, hop = param.n_fft, param.win_length, param.hop_length
    window = torch.hamming_window(win)

    from var_tpu.ops.audio import dct_matrix, mel_filterbank

    mel_fb = torch.from_numpy(
        mel_filterbank(n_fft // 2 + 1, 40, 16000).astype(np.float32))
    dct_m = torch.from_numpy(dct_matrix(40, 40).astype(np.float32))

    def mfcc(clip_i16: np.ndarray) -> np.ndarray:
        x = torch.from_numpy((clip_i16 / 32768.0).astype(np.float32))
        spec = torch.stft(x, n_fft=n_fft, hop_length=hop, win_length=win,
                          window=window, center=True, pad_mode="reflect",
                          return_complex=True)
        power = spec.abs() ** 2  # (F, T)
        mel = power.T @ mel_fb  # (T, 40)
        logmel = torch.log(mel + 1e-6)
        return (logmel @ dct_m).numpy()  # (T, 40)

    def feat_for(class_idx, rng):
        if class_idx >= cfg.taskNum:
            return np.zeros((1, cfg.sound_dim[1], 40), np.float32)
        clips = audio.class_clips(int(class_idx))
        clip = clips[rng.randint(len(clips))]
        f = mfcc(clip)
        out = np.zeros((1, cfg.sound_dim[1], 40), np.float32)
        t = min(len(f), cfg.sound_dim[1])
        out[0, :t] = f[:t]
        return out

    class ArmNet(nn.Module):
        """Same architecture family as the reference arm VARPretextNet."""

        def __init__(self):
            super().__init__()
            conv = []
            chans = [3, 32, 32, 64, 64, 64]
            for i in range(5):
                conv += [nn.Conv2d(chans[i], chans[i + 1], 3, stride=2,
                                   padding=1), nn.ReLU()]
            self.img = nn.Sequential(*conv, nn.Flatten(),
                                     nn.Linear(64 * 9, 128), nn.ReLU(),
                                     nn.Linear(128, REP_DIM))
            self.snd = nn.Sequential(
                nn.Conv2d(1, 32, (5, 40), stride=(2, 1)), nn.ReLU(),
                nn.Conv2d(32, 32, (3, 1), stride=(2, 1)), nn.ReLU(),
                nn.Conv2d(32, 32, (3, 1), stride=(2, 1)), nn.ReLU(),
                nn.Conv2d(32, 32, (3, 1), stride=(2, 1)), nn.ReLU(),
                nn.Flatten(), nn.Linear(32 * 5, 128), nn.ReLU(),
                nn.Linear(128, REP_DIM))

        def forward(self, img, pos, neg):
            f = nn.functional.normalize
            return (f(self.img(img), dim=1), f(self.snd(pos), dim=1),
                    f(self.snd(neg), dim=1))

    model = ArmNet()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=1e-6)
    criterion = torch.nn.TripletMarginLoss(margin=1.0, p=2)
    rng = np.random.RandomState(2)

    t0 = time.perf_counter()
    n = 0
    for i in range(iters):
        image, gt, sn = batches[i % len(batches)]
        pos = np.stack([feat_for(g, rng) for g in gt])
        neg = np.stack([feat_for(s, rng) for s in sn])
        img_t = torch.from_numpy(image)
        pos_t = torch.from_numpy(pos)
        neg_t = torch.from_numpy(neg)
        opt.zero_grad()
        a, p, ng = model(img_t, pos_t, ng_t := neg_t)
        loss = criterion(a, p, ng)
        loss.backward()
        opt.step()
        n += BATCH
    dt = time.perf_counter() - t0
    return n / dt


def bench_rl():
    """Secondary north-star metric: PPO env-steps/s vs the faithful
    torch-CPU reference twin (benchmarks/rl_bench.py). Returns a dict or
    None; failures must not kill the headline bench."""
    import os

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    try:
        import threading

        import rl_bench

        # headline = exact reference semantics, same protocol as the twin;
        # the one-step-stale pipelined mode is a separate (default-off)
        # number. Our side is tunnel-compile-dominated (local core idle),
        # so it runs in a thread while the CPU-bound torch twin runs in
        # the main thread; any overlap contention slows OUR measured
        # loops, never the baseline (conservative vs_baseline).
        ours_box = {}

        def run_ours():
            try:
                ours_box["v"] = rl_bench.bench_ours_both()
                # third north-star metric: wrapper-path VAR
                # reward-inference p50 on the real chip (BASELINE.json)
                ours_box["var_p50"] = rl_bench.bench_var_reward_p50()
                # round-3 flagship: simulator ON the TPU, whole rollout
                # as one XLA program (rl/device_sim.py) — its own try so
                # a failure never loses the host-path numbers
                try:
                    ours_box["dsim"], ours_box["dsim_cost"] = \
                        rl_bench.bench_device_sim()
                except Exception as e:  # pragma: no cover - defensive
                    print(f"# device-sim bench failed: {e}",
                          file=sys.stderr)
            except Exception as e:  # pragma: no cover - defensive
                ours_box["e"] = e

        th = threading.Thread(target=run_ours, daemon=True)
        th.start()
        ref = rl_bench.bench_torch_cpu()
        print(f"# rl torch-cpu twin: {ref:.1f} env-steps/s", file=sys.stderr)
        th.join()
        if "e" in ours_box:
            raise ours_box["e"]
        ours_exact, ours_pipe, fused_p50, rl_costs = ours_box["v"]
        var_p50 = ours_box.get("var_p50")
        if "dsim_cost" in ours_box and ours_box["dsim_cost"]:
            rl_costs["device_sim_rollout"] = ours_box["dsim_cost"]
        print(f"# rl ours: exact {ours_exact:.1f}, pipelined "
              f"{ours_pipe:.1f} env-steps/s; var reward p50 "
              f"{var_p50:.2f} ms, fused step p50 {fused_p50:.2f} ms",
              file=sys.stderr)
        return {
            "metric": "ppo_env_steps_per_sec",
            "value": round(ours_exact, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(ours_exact / ref, 2) if ref else None,
            "pipelined_mode": round(ours_pipe, 1),
            "var_reward_p50_ms": round(var_p50, 3) if var_p50 else None,
            "fused_step_p50_ms": round(fused_p50, 3) if fused_p50 else None,
            "device_sim_mode": (round(ours_box["dsim"], 1)
                                if "dsim" in ours_box else None),
            # XLA cost-analysis grounding: FLOPs/step + achieved
            # TFLOP/s + %-of-bf16-peak MFU per benched program
            # (var_tpu/utils/flops.py; VERDICT r3 item 2)
            "cost": rl_costs or None,
        }
    except Exception as e:  # pragma: no cover - defensive
        print(f"# rl bench failed: {e}", file=sys.stderr)
        return None


def main():
    from var_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg, audio, batches = _make_batches(4)
    tpu_tps, stream_tps, chunked_tps, pretext_cost, wide = bench_tpu(
        cfg, audio, batches)
    print(f"# tpu: {tpu_tps:.1f} triplets/s (device-resident), "
          f"{stream_tps:.1f} (streaming double-buffered), "
          f"{chunked_tps and round(chunked_tps, 1)} (chunked >HBM)",
          file=sys.stderr)
    try:
        cpu_tps = bench_torch_cpu(cfg, audio, batches)
        print(f"# torch-cpu baseline: {cpu_tps:.1f} triplets/s", file=sys.stderr)
    except Exception as e:  # baseline failure must not kill the bench
        print(f"# torch baseline failed: {e}", file=sys.stderr)
        cpu_tps = None
    rl = bench_rl()
    vs = tpu_tps / cpu_tps if cpu_tps else None
    print(json.dumps({
        "metric": "var_pretext_triplets_per_sec_per_chip",
        "value": round(tpu_tps, 1),
        "unit": "triplets/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "streaming_mode": round(stream_tps, 1),
        "chunked_mode": round(chunked_tps, 1) if chunked_tps else None,
        "cost": pretext_cost,
        "wide_batch": wide,
        "rl": rl,
    }))


if __name__ == "__main__":
    main()
