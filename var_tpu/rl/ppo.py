"""PPO learner: the full update (epochs x minibatches) as ONE jitted program.

Rebuild of the reference PPO.update (reference: models/ppo/algo/ppo.py:38-104)
with the recurrent minibatch generator (models/ppo/storage.py:175-245):

- advantages = returns - values, batch-normalized once before the epochs;
- per epoch: a fresh env permutation; per minibatch: whole-sequence chunks
  of N/num_mini_batch envs, flattened (T,N)->(T*N) and re-evaluated through
  the policy with the mask-segmented GRU scan;
- clipped surrogate (ratio clamp 1 +/- clip), clipped value loss
  (0.5 * max(mse, clipped_mse)), entropy bonus, global-norm grad clip,
  Adam.

The reference runs this as 8 separate optimizer steps with host-side
generators; here the whole update (4 epochs x 2 minibatches unrolled) is
a single XLA program — one host->device transfer of the rollout per
update, zero host sync between minibatches.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from var_tpu.models.policy import Policy, evaluate_actions


class PPOConfig(NamedTuple):
    clip_param: float
    ppo_epoch: int
    num_mini_batch: int
    value_loss_coef: float
    entropy_coef: float
    lr: float
    eps: float
    max_grad_norm: float
    use_clipped_value_loss: bool = True
    # None = auto: unroll the (epoch x minibatch) loop at trace time on CPU
    # backends. scan(grad(GRU-scan)) triggers pathological SPMD compile
    # times in XLA:CPU (>10 min on a virtual 8-device mesh) while the TPU
    # backend compiles it in seconds; the unrolled loop is the same
    # program semantically.
    unroll_minibatches: bool = None
    # LR schedule (beats the reference: RL.py:115 is a fixed-LR Adam).
    # None = constant (reference parity). 'linear'/'cosine' hold lr until
    # lr_decay_start * total_opt_steps optimizer steps, then decay to
    # lr * lr_final_factor by total_opt_steps — stabilizes the
    # post-saturation success band (round-4 finding: 0.62-0.93 swing).
    lr_decay: str = None
    lr_decay_start: float = 0.33
    lr_final_factor: float = 0.1
    total_opt_steps: int = 0

    @classmethod
    def from_config(cls, config):
        # schedule horizon in OPTIMIZER steps: tx.update runs once per
        # minibatch, epochs x minibatches times per PPO update. The
        # horizon knobs may be absent on minimal test configs — they
        # only matter when a decay schedule is enabled.
        num_updates = int(getattr(config, "RLTotalSteps", 0)) // max(
            1, int(getattr(config, "ppoNumSteps", 1))
            * int(getattr(config, "RLNumEnvs", 1)))
        return cls(
            clip_param=config.ppoClipParam,
            ppo_epoch=config.ppoEpoch,
            num_mini_batch=config.ppoNumMiniBatch,
            value_loss_coef=config.ppoValueLossCoef,
            entropy_coef=config.ppoEntropyCoef,
            lr=config.RLLr,
            eps=config.RLEps,
            max_grad_norm=config.RLMaxGradNorm,
            lr_decay=getattr(config, "RLLrDecay", None),
            lr_decay_start=getattr(config, "RLLrDecayStart", 0.33),
            lr_final_factor=getattr(config, "RLLrFinalFactor", 0.1),
            total_opt_steps=max(
                1, num_updates * config.ppoEpoch * config.ppoNumMiniBatch),
        )


class PPOState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class PPO:
    """Owns the optimizer and the jitted update (reference: algo/ppo.py:6-36)."""

    def __init__(self, model: Policy, cfg: PPOConfig):
        self.model = model
        self.cfg = cfg
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=cfg.eps),
            optax.scale_by_learning_rate(self._lr_schedule()),
        )

    def _lr_schedule(self):
        """Constant LR by default (reference parity: RL.py:115 fixed
        Adam); optional decay schedule over the training horizon, counted
        in optimizer steps (one per minibatch)."""
        cfg = self.cfg
        if not cfg.lr_decay:
            return cfg.lr
        total = max(1, int(cfg.total_opt_steps))
        start = min(total - 1, int(total * cfg.lr_decay_start))
        decay_len = max(1, total - start)
        floor = cfg.lr * cfg.lr_final_factor
        if cfg.lr_decay == "linear":
            tail = optax.linear_schedule(cfg.lr, floor, decay_len)
        elif cfg.lr_decay == "cosine":
            tail = optax.cosine_decay_schedule(
                cfg.lr, decay_len, alpha=cfg.lr_final_factor)
        else:
            raise ValueError(
                f"unknown lr_decay {cfg.lr_decay!r} (None|'linear'|'cosine')")
        return optax.join_schedules(
            [optax.constant_schedule(cfg.lr), tail], [start])

    def current_lr(self, state: "PPOState") -> float:
        """LR at the state's optimizer count (for progress logging)."""
        sched = self._lr_schedule()
        if not callable(sched):
            return float(sched)
        # our chain ends in scale_by_learning_rate(schedule), whose
        # ScaleByScheduleState is the final element of the chain state
        count = state.opt_state[-1].count
        return float(sched(count))

    def init_state(self, params) -> PPOState:
        return PPOState(params, self.tx.init(params), jnp.asarray(0, jnp.int32))

    def cost_report(self, state: PPOState, batch, update_seconds):
        """XLA cost analysis of the whole-update program (ppo_epoch x
        minibatches fused into one jit): FLOPs/update + MFU at the
        measured update wall time (VERDICT r3 item 2)."""
        from var_tpu.utils.flops import program_report

        T, N = batch["returns"].shape
        return program_report(
            type(self).update, (self, state, batch, jax.random.PRNGKey(0)),
            update_seconds, items_per_call=T * N)

    def _minibatch_loss(self, params, obs_flat, rnn_hx, masks_flat,
                        actions_flat, value_preds, returns, old_log_probs,
                        adv, seq_len):
        cfg = self.cfg
        values, action_log_probs, dist_entropy = evaluate_actions(
            self.model, {"params": params}, obs_flat, rnn_hx,
            masks_flat[:, None], actions_flat, seq_len)
        values = values[:, 0]
        action_log_probs = action_log_probs[:, 0]

        ratio = jnp.exp(action_log_probs - old_log_probs)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param) * adv
        action_loss = -jnp.mean(jnp.minimum(surr1, surr2))

        if cfg.use_clipped_value_loss:
            value_pred_clipped = value_preds + jnp.clip(
                values - value_preds, -cfg.clip_param, cfg.clip_param)
            value_losses = (values - returns) ** 2
            value_losses_clipped = (value_pred_clipped - returns) ** 2
            value_loss = 0.5 * jnp.mean(
                jnp.maximum(value_losses, value_losses_clipped))
        else:
            value_loss = 0.5 * jnp.mean((returns - values) ** 2)

        total = (value_loss * cfg.value_loss_coef + action_loss
                 - dist_entropy * cfg.entropy_coef)
        return total, (value_loss, action_loss, dist_entropy)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def update(self, state: PPOState, batch, key):
        """batch: RolloutStorage.device_batch(). Returns (state, metrics)."""
        cfg = self.cfg
        T, N = batch["returns"].shape
        if self.model.recurrent and N % cfg.num_mini_batch != 0:
            raise ValueError(
                f"PPO requires the number of envs ({N}) to be a multiple of "
                f"the number of minibatches ({cfg.num_mini_batch}) for "
                "recurrent updates (reference: storage.py:recurrent_generator)")
        n_per_mb = N // cfg.num_mini_batch

        advantages = batch["returns"] - batch["value_preds"]
        # torch .std() is unbiased (ddof=1) — matched for parity
        # (reference: algo/ppo.py:42-44)
        advantages = (advantages - advantages.mean()) / (
            advantages.std(ddof=1) + 1e-5)

        params, opt_state = state.params, state.opt_state

        if not self.model.recurrent:
            # feed-forward generator: random minibatches over T*N
            # (reference: storage.py:130-173)
            return self._update_feed_forward(state, batch, key, advantages)

        # Pre-draw every epoch's env permutation, stack all (epoch,
        # minibatch) index sets, and lax.scan the minibatch step over them —
        # identical semantics to the reference's sequential loop, but the
        # policy compiles ONCE instead of epochs x minibatches times.
        perms = []
        for _ in range(cfg.ppo_epoch):
            key, sub = jax.random.split(key)
            perms.append(jax.random.permutation(sub, N))
        idx_stack = jnp.stack(perms).reshape(
            cfg.ppo_epoch * cfg.num_mini_batch, n_per_mb)

        def mb_body(carry, env_idx):
            params, opt_state = carry

            def take(x, axis=1):
                return jnp.take(x, env_idx, axis=axis)

            obs_mb = {k: take(v).reshape((T * n_per_mb,) + v.shape[2:])
                      for k, v in batch["obs"].items()}
            grads_fn = jax.value_and_grad(self._minibatch_loss, has_aux=True)
            (_, (v_l, a_l, ent)), grads = grads_fn(
                params,
                obs_mb,
                take(batch["rnn_hx0"], axis=0),
                take(batch["masks"]).reshape(T * n_per_mb),
                take(batch["actions"]).reshape(
                    (T * n_per_mb,) + batch["actions"].shape[2:]),
                take(batch["value_preds"]).reshape(T * n_per_mb),
                take(batch["returns"]).reshape(T * n_per_mb),
                take(batch["old_log_probs"]).reshape(T * n_per_mb),
                take(advantages).reshape(T * n_per_mb),
                T,
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), jnp.stack([v_l, a_l, ent])

        unroll = cfg.unroll_minibatches
        if unroll is None:
            unroll = jax.default_backend() == "cpu"
        if unroll:
            carry = (params, opt_state)
            stats_list = []
            for i in range(idx_stack.shape[0]):
                carry, s = mb_body(carry, idx_stack[i])
                stats_list.append(s)
            params, opt_state = carry
            stats = jnp.stack(stats_list)
        else:
            (params, opt_state), stats = jax.lax.scan(
                mb_body, (params, opt_state), idx_stack)
        mean_stats = jnp.mean(stats, axis=0)
        metrics = {
            "value_loss": mean_stats[0],
            "action_loss": mean_stats[1],
            "dist_entropy": mean_stats[2],
        }
        return PPOState(params, opt_state, state.step + 1), metrics

    def _update_feed_forward(self, state: PPOState, batch, key, advantages):
        """Non-recurrent path: shuffle (T*N) transitions, fixed-size random
        minibatches, one optimizer step each (runs inside the same jit as
        update(); reference: storage.py feed_forward_generator)."""
        cfg = self.cfg
        T, N = batch["returns"].shape
        total = T * N
        mb_size = total // cfg.num_mini_batch

        def flat(x):
            return x.reshape((total,) + x.shape[2:])

        obs_flat = {k: flat(v) for k, v in batch["obs"].items()}
        actions = flat(batch["actions"])
        value_preds = flat(batch["value_preds"])
        returns = flat(batch["returns"])
        masks = flat(batch["masks"])
        old_lp = flat(batch["old_log_probs"])
        adv = flat(advantages)

        params, opt_state = state.params, state.opt_state
        v_epoch = a_epoch = e_epoch = 0.0
        for epoch in range(cfg.ppo_epoch):
            key, sub = jax.random.split(key)
            perm = jax.random.permutation(sub, total)
            for mb in range(cfg.num_mini_batch):
                idx = jax.lax.dynamic_slice_in_dim(perm, mb * mb_size, mb_size)

                def take(x):
                    return jnp.take(x, idx, axis=0)

                hx = jnp.zeros((mb_size, 1), jnp.float32)
                grads_fn = jax.value_and_grad(self._minibatch_loss, has_aux=True)
                (_, (v_l, a_l, ent)), grads = grads_fn(
                    params, {k: take(v) for k, v in obs_flat.items()}, hx,
                    take(masks), take(actions), take(value_preds),
                    take(returns), take(old_lp), take(adv), 1)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                v_epoch += v_l
                a_epoch += a_l
                e_epoch += ent
        num_updates = cfg.ppo_epoch * cfg.num_mini_batch
        metrics = {
            "value_loss": v_epoch / num_updates,
            "action_loss": a_epoch / num_updates,
            "dist_entropy": e_epoch / num_updates,
        }
        return PPOState(params, opt_state, state.step + 1), metrics
