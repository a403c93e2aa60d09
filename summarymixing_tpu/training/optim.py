"""Optimizers and LR schedules (optax).

Capability parity:
- AdamW betas (0.9, 0.98), eps 1e-9/1e-8 + NoamScheduler
  (branchformer_summarymixing.yaml:220-224,282-284).
- WarmAndExpDecayLRSchedule (transducer yaml:401-405: warmup, then
  exponential decay to decay_factor * lr at total_steps).
- Two-stage Adam -> SGD switch at stage_one_epochs (AISHELL yaml:59,168-178;
  CommonVoice yaml:50,168) via optax.multi_transform-style step gating.
- Gradient clipping max_grad_norm 5.0 and gradient accumulation
  (yaml:53-61) belong to the train step (optax.MultiSteps / clip wrapper
  here).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def noam_schedule(lr_peak: float, warmup_steps: int):
    """SpeechBrain NoamScheduler semantics: lr(step) =
    lr_peak * warmup^0.5 * min(step^-0.5, step * warmup^-1.5) — peaks at
    exactly lr_peak when step == warmup_steps."""

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        w = jnp.asarray(warmup_steps, jnp.float32)
        return lr_peak * jnp.sqrt(w) * jnp.minimum(s ** -0.5, s * w ** -1.5)

    return schedule


def warm_and_exp_decay_schedule(
    lr: float, warmup_steps: int, total_steps: int, decay_factor: float = 0.05
):
    """Linear warmup 0 -> lr over warmup_steps, then exponential decay
    reaching lr * decay_factor at total_steps."""

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        w = float(warmup_steps)
        warm = lr * s / jnp.maximum(w, 1.0)
        frac = jnp.clip((s - w) / jnp.maximum(total_steps - w, 1.0), 0.0, 1.0)
        decayed = lr * decay_factor ** frac
        return jnp.where(s < w, warm, decayed)

    return schedule


def make_adamw(
    schedule,
    weight_decay: float = 0.0,
    betas=(0.9, 0.98),
    eps: float = 1e-9,
    max_grad_norm: Optional[float] = 5.0,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm) if max_grad_norm else optax.identity(),
        optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                    weight_decay=weight_decay),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def make_two_stage_adam_sgd(
    adam_schedule,
    sgd_lr: float,
    switch_step: int,
    weight_decay: float = 0.0,
    betas=(0.9, 0.98),
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 5.0,
    sgd_momentum: float = 0.99,
    sgd_nesterov: bool = True,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """Adam for steps < switch_step, then SGD with Nesterov momentum 0.99
    (the two-stage optimisation of the AISHELL / CommonVoice recipes,
    reference AISHELL yaml:168-176), expressed as a step-gated combination
    so the whole run stays one compiled program. `switch_step` counts
    OPTIMIZER steps (after accumulation); `accum_steps` wraps the whole
    thing in MultiSteps (CommonVoice yaml:44 grad_accumulation_factor 2)."""
    adam = optax.adamw(adam_schedule, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)
    sgd = optax.sgd(sgd_lr, momentum=sgd_momentum or None,
                    nesterov=sgd_nesterov)

    def init(params):
        return {"adam": adam.init(params), "sgd": sgd.init(params),
                "step": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        use_adam = state["step"] < switch_step
        a_up, a_st = adam.update(grads, state["adam"], params)
        # Feed the SGD branch zero gradients during the Adam phase so its
        # momentum trace stays at init (zeros) until the switch — otherwise
        # the first SGD updates would apply a stale EMA of the whole stage-1
        # gradient history (the reference starts SGD with a fresh buffer).
        sgd_grads = jax.tree.map(
            lambda g: jnp.where(use_adam, jnp.zeros_like(g), g), grads
        )
        s_up, s_st = sgd.update(sgd_grads, state["sgd"], params)
        updates = jax.tree.map(
            lambda a, s: jnp.where(use_adam, a, s), a_up, s_up
        )
        return updates, {"adam": a_st, "sgd": s_st, "step": state["step"] + 1}

    tx = optax.GradientTransformation(init, update)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def apply_safe_update(tx, state, grads, losses, norm_stats, rng):
    """Shared optimizer update with the non-finite skip (reference
    Brain.fit_batch semantics, one compiled program): on a non-finite loss
    or gradient norm, params / optimizer state / normalizer stats keep
    their old values via where(). Returns (new_state, grad_norm, finite).

    Used by both the ASR and transducer train steps; state is the trainer
    state dict {params, opt_state, norm_stats, step, epoch, rng}.
    """
    grad_norm = optax.global_norm(grads)
    finite = jnp.isfinite(losses["loss"]) & jnp.isfinite(grad_norm)
    safe_grads = jax.tree.map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
    )
    updates, opt_state = tx.update(
        safe_grads, state["opt_state"], state["params"]
    )
    # Non-array leaves (not representable under where-selection) revert to
    # the old value: this helper exists for the skip path, and reverting is
    # the conservative choice there; in the jitted train steps every optax
    # state leaf is an array, so this branch never fires in practice.
    opt_state = jax.tree.map(
        lambda new, old: jnp.where(finite, new, old)
        if hasattr(new, "shape") else old,
        opt_state, state["opt_state"],
    )
    params = optax.apply_updates(
        state["params"],
        jax.tree.map(lambda u: jnp.where(finite, u, jnp.zeros_like(u)),
                     updates),
    )
    # the running input-normalization stats also saw the bad batch
    norm_stats = jax.tree.map(
        lambda new_s, old_s: jnp.where(finite, new_s, old_s),
        norm_stats, state["norm_stats"],
    )
    new_state = {
        "params": params,
        "opt_state": opt_state,
        "norm_stats": norm_stats,
        "step": state["step"] + 1,
        "epoch": state["epoch"],
        "rng": rng,
    }
    return new_state, grad_norm, finite
