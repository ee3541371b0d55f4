"""Reinforcement-learned saccades (RLS): DETR training + DQN glimpse policy.

Rebuild of reference ``DETR_Image_Classification_RLS.py:657-849`` +
``DQN/Training.py``: while the DETR classifier trains, a DQN learns *where
to look next* — per fixation, the policy net proposes the next saccade from
the last glimpse (ε-greedy); per sample, the FINAL consecutive glimpse pair
``(glimpse_{F-2}, saccade_{F-1}, glimpse_{F-1}, top1-correct reward)`` is
pushed to a replay memory (``:757-769`` pushes only indices
``num_fixs-2 → num_fixs-1``); and with probability 0.7 per batch a
Bellman-Huber DQN update runs (grad clamp ±1 + RMSprop, target-net sync
every ``target_update_freq`` epochs).

TPU-native split: the glimpse rollout (retina + policy argmax per fixation)
and the DETR/DQN updates are jitted device programs; the replay memory stays
on host (RAM capacity) with vectorized batch pushes — the host↔device
boundary crossed once per batch, not once per sample as in the reference
(``DETR_Image_Classification_RLS.py:751-769``). The driver's
``--dense-replay`` flag optionally pushes EVERY consecutive pair (a
documented divergence: richer replay from the same rollout).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from multimodal_active_ai_tpu.objectives.dqn_loss import dqn_bellman_loss
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import data_parallel_jit
from multimodal_active_ai_tpu.rl.policy import eps_threshold
from multimodal_active_ai_tpu.train.simclr_train import TrainState
from multimodal_active_ai_tpu.utils.metrics import top_k_accuracy


class RolloutResult(NamedTuple):
    glimpses: jnp.ndarray   # (B, F, g, g, 12)
    saccades: jnp.ndarray   # (B, F, 2) (x, y)
    mask: jnp.ndarray       # (B, F) True = padded fixation


def make_rollout(dqn_model, retina_cfg: retina.RetinaConfig,
                 num_fixations: int, num_of_actions: int,
                 eps_start: float, eps_end: float, eps_decay: float):
    """Policy-driven glimpse rollout (``DETR_Image_Classification_RLS.py:
    686-729``): fixation 0 is random; epoch 0 is fully random; otherwise the
    policy DQN proposes coords with ε-greedy exploration. ``num_fixs`` is
    drawn in [2, F-1] — the reference's ``torch.randint(2,
    args.num_fixations)`` has an EXCLUSIVE high (``:688,694``), so fixation
    budget F itself is never drawn — and becomes a pad mask. (F ≤ 2, where
    the reference's randint would raise, pins num_fixs = 2.)
    """

    def rollout(dqn_variables, images, key, epoch):
        batch = images.shape[0]
        src = images.shape[1]
        k_n, k_loop = jax.random.split(key)
        num_fixs = jax.random.randint(k_n, (), 2, max(num_fixations, 3))
        thr = eps_end + (eps_start - eps_end) * jnp.exp(
            -epoch.astype(jnp.float32) / eps_decay)

        pyramid = (retina.build_pyramid(images, retina_cfg)
                   if retina_cfg.mode == "matmul" else None)

        def glimpse_at(fix_xy, k):
            p = retina.sample_labeled_params(k, batch, src,
                                             fix_yx=fix_xy[:, ::-1])
            return retina.apply_retina(images, p, k, retina_cfg,
                                       photometric=False, pyramid=pyramid)

        def body(carry, kj):
            prev_glimpse, j = carry
            k_coin, k_rand, k_ret = jax.random.split(kj, 3)
            qx, qy = dqn_model.apply(dqn_variables, prev_glimpse, train=False)
            fx = jnp.argmax(qx, axis=1).astype(jnp.float32) / num_of_actions
            fy = jnp.argmax(qy, axis=1).astype(jnp.float32) / num_of_actions
            greedy = jnp.stack([fx, fy], axis=1)
            random_fix = jax.random.uniform(k_rand, (batch, 2))
            sample = jax.random.uniform(k_coin, ())
            use_random = jnp.logical_or(
                jnp.logical_or(j == 0, epoch == 0), sample <= thr)
            fix_xy = jnp.where(use_random, random_fix, greedy)
            g = glimpse_at(fix_xy, k_ret)
            return (g, j + 1), (g, fix_xy)

        keys = jax.random.split(k_loop, num_fixations)
        g_init = jnp.zeros((batch, retina_cfg.glimpse_size,
                            retina_cfg.glimpse_size, retina_cfg.num_channels),
                           jnp.float32)
        _, (glimpses, saccades) = jax.lax.scan(body, (g_init, 0), keys)
        glimpses = jnp.moveaxis(glimpses, 0, 1)
        saccades = jnp.moveaxis(saccades, 0, 1)
        mask = jnp.broadcast_to(
            jnp.arange(num_fixations)[None, :] >= num_fixs,
            (batch, num_fixations))
        return RolloutResult(glimpses, saccades, mask)

    return rollout


def make_rls_train_step(model, criterion, dqn_model, mesh,
                        retina_cfg: retina.RetinaConfig, num_fixations: int,
                        num_of_actions: int, eps_start: float, eps_end: float,
                        eps_decay: float):
    """DETR update on a policy-driven rollout; also returns per-sample
    rewards and the rollout so the host can feed the replay memory
    (``DETR_Image_Classification_RLS.py:731-769``)."""

    rollout_fn = make_rollout(dqn_model, retina_cfg, num_fixations,
                              num_of_actions, eps_start, eps_end, eps_decay)

    def step(state: TrainState, dqn_variables, images, labels, key, epoch):
        k_roll, k_drop = jax.random.split(key)
        ro = rollout_fn(dqn_variables, images, k_roll, epoch)
        glimpses = jax.lax.stop_gradient(ro.glimpses)

        def loss_fn(params):
            out = model.apply({"params": params,
                               "batch_stats": state.batch_stats},
                              glimpses, ro.saccades, ro.mask, train=True,
                              rngs={"dropout": k_drop})
            losses = criterion(out["pred_logits"], labels)
            return losses["loss_ce"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads=grads)

        # per-sample reward: query-mean top-1 correctness (RLS :751-769 uses
        # the prediction/label agreement as the reward signal)
        logits = jnp.mean(out["pred_logits"], axis=1)
        reward = (jnp.argmax(logits, axis=1) == labels).astype(jnp.float32)
        return state, {"loss_ce": loss, "reward_mean": jnp.mean(reward)}, ro, reward

    # rollout buffers and per-sample rewards stay batch-sharded; the host
    # gathers them for the replay memory
    return data_parallel_jit(step, mesh, batch_args=(2, 3),
                             num_outputs=4, batch_outputs=(2, 3))


def make_policy_eval_step(model, criterion, dqn_model, mesh,
                          retina_cfg: retina.RetinaConfig,
                          num_fixations: int, num_of_actions: int,
                          greedy: bool = True):
    """Greedy-policy validation: does the LEARNED saccade policy help?

    The reference never measures its own scientific question — RLS trains a
    DQN to choose fixations (``DETR_Image_Classification_RLS.py:696-729``)
    but has no validation loop at all; this step evaluates the DETR
    classifier on rollouts where every fixation after the first is the
    policy's greedy argmax (ε = 0, the ``select_action_from_policy`` path
    of ``DQN/Training.py:57-68``), producing the ``##Policy Top-1`` the
    driver prints next to the random-saccade ``##Top-1`` each epoch.

    ``greedy=False`` builds the CONTROL for that comparison: the identical
    rollout machinery with every fixation random (the ``epoch == 0`` branch
    of the rollout). Both evaluators then draw ``num_fixs`` from the same
    [2, max(F,3)-1] distribution — and, called with the same ``key``, the
    same per-batch draw and the same random fixation 0 — so ``##Policy
    Top-1`` vs ``##Top-1`` is a paired same-budget comparison in which only
    the post-initial saccades differ. (The plain DETR driver's evaluator
    draws ``num_fixs ∈ [1, F]`` and is NOT budget-matched to the policy
    rollout; using it as the control biased the comparison — e.g. at F=3 it
    sees a single glimpse a third of the time while the policy always got
    two.)
    """

    rollout_fn = make_rollout(dqn_model, retina_cfg, num_fixations,
                              num_of_actions, eps_start=0.0, eps_end=0.0,
                              eps_decay=1.0)
    # epoch=1: only fixation 0 is random; with ε=0 the rest are greedy.
    # epoch=0: the rollout's fully-random branch (the control). A Python
    # constant at trace time, so the unused DQN applies are DCE'd.
    rollout_epoch = 1 if greedy else 0

    def step(state: TrainState, dqn_variables, images, labels, key):
        ro = rollout_fn(dqn_variables, images, key,
                        jnp.asarray(rollout_epoch, jnp.int32))
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          ro.glimpses, ro.saccades, ro.mask, train=False)
        logits = jnp.mean(out["pred_logits"], axis=1)
        losses = criterion(out["pred_logits"], labels)
        return {"loss_ce": losses["loss_ce"],
                "top1": top_k_accuracy(logits, labels, 1),
                "top5": top_k_accuracy(logits, labels, 5)}

    return data_parallel_jit(step, mesh, batch_args=(2, 3))


def make_dqn_update_step(dqn_model, num_of_actions: int, gamma: float,
                         mesh=None):
    """``optimize_foveator`` equivalent (``DQN/Training.py:86-140``): Bellman
    Huber loss on a replay sample, gradients clamped to ±1 elementwise (the
    reference's ``param.grad.data.clamp_(-1, 1)``), RMSprop step applied by
    the caller's optimizer.

    With a ``mesh``, the replay batch is sharded over the data axis and the
    gradient is averaged by GSPMD — on multi-host runs each process samples
    its share of the global Bellman batch from its OWN replay memory and
    the policy nets stay bit-identical across processes. (The reference's
    ranks silently diverge here: its DQN is DDP-wrapped then immediately
    unwrapped, ``DETR_Image_Classification_RLS.py:429-442``, so per-rank
    replay differences de-synchronize the policies — the corrected-DP
    stance documented in SURVEY §2.4 applies to the DQN too.)

    The policy net runs in train mode so its BatchNorm statistics update
    with every Bellman step (the reference trains its DQN trunk with live
    BN, ``DQN/Training.py:86-140``); the updated stats are carried in
    ``policy_state.batch_stats`` and flow to the target net on sync. The
    target net evaluates with its own frozen stats."""

    def step(policy_state: TrainState, target_variables, transition):
        states, actions, next_states, rewards = transition

        def loss_fn(params):
            (qx, qy), mutated = dqn_model.apply(
                {"params": params, "batch_stats": policy_state.batch_stats},
                states, train=True, mutable=["batch_stats"])
            tqx, tqy = dqn_model.apply(target_variables, next_states,
                                       train=False)
            loss = dqn_bellman_loss(qx, qy,
                                    jax.lax.stop_gradient(tqx),
                                    jax.lax.stop_gradient(tqy),
                                    actions, rewards, gamma, num_of_actions)
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            policy_state.params)
        grads = jax.tree.map(lambda g: jnp.clip(g, -1.0, 1.0), grads)
        policy_state = policy_state.apply_gradients(grads=grads,
                                                    batch_stats=new_bs)
        return policy_state, loss

    # no donation: right after a target sync, ``target_variables`` aliases
    # the policy params — donating the state would free buffers the same
    # call still reads (`f(donate(a), a)`)
    return data_parallel_jit(step, mesh, batch_args=(2,), num_outputs=2)


def sync_target(policy_state: TrainState):
    """``target ← policy`` hard sync (``DETR_Image_Classification_RLS.py:590-592``)."""
    return {"params": policy_state.params,
            "batch_stats": policy_state.batch_stats}
