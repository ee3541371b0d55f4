"""SimCLR-with-saccades training: one jitted, mesh-parallel train step.

TPU-native rebuild of the reference hot loop (``Contrastive_Learning.py:
577-740``). The reference's inner saccade loop crosses
host → DALI → torch → NCCL boundaries twice per fixation
(``Contrastive_Learning.py:641-700``); here the *entire* per-batch work —
``1 + num_fixations`` retina passes, forwards, NT-Xent over the global
batch, backward, optimizer update and BN-stat sync — is a single
``lax.scan`` inside one jitted step over the device mesh. The host only
feeds uint8 image batches and a PRNG key.

Parallelism: **GSPMD data parallelism** — the step is written for the
global batch and jitted with ``in_shardings`` that split the batch over the
``data`` mesh axis while replicating parameters; XLA inserts the gradient
all-reduce, the cross-replica BN-statistic reduction (SyncBatchNorm parity
— batch stats are means over the *global* batch axis), and the NT-Xent
negative exchange onto ICI by itself. An earlier revision expressed the
same program with ``shard_map`` + explicit ``all_gather``/``pmean``; on TPU
that compiled to ~200× slower code than GSPMD sharding of the identical
math, so the manual-collective formulation survives only in the NT-Xent
objective (for tests) — production uses this module.

Note: this is *correct* data parallelism — the reference unwraps DDP
immediately after construction (``Contrastive_Learning.py:418-424``) which
silently disables gradient sync, a quirk SURVEY §2.4 documents; we
implement the corrected semantics. NT-Xent negatives keep torch-parity
stop-gradients (:mod:`multimodal_active_ai_tpu.objectives.ntxent`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax.training import train_state
from multimodal_active_ai_tpu.objectives.ntxent import contrastive_loss
from multimodal_active_ai_tpu.ops import retina
from multimodal_active_ai_tpu.parallel.mesh import data_parallel_jit
from multimodal_active_ai_tpu.utils.metrics import top_k_accuracy


class TrainState(train_state.TrainState):
    batch_stats: Any = None

# Perf note (measured, rejected): packing the scan carry's ~430 small f32
# leaves (BN scales/stats + Adam moments) into one vector to coalesce
# XLA's per-array VMEM prefetch copies benched 1.7% SLOWER (7,603 vs 7,731
# img/s/chip) — the per-array async prefetches were already overlapped and
# the pack/unpack passes were pure overhead.


def create_train_state(model, optimizer, rng, sample_glimpses) -> TrainState:
    variables = model.init(rng, sample_glimpses, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=optimizer,
        batch_stats=variables.get("batch_stats", {}),
    )


def unroll_from_env(value: str | None, on_tpu: bool):
    """Resolve a BENCH_UNROLL-style string to ``make_train_step``'s
    ``unroll`` argument. Shared by bench.py and tools/profile_step.py so
    both default to the measured flagship configuration (``unroll=5`` on
    TPU — PERF.md round 3; plain scan elsewhere)."""
    if value is None:  # unset → measured default; explicit "" → plain scan
        value = "5" if on_tpu else ""
    if not value:
        return None
    if value == "scan":
        return False
    if value in ("full", "true"):
        return True
    return int(value)


def make_train_step(model, mesh, retina_cfg: retina.RetinaConfig,
                    num_fixations: int, temperature: float,
                    donate: bool = True, unroll: bool | None = None):
    """Build the jitted train step.

    Returns ``step(state, images_u8, key) -> (state, metrics)`` where
    ``images_u8`` is the global ``(B, S, S, 3)`` uint8 batch (sharded over
    the data axis by GSPMD) and ``metrics`` carries the per-fixation loss
    vector (the reference logs the last fixation's loss,
    ``Contrastive_Learning.py:729``). The model must be built WITHOUT an
    ``axis_name`` (plain BatchNorm = global-batch statistics under GSPMD,
    which IS SyncBatchNorm semantics).

    ``unroll``: fixation-loop tracing strategy.
      * ``True`` — straight-line Python loop (no scan primitive). Fastest
        execution: on CPU, XLA executes the conv backward inside a
        scan/while body ~50× slower than the identical straight-line
        program (147 s vs 3 s per step, ResNet-18 B=32); on TPU it removes
        the per-iteration carry copies of every parameter/optimizer leaf
        (profiled at ~15 ms/step = 10%) and benched 8,695 vs 8,500
        img/s/chip — but full-model compiles grow ~2.5× (≈13 min).
      * an ``int`` — ``lax.scan(..., unroll=n)``: copies amortized n×,
        compile growth bounded (unavailable relief on CPU, where the scan
        primitive itself carries the pathology).
      * ``False`` — plain ``lax.scan``.
      * ``None`` (default) — auto: Python loop on CPU; ``lax.scan(unroll=5)``
        on TPU — the measured-best flagship configuration (8,767 vs 8,500
        img/s/chip for the plain scan, PERF.md round 3), so a production
        driver run gets the benched throughput without extra flags.
    """
    if unroll is None:
        unroll = (True if jax.default_backend() == "cpu"
                  else min(5, max(1, num_fixations)))

    def forward(params, batch_stats, glimpses, train):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mutated = model.apply(variables, glimpses, train=True,
                                       mutable=["batch_stats"])
            return out, mutated["batch_stats"]
        return model.apply(variables, glimpses, train=False), batch_stats

    def step(state: TrainState, images, key):
        batch = images.shape[0]
        src = images.shape[1]
        fix_keys = jax.random.split(key, 2 * (num_fixations + 1)).reshape(
            num_fixations + 1, 2, 2)
        # mip pyramid is view-independent: build once, reuse across all views.
        # (Hoisting ALL views into one sampler grid was tried and measured
        # 5% slower end-to-end — the per-view calls schedule better; see
        # retina.apply_retina_views + PERF.md.)
        pyramid = (retina.build_pyramid(images, retina_cfg)
                   if retina_cfg.mode == "matmul" else None)

        def view(images, kp_kn):
            kp, kn = kp_kn[0], kp_kn[1]
            p = retina.sample_unlabeled_params(kp, batch, src, retina_cfg)
            return retina.apply_retina(images, p, kn, retina_cfg,
                                       photometric=True, pyramid=pyramid)

        # first saccade (Contrastive_Learning.py:637-639): forward only, but
        # in train mode — BN statistics update, no gradient.
        g0 = view(images, fix_keys[0])
        h1, bs = forward(state.params, state.batch_stats, g0, train=True)
        state = state.replace(batch_stats=bs)

        def fixation(carry, kj):
            state, h1 = carry
            glimpses = view(images, kj)

            def loss_fn(params):
                h2, new_bs = forward(params, state.batch_stats, glimpses, True)
                loss, logits_ab, labels = contrastive_loss(
                    jax.lax.stop_gradient(h1), h2, temperature=temperature)
                return loss, (h2, new_bs)

            (loss, (h2, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads, batch_stats=new_bs)
            return (state, h2), loss

        if unroll is True:
            carry, losses = (state, h1), []
            for j in range(num_fixations):
                carry, loss = fixation(carry, fix_keys[1 + j])
                losses.append(loss)
            state, losses = carry[0], jnp.stack(losses)
        else:
            (state, _), losses = jax.lax.scan(
                fixation, (state, h1), fix_keys[1:],
                unroll=int(unroll) if unroll else 1)
        return state, {"losses": losses}

    return data_parallel_jit(step, mesh, batch_args=(1,),
                             donate_argnums=(0,) if donate else (),
                             num_outputs=2)


def make_eval_step(model, mesh, retina_cfg: retina.RetinaConfig,
                   temperature: float):
    """Validation step: two saccades, contrastive top-1/top-5 from
    ``logits_ab`` (``Contrastive_Learning.py:751-904``)."""

    def step(state: TrainState, images, key):
        batch = images.shape[0]
        src = images.shape[1]
        ks = jax.random.split(key, 4)
        pyramid = (retina.build_pyramid(images, retina_cfg)
                   if retina_cfg.mode == "matmul" else None)

        def view(kp, kn):
            p = retina.sample_unlabeled_params(kp, batch, src, retina_cfg)
            return retina.apply_retina(images, p, kn, retina_cfg,
                                       photometric=True, pyramid=pyramid)

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        h1 = model.apply(variables, view(ks[0], ks[1]), train=False)
        h2 = model.apply(variables, view(ks[2], ks[3]), train=False)
        loss, logits_ab, labels = contrastive_loss(
            h1, h2, temperature=temperature)
        top1 = top_k_accuracy(logits_ab, labels, 1)
        top5 = top_k_accuracy(logits_ab, labels, 5)
        return {"loss": loss, "top1": top1, "top5": top5}

    return data_parallel_jit(step, mesh, batch_args=(1,))
