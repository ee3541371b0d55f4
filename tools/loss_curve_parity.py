#!/usr/bin/env python
"""Loss-curve parity harness: SimCLR training dynamics vs a PyTorch re-run.

BASELINE.md target #2: "NT-Xent loss curves within 1% of a PyTorch re-run,
SimCLR ResNet-18 + NT-Xent, CIFAR-10-size, batch 64" — the per-batch loss is
already pinned to torch float64 (``tests/test_torch_parity.py``); this
harness pins the multi-step *training trajectory*, i.e. the optimizer + BN +
LR-schedule + stop-gradient interaction of the reference hot loop
(``Contrastive_Learning.py:577-740``):

  h1 = model(view_0)                      # train-mode BN update, no grad
  for j in 1..F:
      h2 = model(view_j)
      loss = NT-Xent(stop_grad(h1), h2)   # view-1 detached, Objective.py:51
      backward; adam step; lr = schedule(t)
      h1 = h2                             # consecutive saccades pair up

Both sides start from the SAME parameters (the flax init exported into an
independently written torch model) and consume the SAME pre-augmented
glimpse stream (seeded numpy), so any per-step divergence is training-math
divergence, not data. The torch model is written here from the paper/spec —
it deliberately mirrors this framework's module tree (NOT the reference's
code) so the export is a mechanical layout walk.

Run:  MAAI_PLATFORM=cpu python tools/loss_curve_parity.py [--steps 50]
Prints per-step losses and the max relative difference; exits nonzero if
any step differs by more than 1%.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


GLIMPSE = 30
CHANNELS = 12


# --------------------------------------------------------------------------
# torch oracle model: mirrors SimCLRModule(arch=ResNet18) module-by-module


def build_torch_simclr():
    import torch
    from torch import nn

    class Block(nn.Module):
        def __init__(self, inp, planes, stride):
            super().__init__()
            self.Conv_0 = nn.Conv2d(inp, planes, 3, stride, 1, bias=False)
            self.BatchNorm_0 = nn.BatchNorm2d(planes)
            self.Conv_1 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.BatchNorm_1 = nn.BatchNorm2d(planes)
            self.down = stride != 1 or inp != planes
            if self.down:
                self.Conv_2 = nn.Conv2d(inp, planes, 1, stride, bias=False)
                self.BatchNorm_2 = nn.BatchNorm2d(planes)

        def forward(self, x):
            identity = x
            out = torch.relu(self.BatchNorm_0(self.Conv_0(x)))
            out = self.BatchNorm_1(self.Conv_1(out))
            if self.down:
                identity = self.BatchNorm_2(self.Conv_2(x))
            return torch.relu(out + identity)

    class Encoder(nn.Module):
        """Foveated ResNet-18: 12-ch stride-1 conv1, no maxpool/avgpool."""

        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(CHANNELS, 64, 7, 1, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            inp = 64
            for stage, (planes, stride) in enumerate(
                    zip((64, 128, 256, 512), (1, 2, 2, 2))):
                for b in range(2):
                    s = stride if b == 0 else 1
                    setattr(self, f"layer{stage + 1}_{b}", Block(inp, planes, s))
                    inp = planes

        def forward(self, x):
            x = torch.relu(self.bn1(self.conv1(x)))
            for stage in range(1, 5):
                for b in range(2):
                    x = getattr(self, f"layer{stage}_{b}")(x)
            return x

    class Projector(nn.Module):
        def __init__(self):
            super().__init__()
            self.Dense_0 = nn.Linear(512 * 4 * 4, 1024)
            self.Dense_1 = nn.Linear(1024, 128)

        def forward(self, flat):
            return self.Dense_1(torch.relu(self.Dense_0(flat)))

    class SimCLR(nn.Module):
        def __init__(self):
            super().__init__()
            self.f = Encoder()
            self.g = Projector()

        def forward(self, x_nhwc):
            x = x_nhwc.permute(0, 3, 1, 2).contiguous()
            feats = self.f(x)
            # flax MLP flattens NHWC: permute back before reshape
            flat = feats.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
            return self.g(flat)

    return SimCLR()


def export_flax_to_torch(params, batch_stats, tmodel):
    """Copy the flax SimCLR tree into the mirrored torch model (HWIO->OIHW
    convs, transposed Dense kernels, BN scale/bias + running stats)."""
    import torch

    def to_t(a):
        return torch.from_numpy(np.asarray(a, np.float32))

    def walk(pnode, snode, mod):
        for key, val in pnode.items():
            sub = getattr(mod, key, None)
            if sub is None:
                raise KeyError(f"torch model has no mirror for '{key}'")
            if isinstance(val, dict) and "kernel" in val:
                k = np.asarray(val["kernel"])
                if k.ndim == 4:      # conv HWIO -> OIHW
                    sub.weight.data = to_t(k.transpose(3, 2, 0, 1))
                else:                # dense (in, out) -> (out, in)
                    sub.weight.data = to_t(k.T)
                    sub.bias.data = to_t(val["bias"])
            elif isinstance(val, dict) and "scale" in val:
                sub.weight.data = to_t(val["scale"])
                sub.bias.data = to_t(val["bias"])
                st = snode[key]
                sub.running_mean.data = to_t(st["mean"])
                sub.running_var.data = to_t(st["var"])
            elif isinstance(val, dict):
                walk(val, snode.get(key, {}), sub)

    walk(params, batch_stats, tmodel)


def torch_ntxent(h1_detached, h2, temperature):
    """NT-Xent with the production stop-gradient semantics: view 1 and the
    "gathered" negatives detached; gradient flows only through the local h2
    rows of the ab/ba/bb blocks (SURVEY §2.4.3)."""
    import torch

    a = torch.nn.functional.normalize(h1_detached, dim=1)
    b = torch.nn.functional.normalize(h2, dim=1)
    bg = b.detach()
    n = a.shape[0]
    big = 1e9
    eye = torch.eye(n)
    laa = a @ a.T / temperature - big * eye
    lbb = b @ bg.T / temperature - big * eye
    lab = a @ bg.T / temperature
    lba = b @ a.T / temperature
    target = torch.arange(n)
    return (torch.nn.functional.cross_entropy(torch.cat([lab, laa], 1), target)
            + torch.nn.functional.cross_entropy(torch.cat([lba, lbb], 1), target))


def view_stream(seed, steps, fixations, batch):
    """The shared pre-augmented glimpse stream: (F+1) views per step."""
    def views_for(step):
        r = np.random.RandomState(seed + step)
        return r.uniform(0.0, 255.0, (fixations + 1, batch, GLIMPSE, GLIMPSE,
                                      CHANNELS)).astype(np.float32)
    return views_for


# --------------------------------------------------------------------------


def run_jax(steps, fixations, batch, base_lr, temperature, seed):
    """This framework's training dynamics on the shared glimpse stream."""
    import jax
    import jax.numpy as jnp

    from multimodal_active_ai_tpu.models import SimCLRModule
    from multimodal_active_ai_tpu.objectives.ntxent import contrastive_loss
    from multimodal_active_ai_tpu.train import optimizers, schedule, simclr_train

    model = SimCLRModule(arch="ResNet18", axis_name=None, norm_kind="bn",
                         dtype=jnp.float32)
    sched = schedule.simclr_learning_rate(
        base_lr, batch, num_examples=steps * batch, batch_size=batch,
        warmup_epochs=1, train_epochs=10)
    tx = optimizers.get_optimizer("adam", sched)
    rng = jax.random.PRNGKey(seed)
    sample = jnp.ones((2, GLIMPSE, GLIMPSE, CHANNELS))
    state = simclr_train.create_train_state(model, tx, rng, sample)
    init = (jax.device_get(state.params), jax.device_get(state.batch_stats))

    def forward(params, stats, v):
        out, mut = model.apply({"params": params, "batch_stats": stats}, v,
                               train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    @jax.jit
    def jstep(state, views):
        h1, bs = forward(state.params, state.batch_stats, views[0])
        state = state.replace(batch_stats=bs)
        losses = []
        for j in range(1, fixations + 1):
            def loss_fn(params):
                h2, nbs = forward(params, state.batch_stats, views[j])
                loss, _, _ = contrastive_loss(jax.lax.stop_gradient(h1),
                                              h2, temperature=temperature)
                return loss, (h2, nbs)

            (loss, (h2, nbs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads, batch_stats=nbs)
            h1 = h2
            losses.append(loss)
        return state, jnp.stack(losses)

    stream = view_stream(seed, steps, fixations, batch)
    curve = []
    for t in range(steps):
        state, losses = jstep(state, jnp.asarray(stream(t)))
        curve.extend(float(x) for x in jax.device_get(losses))
    return np.asarray(curve), init


def run_torch(steps, fixations, batch, base_lr, temperature, seed, init):
    """Independent PyTorch re-run of the same dynamics from the same init."""
    import torch

    from multimodal_active_ai_tpu.train import schedule

    torch.manual_seed(0)
    torch.set_num_threads(max(torch.get_num_threads(), 1))
    model = build_torch_simclr()
    export_flax_to_torch(init[0], init[1], model)
    model.train()
    sched = schedule.simclr_learning_rate(
        base_lr, batch, num_examples=steps * batch, batch_size=batch,
        warmup_epochs=1, train_epochs=10)
    opt = torch.optim.Adam(model.parameters(), lr=0.0)

    stream = view_stream(seed, steps, fixations, batch)
    curve = []
    t_update = 0  # optax schedules index by completed updates (count from 0)
    for t in range(steps):
        views = torch.from_numpy(stream(t))
        with torch.no_grad():
            h1 = model(views[0])
        for j in range(1, fixations + 1):
            h2 = model(views[j])
            loss = torch_ntxent(h1.detach(), h2, temperature)
            for grp in opt.param_groups:
                grp["lr"] = float(sched(t_update))
            opt.zero_grad()
            loss.backward()
            opt.step()
            t_update += 1
            h1 = h2.detach()
            curve.append(float(loss))
    return np.asarray(curve)


def compare(steps=50, fixations=2, batch=64, base_lr=0.8, temperature=0.05,
            seed=15, tol=0.01, verbose=True):
    jax_curve, init = run_jax(steps, fixations, batch, base_lr, temperature,
                              seed)
    torch_curve = run_torch(steps, fixations, batch, base_lr, temperature,
                            seed, init)
    rel = np.abs(jax_curve - torch_curve) / np.abs(torch_curve)
    if verbose:
        print(f"{'update':>6} {'jax':>12} {'torch':>12} {'rel':>10}")
        for i, (a, b, r) in enumerate(zip(jax_curve, torch_curve, rel)):
            print(f"{i:6d} {a:12.6f} {b:12.6f} {r:10.2e}")
        print(f"max rel diff over {len(rel)} updates: {rel.max():.3e} "
              f"(tolerance {tol})")
    return jax_curve, torch_curve, float(rel.max())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--fixations", type=int, default=2)
    ap.add_argument("-b", "--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=0.8)
    ap.add_argument("--temperature", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=15)
    ap.add_argument("--tol", type=float, default=0.01)
    args = ap.parse_args(argv)
    _, _, worst = compare(args.steps, args.fixations, args.batch_size,
                          args.lr, args.temperature, args.seed, args.tol)
    if worst > args.tol:
        print(f"FAIL: max relative loss difference {worst:.4f} > {args.tol}")
        return 1
    print(f"PASS: loss curves within {args.tol:.1%} over "
          f"{args.steps * args.fixations} updates")
    return 0


if __name__ == "__main__":
    sys.exit(main())
