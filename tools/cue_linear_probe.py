#!/usr/bin/env python
"""Is the cue-corpus label linearly decodable from glimpses AT ALL?

Every RLS learned-saccade attempt (queue7/8/9, PARITY.md) pinned CE at the
uniform-prior floor. Queue9's postmortem found the from-init optimizer bug
(random backbones were frozen), but the *raw signal strength* hypothesis —
the hue cue occupies only a few lanes of the coarse glimpse at partial
visibility, through JPEG — has never been tested below the training
machinery. This probe is that test: collect R random-fixation glimpse
stacks per image through the PRODUCTION retina (the exact tensors the DETR
backbone sees, ``detr_train.collect_glimpse_sequence``), flatten them, and
fit a multinomial logistic regression.

Three numbers per split, vs 1/C chance:
  per-fix   top-1 on single glimpses (what one fixation carries)
  img-mean  top-1 on mean logits over the R fixations (the budget the
            classifier actually gets)
  oracle    per-fix top-1 with every fixation AT the cue (--oracle-fix) —
            the ceiling if the policy were perfect

Interpretation: if even the ORACLE probe is at chance, the corpus cue does
not survive the retina and the task needs redesign. If oracle learns but
random-fix doesn't, exploration can't bootstrap — widen the cue or raise
R. If random-fix learns here but the driver doesn't, the blocker is back
in the model/optimizer.

Usage (CPU; the leading ``none`` fills RLSConfig's backbone positional —
no model is built here):
  JAX_PLATFORMS=cpu python tools/cue_linear_probe.py none DATA \
      [--fixations 3] [--probe-steps 400] [--oracle-fix 0.9] \
      [-b 48] [--num-classes 4] [--canvas-cache DIR]

Reference context: the scientific question of
DETR_Image_Classification_RLS.py (can learned saccades beat random ones),
reduced to its precondition.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Default this diagnostic to CPU (its documented mode). The TPU platform
# plugin in this image overrides the JAX_PLATFORMS env var, so the config
# update is required even when the env var IS set to cpu; when it is unset
# we also default to cpu rather than grabbing the (exclusive) TPU client.
if os.environ.get("JAX_PLATFORMS", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def collect_split(cfg, split, fixations, oracle_fix, retina_cfg, rng_seed):
    """Glimpse features for one split: (random_feats, oracle_feats, labels).

    random_feats/oracle_feats: (N, R, D) float32 flattened glimpse stacks.
    """
    from contrastive_learning import build_reader
    from multimodal_active_ai_tpu.train.detr_train import collect_glimpse_sequence
    from multimodal_active_ai_tpu.utils.rng import epoch_key_stream

    reader = build_reader(cfg, split, 0, 1, batch_size=cfg.batch_size)

    @jax.jit
    def collect(images, key):
        rand, _, _ = collect_glimpse_sequence(
            images, key, retina_cfg, fixations, min_fixations=fixations)
        okey = jax.random.fold_in(key, 1)
        oracle_xy = jnp.full((images.shape[0], 2), 0.5).at[:, 0].set(oracle_fix)
        orac, _, _ = collect_glimpse_sequence(
            images, okey, retina_cfg, fixations, min_fixations=fixations,
            saccades=oracle_xy)
        b = images.shape[0]
        return (rand.reshape(b, fixations, -1).astype(jnp.float32),
                orac.reshape(b, fixations, -1).astype(jnp.float32))

    keys = epoch_key_stream(jax.random.PRNGKey(rng_seed), 0, len(reader) + 1)
    feats_r, feats_o, labels = [], [], []
    for i, (images, lab) in enumerate(iter(reader)):
        r, o = collect(jnp.asarray(images), keys[i])
        feats_r.append(np.asarray(r))
        feats_o.append(np.asarray(o))
        labels.append(np.asarray(lab))
    reader.reset()
    return (np.concatenate(feats_r), np.concatenate(feats_o),
            np.concatenate(labels))


def fit_probe(train_x, train_y, val_x, val_y, num_classes, steps, lr=1e-2):
    """Full-batch multinomial logistic regression on standardized features.

    Returns (train_perfix, val_perfix, val_imgmean) top-1 fractions.
    train_x/val_x: (N, R, D); per-fixation samples share the image label.
    """
    import optax

    n, r, d = train_x.shape
    mu = train_x.reshape(-1, d).mean(0)
    sd = train_x.reshape(-1, d).std(0) + 1e-6
    tx_feats = jnp.asarray((train_x.reshape(-1, d) - mu) / sd)
    ty = jnp.asarray(np.repeat(train_y, r))
    vx = jnp.asarray((val_x.reshape(-1, d) - mu) / sd)

    params = {"w": jnp.zeros((d, num_classes)), "b": jnp.zeros((num_classes,))}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = tx_feats @ p["w"] + p["b"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, ty).mean() + 1e-4 * (p["w"] ** 2).sum()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if (i + 1) % max(steps // 4, 1) == 0:
            print(f"    probe step {i + 1}/{steps} CE {float(loss):.4f}",
                  flush=True)

    def top1(logits, y):
        return float((np.asarray(logits).argmax(-1) == y).mean())

    tr_logits = tx_feats @ params["w"] + params["b"]
    v_logits = vx @ params["w"] + params["b"]
    v_img = np.asarray(v_logits).reshape(val_x.shape[0], r, -1).mean(1)
    return (top1(tr_logits, np.repeat(train_y, r)),
            top1(v_logits, np.repeat(val_y, r)),
            top1(v_img, val_y))


def main(argv=None):
    from multimodal_active_ai_tpu.config import RLSConfig, parse_into
    from multimodal_active_ai_tpu.ops import retina

    argv = list(sys.argv[1:] if argv is None else argv)

    def pop(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            if i + 1 >= len(argv):
                sys.exit(f"cue_linear_probe: {flag} requires a value")
            try:
                v = cast(argv[i + 1])
            except ValueError:
                sys.exit(f"cue_linear_probe: invalid value for {flag}: "
                         f"{argv[i + 1]!r} (expected {cast.__name__})")
            del argv[i:i + 2]
            return v
        return default

    fixations = pop("--fixations", 3, int)
    probe_steps = pop("--probe-steps", 400, int)
    oracle_fix = pop("--oracle-fix", 0.9, float)
    # defaults PREPENDED so user-supplied --dataset/--num-classes win
    # (argparse last-wins; appending silently overrode them to imagenet/4)
    cfg = parse_into(RLSConfig, ["--dataset", "imagenet",
                                 "--num-classes", "4"] + argv,
                     prog="cue_linear_probe")
    retina_cfg = retina.RetinaConfig(canvas_size=cfg.canvas_size)
    chance = 1.0 / cfg.num_classes

    print(f"== collecting glimpses: R={fixations} random fixations/image + "
          f"oracle at x={oracle_fix} ==", flush=True)
    tr_r, tr_o, tr_y = collect_split(cfg, "train", fixations, oracle_fix,
                                     retina_cfg, cfg.seed)
    va_r, va_o, va_y = collect_split(cfg, "val", fixations, oracle_fix,
                                     retina_cfg, cfg.seed + 1)
    print(f"   train {tr_r.shape[0]} imgs, val {va_r.shape[0]} imgs, "
          f"feature dim {tr_r.shape[-1]}", flush=True)

    results = {}
    for name, (tx_, vx_) in {"random-fix": (tr_r, va_r),
                             "oracle-fix": (tr_o, va_o)}.items():
        print(f"== probe: {name} ==", flush=True)
        tr_acc, v_acc, v_img = fit_probe(tx_, tr_y, vx_, va_y,
                                         cfg.num_classes, probe_steps)
        results[name] = (tr_acc, v_acc, v_img)
        print(f"  {name}: train per-fix {tr_acc:.3f}  val per-fix {v_acc:.3f}"
              f"  val img-mean {v_img:.3f}  (chance {chance:.3f})", flush=True)

    margin = 0.15
    rand_ok = results["random-fix"][2] > chance + margin
    orac_ok = results["oracle-fix"][1] > chance + margin
    if not orac_ok:
        print("VERDICT: cue NOT decodable even at the oracle fixation — the "
              "corpus cue does not survive the retina; redesign the corpus "
              "before any further training runs")
    elif not rand_ok:
        print("VERDICT: oracle decodes but random fixations do NOT — "
              "exploration cannot bootstrap the classifier at this cue "
              "width/visibility; widen the cue or raise the fixation budget")
    else:
        print("VERDICT: cue linearly decodable from random-fixation glimpses "
              "— signal strength is sufficient; a failure to learn in the "
              "driver is a model/optimizer problem")
    return results


if __name__ == "__main__":
    main()
