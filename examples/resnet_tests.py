#!/usr/bin/env python
"""Model-zoo shape smoke tests (notebook parity).

Script equivalent of ``SimCLR/ResNet/ResNet Tests.ipynb`` (SURVEY §2 #26):
the legacy 15-channel ResNet on a (1, 20, 30, 15) input and the 1-D ResNet
on a (1, 5000, 1) signal.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp

from multimodal_active_ai_tpu.models.resnet_legacy import legacy_resnet18
from multimodal_active_ai_tpu.models.resnet1d import resnet1d_101


def main():
    rng = jax.random.PRNGKey(0)

    legacy = legacy_resnet18(axis_name=None, norm_kind="bn")
    x = jax.random.normal(rng, (1, 20, 30, 15))
    v = legacy.init(rng, x, train=False)
    out = legacy.apply(v, x, train=False)
    print("LegacyResNet18 (1, 20, 30, 15) ->", tuple(out.shape))

    r1d = resnet1d_101()
    sig = jax.random.normal(rng, (1, 5008, 1))  # multiple of final pool
    v = r1d.init(rng, sig, train=False)
    out = r1d.apply(v, sig, train=False)
    print("ResNet1d-101 (1, 5008, 1) ->", tuple(out.shape))


if __name__ == "__main__":
    main()
