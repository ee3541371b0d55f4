"""Cross-framework NT-Xent parity: our loss vs an independent PyTorch
implementation written from the SimCLR paper (NOT the reference's code).

BASELINE.md requires NT-Xent loss curves within 1% of a PyTorch re-run;
this pins the per-batch loss itself to torch float64 on identical inputs,
including the distributed stop-gradient semantics (gradient only through
the local view-2 rows, SURVEY §2.4.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_active_ai_tpu.objectives.ntxent import contrastive_loss


def _torch_ntxent(h1, h2, temperature):
    """SimCLR NT-Xent (paper eq. 1 summed over both view directions, soft
    cross-entropy with self-similarity masked), torch float64."""
    a = torch.nn.functional.normalize(torch.from_numpy(h1).double(), dim=1)
    b = torch.nn.functional.normalize(torch.from_numpy(h2).double(), dim=1)
    n = a.shape[0]
    big = 1e9
    laa = a @ a.T / temperature - big * torch.eye(n).double()
    lbb = b @ b.T / temperature - big * torch.eye(n).double()
    lab = a @ b.T / temperature
    lba = b @ a.T / temperature
    target = torch.arange(n)
    loss_a = torch.nn.functional.cross_entropy(
        torch.cat([lab, laa], dim=1), target)
    loss_b = torch.nn.functional.cross_entropy(
        torch.cat([lba, lbb], dim=1), target)
    return float(loss_a + loss_b)


def test_ntxent_matches_torch(rng):
    k1, k2 = jax.random.split(rng)
    h1 = np.asarray(jax.random.normal(k1, (16, 32)), np.float32)
    h2 = np.asarray(jax.random.normal(k2, (16, 32)), np.float32)
    for t in (1.0, 0.5, 0.05):
        ours, _, _ = contrastive_loss(jnp.asarray(h1), jnp.asarray(h2),
                                      temperature=t)
        ref = _torch_ntxent(h1, h2, t)
        assert abs(float(ours) - ref) / abs(ref) < 1e-4, (t, float(ours), ref)


def test_ntxent_gradient_matches_torch(rng):
    """Distributed-parity gradients: view 1 detached, negatives detached —
    grads flow only through the h2 rows of the ba/bb blocks."""
    k1, k2 = jax.random.split(rng)
    h1 = np.asarray(jax.random.normal(k1, (8, 16)), np.float32)
    h2 = np.asarray(jax.random.normal(k2, (8, 16)), np.float32)
    t = 0.2

    g_ours = jax.grad(
        lambda x: contrastive_loss(jnp.asarray(h1), x, temperature=t)[0]
    )(jnp.asarray(h2))

    x = torch.from_numpy(h2).double().requires_grad_(True)
    a = torch.nn.functional.normalize(torch.from_numpy(h1).double(), dim=1)
    bl = torch.nn.functional.normalize(x, dim=1)
    bg = bl.detach()  # the "gathered" copy: non-differentiable in torch
    n = a.shape[0]
    big = 1e9
    eye = torch.eye(n).double()
    laa = a @ a.T / t - big * eye
    lbb = bl @ bg.T / t - big * eye
    lab = a @ bg.T / t
    lba = bl @ a.T / t
    target = torch.arange(n)
    loss = (torch.nn.functional.cross_entropy(torch.cat([lab, laa], 1), target)
            + torch.nn.functional.cross_entropy(torch.cat([lba, lbb], 1), target))
    loss.backward()
    np.testing.assert_allclose(np.asarray(g_ours), x.grad.numpy(),
                               rtol=1e-3, atol=1e-6)
