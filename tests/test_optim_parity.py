"""Optimizer semantic parity vs torch (reference optimizers.py:4-14):
'adam' couples weight decay into the gradient (torch Adam), 'adamw'
decouples it (torch AdamW). Identical update trajectories on a toy param."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from mtd_gan_tpu.optim import get_optimizer, set_learning_rate


def _run_ours(name, steps, lr=1e-2, wd=5e-4):
    tx = get_optimizer(name, lr=lr, weight_decay=wd)
    p = jnp.asarray([1.0, -2.0, 3.0])
    state = tx.init(p)
    traj = []
    for i in range(steps):
        g = 0.1 * p + jnp.asarray([0.05, -0.02, 0.01])  # deterministic grads
        upd, state = tx.update(g, state, p)
        p = optax.apply_updates(p, upd)
        traj.append(np.asarray(p))
    return traj


def _run_torch(cls, steps, lr=1e-2, wd=5e-4):
    p = torch.nn.Parameter(torch.tensor([1.0, -2.0, 3.0]))
    opt = cls([p], lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd)
    traj = []
    for i in range(steps):
        opt.zero_grad()
        p.grad = (0.1 * p + torch.tensor([0.05, -0.02, 0.01])).detach()
        opt.step()
        traj.append(p.detach().numpy().copy())
    return traj


def test_adam_matches_torch_coupled_wd():
    ours = _run_ours("adam", 20)
    ref = _run_torch(torch.optim.Adam, 20)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_adamw_matches_torch_decoupled_wd():
    ours = _run_ours("adamw", 20)
    ref = _run_torch(torch.optim.AdamW, 20)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_injected_lr_change_applies():
    tx = get_optimizer("adamw", lr=1e-2)
    p = jnp.ones((3,))
    state = tx.init(p)
    set_learning_rate(state, 0.0)
    upd, state = tx.update(jnp.ones((3,)), state, p)
    np.testing.assert_allclose(np.asarray(upd), 0.0, atol=1e-12)
