"""Checkpoint/restore round-trip: bit-identical state, MTO state included
(the reference silently drops MTO state on resume — repaired quirk #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.engine import MTDGANTrainer, SupervisedTrainer
from mtd_gan_tpu.models.mtd_gan import MTDGANModel
from mtd_gan_tpu.models.red_cnn import REDCNNModel
from mtd_gan_tpu.utils.checkpoint import CheckpointManager


def test_supervised_roundtrip_bit_identical(rng, tmp_path):
    model = REDCNNModel(out_ch=8)
    trainer = SupervisedTrainer(model, lr=1e-3)
    state = trainer.create_state(rng)
    x = jax.random.uniform(rng, (2, 64, 64, 1))
    y = jnp.clip(x + 0.02, 0, 1)
    state, _ = trainer.train_step(state, x, y)

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(0, state, extra={"note": "test"})
    template = trainer.create_state(jax.random.PRNGKey(99))
    epoch, restored = ckpt.restore(template)
    ckpt.close()
    assert epoch == 0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # predictions identical after restore
    np.testing.assert_array_equal(
        np.asarray(model.apply(state.params, x)),
        np.asarray(model.apply(restored.params, x)))


def test_mtd_roundtrip_restores_mto_state(rng, tmp_path):
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=1)
    trainer = MTDGANTrainer(model, method="dwa")  # dwa has cost-history state
    state = trainer.create_state(rng)
    x = jax.random.uniform(rng, (1, 64, 64, 1))
    y = jnp.clip(x + 0.02, 0, 1)
    for _ in range(2):
        state, _ = trainer.train_step(state, x, y)
    assert int(state.mto_state.step) == 2

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(1, state)
    template = trainer.create_state(jax.random.PRNGKey(7))
    _, restored = ckpt.restore(template)
    ckpt.close()
    assert int(restored.mto_state.step) == 2
    np.testing.assert_array_equal(np.asarray(state.mto_state.costs),
                                  np.asarray(restored.mto_state.costs))
    # spectral-norm u vectors restored too
    a = jax.tree_util.tree_leaves(state.state_d)[0]
    b = jax.tree_util.tree_leaves(restored.state_d)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_restore_of_train_checkpoint_without_method(rng, tmp_path):
    """test.py must read a train checkpoint WITHOUT repeating --method —
    the reference's test.py loads model_state_dict from full train
    checkpoints with no method flag (test.py:100-104). Found live on the
    TPU CLI round-trip (r5): the eval trainer's mto_state=None template
    mismatched the saved pcgrad dict; CheckpointManager now merges the
    missing subtrees from checkpoint metadata and drops them again."""
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=1)
    trainer = MTDGANTrainer(model, method="pcgrad")
    state = trainer.create_state(rng)
    x = jax.random.uniform(rng, (1, 64, 64, 1))
    y = jnp.clip(x + 0.02, 0, 1)
    state, _ = trainer.train_step(state, x, y)

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    ckpt.save(1, state)
    eval_trainer = MTDGANTrainer(model, method=None)  # test.py: no --method
    template = eval_trainer.create_state(jax.random.PRNGKey(7))
    assert template.mto_state is None
    step, restored = ckpt.restore(template)
    ckpt.close()
    assert step == 1
    assert restored.mto_state is None  # train-only state dropped
    for a, b in zip(jax.tree_util.tree_leaves(state.params_g),
                    jax.tree_util.tree_leaves(restored.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
