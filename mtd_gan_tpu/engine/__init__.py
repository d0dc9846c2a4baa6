"""Training engine: jitted per-family TrainStep strategies + generic loops.

Replaces the reference's seven near-duplicate train/valid/test loop triples
(engine.py:26-897) with one generic loop parameterized by a trainer object.
"""

from mtd_gan_tpu.engine.supervised import SupervisedTrainer
from mtd_gan_tpu.engine.gan import MTDGANTrainer
from mtd_gan_tpu.engine.wgan import AdversarialTrainer, DUGANTrainer

__all__ = [
    "SupervisedTrainer",
    "MTDGANTrainer",
    "AdversarialTrainer",
    "DUGANTrainer",
]
