"""Training engine: jitted per-family TrainStep strategies + generic loops.

Replaces the reference's seven near-duplicate train/valid/test loop triples
(engine.py:26-897) with one generic loop parameterized by a trainer object.
"""

from mtd_gan_tpu.engine.supervised import SupervisedTrainer
from mtd_gan_tpu.engine.gan import MTDGANTrainer

__all__ = ["SupervisedTrainer", "MTDGANTrainer"]
