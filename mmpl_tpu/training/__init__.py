"""Training objectives (model/__init__.py parity): CausalDiffusion
(teacher forcing), DMD, SiD, CausVid, GAN, ODE regression."""

from .diffusion import (DiffusionTrainer, make_loss_fn,
                        make_teacher_forcing_loss_fn)
from .distillation import DistillationConfig, Distiller, ode_regression_loss
from .self_forcing import (SelfForcingRollout, sample_num_frames,
                           slice_last_window)

__all__ = [
    "DiffusionTrainer", "make_loss_fn", "make_teacher_forcing_loss_fn",
    "DistillationConfig", "Distiller", "ode_regression_loss",
    "SelfForcingRollout", "sample_num_frames", "slice_last_window",
]
