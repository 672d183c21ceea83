from .ema import ema_update, ema_decay
from .optim import build_lr_schedule, build_optimizer
from .train_state import EmaTrainState
from .diffusion_trainer import DiffusionTrainer
from .alignment_trainer import AlignmentTrainer
from .vae_trainer import VAETrainer
