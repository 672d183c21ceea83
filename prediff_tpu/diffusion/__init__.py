from .schedule import (
    GaussianSchedule,
    make_beta_schedule,
    make_gaussian_schedule,
    extract,
)
from . import core
from .latent_diffusion import LatentDiffusion
from .knowledge_alignment import (
    KnowledgeAlignment,
    avg_x_objective,
    get_alignment_kwargs_avg_x,
)
