from .schedule import (
    GaussianSchedule,
    make_beta_schedule,
    make_gaussian_schedule,
    extract,
)
