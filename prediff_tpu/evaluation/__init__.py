from .skill_scores import SEVIRSkillScore, threshold_counts
from .metrics import (
    MeanMetric,
    mse,
    mae,
    ssim,
    crps_ensemble,
    pearson_corr,
)
from .fvd import (
    FrechetVideoDistance,
    FVDState,
    InceptionI3d,
    frechet_distance,
    preprocess_video,
)
from .suite import ForecastEvalSuite
