from .sevir import (
    SEVIRDataLoader,
    SEVIRDataset,
    SEVIRDataModule,
    SEVIR_DATA_TYPES,
    PREPROCESS_SCALE_01,
    PREPROCESS_SCALE_SEVIR,
    PREPROCESS_OFFSET_SEVIR,
)
from .augmentation import augment_seq, fixed_angle_rotation
from .synthetic import make_synthetic_sevir_lr, synthetic_batch_iterator
