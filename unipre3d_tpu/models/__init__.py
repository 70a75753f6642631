from unipre3d_tpu.models.gaussian_predictor import (
    GaussianSplatPredictor,
    MODEL_CONFIGS,
)
