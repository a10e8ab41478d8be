from facegantts_tpu.evaluation.metrics import (  # noqa: F401
    composite_metric,
    log_f0_rmse,
    log_spectral_distance,
    mcd,
    speaker_similarity,
)
