from pyfaceanalysis_tpu.ops.gaussian import GaussianRegressor  # noqa: F401
from pyfaceanalysis_tpu.ops.contrast import (  # noqa: F401
    contrast_normalize_avg_std,
    contrast_enhance_patches,
)
