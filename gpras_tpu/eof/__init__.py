"""EOF/PCA spatial reduction and forcing feature engineering."""

from gpras_tpu.eof.preprocessor import (  # noqa: F401
    HmsPreProcessor,
    PreProcessor,
    compute_norths_rule,
)
from gpras_tpu.eof.pca import pca_fit  # noqa: F401
