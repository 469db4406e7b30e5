from .features import (  # noqa: F401
    FEATURES,
    DEFAULT_FEATURES,
    NORTH_STAR_FEATURES,
    compute_features,
    output_fields,
)
from . import stats  # noqa: F401
