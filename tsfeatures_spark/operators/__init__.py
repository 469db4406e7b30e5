from .features import features_long, features_wide  # noqa: F401
from .rollup import TIERS, merge_algebraic, rollup_doc, rollup_tiers, window_features_matrix  # noqa: F401
