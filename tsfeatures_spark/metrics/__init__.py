from .metrics import (  # noqa: F401
    AVAILABLE_METRICS,
    evaluate_panel,
    mape_expr,
    mse_expr,
    pinball_expr,
    rmse_expr,
    smape_expr,
)
