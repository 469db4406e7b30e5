from .sql_features import (  # noqa: F401
    acf1_df,
    acf10_df,
    count_entropy_agg,
    crossing_points_df,
    intervals_df,
    pacf5_df,
    seas_acf1_df,
    series_length_agg,
    sparsity_agg,
    statistics_aggs,
    tiled_var_df,
)
