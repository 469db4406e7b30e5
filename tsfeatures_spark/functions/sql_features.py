"""SQL-native (Catalyst) implementations of the cheap feature kernels.

These are the Tier-A features whose math is expressible with built-in
pyspark.sql.functions — they run JVM-side inside WholeStageCodegen with
partial aggregation, no Python worker at all. Semantics match the NumPy
kernels (ddof=1, linear-interpolation percentiles, median-crossing rule,
trailing-partial-tile drop) — see SURVEY.md §2.1 "Spark primitive" column.

Each builder returns a list of aliased Columns for ``groupBy(...).agg``, or
a DataFrame transformer for the windowed ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def statistics_aggs(col: str = "y") -> list[Column]:
    """Reference ``statistics`` kernel (tsfeatures.py:840-881) as native aggs.
    ``percentile`` (exact, linear interpolation) == np.quantile — NOT
    percentile_approx (SURVEY.md §2.6.11).

    r06: the seven quantiles come from ONE array-argument percentile
    aggregate instead of seven scalar ones — each scalar percentile
    maintains its own full-column value buffer per group, so the old form
    buffered every input row seven times. The physical aggregation
    deduplicates the identical percentile(col, array(...)) expression
    across the element_at projections, leaving one buffer; Spark's
    percentile uses the same linear-interpolation formula per requested
    quantile either way, so values are identical (driver oracle unchanged
    and green)."""
    c = F.col(col)
    qs = [0.5, 0.025, 0.05, 0.25, 0.75, 0.95, 0.975]
    names = ["median", "p2point5", "p5", "p25", "p75", "p95", "p97point5"]
    pct = F.percentile(c, F.array(*[F.lit(q) for q in qs]))
    return [
        F.sum(c).alias("total_sum"),
        F.avg(c).alias("mean"),
        F.var_samp(c).alias("variance"),
        *[F.element_at(pct, i + 1).alias(n) for i, n in enumerate(names)],
        F.max(c).alias("max"),
        F.min(c).alias("min"),
    ]


def sparsity_agg(col: str = "y") -> Column:
    """mean(x == 0) — tsfeatures.py:596-612."""
    return F.avg((F.col(col) == 0).cast("double")).alias("sparsity")


def count_entropy_agg(col: str = "y") -> Column:
    """-sum(x * ln x | x > 0) — tsfeatures.py:136-154."""
    c = F.col(col)
    return (-F.sum(F.when(c > 0, c * F.log(c)))).alias("count_entropy")


def series_length_agg() -> Column:
    return F.count(F.lit(1)).cast("double").alias("series_length")


def crossing_points_df(df: DataFrame, keys: list[str], order: list[str], col: str = "y") -> DataFrame:
    """Median-crossing count per series, pure SQL: per-key median join +
    lag() window — tsfeatures.py:156-178 semantics."""
    med = df.groupBy(*keys).agg(F.percentile(F.col(col), F.lit(0.5)).alias("_med"))
    w = Window.partitionBy(*keys).orderBy(*order)
    j = df.join(F.broadcast(med), keys)
    below = (F.col(col) <= F.col("_med")).cast("int")
    lagged = F.lag(below).over(w)
    return (
        j.withColumn("_b", below)
        .withColumn("_lb", lagged)
        .groupBy(*keys)
        .agg(F.sum((F.col("_b") != F.col("_lb")).cast("int")).cast("double").alias("crossing_points"))
    )


def tiled_var_df(df: DataFrame, keys: list[str], order: list[str], col: str = "y",
                 width: int = 10, inner: str = "mean") -> DataFrame:
    """stability (inner='mean') / lumpiness (inner='var') as a two-level
    native aggregate — tsfeatures.py:448-479/614-645: tiles of ``width``
    rows in series order, trailing partial tile dropped, outer var_samp;
    0 when n < 2*width. This two-level shape is the same cascade template
    the tier rollup uses (SURVEY.md §2.1)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    name = "stability" if inner == "mean" else "lumpiness"
    tiled = df.withColumn("_tile", ((F.row_number().over(w) - 1) / width).cast("long"))
    per_tile = tiled.groupBy(*keys, "_tile").agg(
        (F.avg(F.col(col)) if inner == "mean" else F.var_samp(F.col(col))).alias("_v"),
        F.count(F.lit(1)).alias("_n"),
    )
    totals = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_total"))
    return (
        per_tile.where(F.col("_n") == width)
        .groupBy(*keys)
        .agg(F.var_samp("_v").alias(name))
        .join(F.broadcast(totals), keys)
        .withColumn(name, F.when(F.col("_total") < 2 * width, F.lit(0.0)).otherwise(F.col(name)))
        .drop("_total")
    )


def acf1_df(df: DataFrame, keys: list[str], order: list[str], col: str = "y") -> DataFrame:
    """Biased lag-1 autocorrelation per series, window-native:
    sum((x_t-m)(x_{t+1}-m)) / sum((x_t-m)^2) — statsmodels acf parity."""
    w = Window.partitionBy(*keys).orderBy(*order)
    lagged = df.withColumn("_lag", F.lag(F.col(col)).over(w))
    stats = df.groupBy(*keys).agg(F.avg(F.col(col)).alias("_m"))
    j = lagged.join(F.broadcast(stats), keys)
    num = F.sum((F.col(col) - F.col("_m")) * (F.col("_lag") - F.col("_m")))
    den = F.sum((F.col(col) - F.col("_m")) * (F.col(col) - F.col("_m")))
    return j.groupBy(*keys).agg(F.try_divide(num, den).alias("x_acf1"))


def pacf5_df(df: DataFrame, keys: list[str], order: list[str], col: str = "y") -> DataFrame:
    """x_pacf5 (sum of squared partial autocorrelations at lags 1..5,
    method 'ldb') FULLY SQL-native: biased autocorrelations r1..r5 from
    five lag() columns, then the order-5 Levinson-Durbin recursion
    UNROLLED as scalar column arithmetic — no UDF anywhere. The recursion
    is scale-invariant, so normalized r's substitute for autocovariances.
    Matches kernels.pacf_features for series with n > 5."""
    w = Window.partitionBy(*keys).orderBy(*order)
    d = df
    for k in range(1, 6):
        d = d.withColumn(f"_lag{k}", F.lag(F.col(col), k).over(w))
    stats = df.groupBy(*keys).agg(F.avg(F.col(col)).alias("_m"))
    j = d.join(F.broadcast(stats), keys)
    dev = F.col(col) - F.col("_m")
    den = F.sum(dev * dev)
    aggs = [F.try_divide(F.sum(dev * (F.col(f"_lag{k}") - F.col("_m"))), den).alias(f"r{k}") for k in range(1, 6)]
    g = j.groupBy(*keys).agg(*aggs)
    r = {k: F.col(f"r{k}") for k in range(1, 6)}
    # Levinson-Durbin, order 5, unrolled (phi[j,k] = phi[j,k-1] - pkk*phi[k-j,k-1])
    g = g.withColumn("p11", r[1]).withColumn("d1", 1 - F.col("p11") * r[1])
    g = g.withColumn("p22", F.try_divide(r[2] - F.col("p11") * r[1], F.col("d1")))
    g = g.withColumn("p21", F.col("p11") - F.col("p22") * F.col("p11"))
    g = g.withColumn("d2", F.col("d1") * (1 - F.col("p22") * F.col("p22")))
    g = g.withColumn("p33", F.try_divide(r[3] - (F.col("p21") * r[2] + F.col("p22") * r[1]), F.col("d2")))
    g = g.withColumn("p31", F.col("p21") - F.col("p33") * F.col("p22"))
    g = g.withColumn("p32", F.col("p22") - F.col("p33") * F.col("p21"))
    g = g.withColumn("d3", F.col("d2") * (1 - F.col("p33") * F.col("p33")))
    g = g.withColumn("p44", F.try_divide(r[4] - (F.col("p31") * r[3] + F.col("p32") * r[2] + F.col("p33") * r[1]), F.col("d3")))
    g = g.withColumn("p41", F.col("p31") - F.col("p44") * F.col("p33"))
    g = g.withColumn("p42", F.col("p32") - F.col("p44") * F.col("p32"))
    g = g.withColumn("p43", F.col("p33") - F.col("p44") * F.col("p31"))
    g = g.withColumn("d4", F.col("d3") * (1 - F.col("p44") * F.col("p44")))
    g = g.withColumn("p55", F.try_divide(r[5] - (F.col("p41") * r[4] + F.col("p42") * r[3] + F.col("p43") * r[2] + F.col("p44") * r[1]), F.col("d4")))
    pacf5 = (
        F.col("p11") * F.col("p11") + F.col("p22") * F.col("p22")
        + F.col("p33") * F.col("p33") + F.col("p44") * F.col("p44")
        + F.col("p55") * F.col("p55")
    )
    return g.select(*keys, pacf5.alias("x_pacf5"))


def acf10_df(df: DataFrame, keys: list[str], order: list[str], col: str = "y") -> DataFrame:
    """x_acf10 (sum of squared biased autocorrelations at lags 1..10),
    window-native: ten lag() columns over ONE window spec (a single sort),
    then one aggregate — acf_features parity (tsfeatures.py:79) for
    series with n > 10."""
    w = Window.partitionBy(*keys).orderBy(*order)
    d = df
    for k in range(1, 11):
        d = d.withColumn(f"_lag{k}", F.lag(F.col(col), k).over(w))
    stats = df.groupBy(*keys).agg(F.avg(F.col(col)).alias("_m"))
    j = d.join(F.broadcast(stats), keys)
    dev = F.col(col) - F.col("_m")
    den = F.sum(dev * dev)
    acfs = [F.try_divide(F.sum(dev * (F.col(f"_lag{k}") - F.col("_m"))), den) for k in range(1, 11)]
    total = None
    for a in acfs:
        term = a * a
        total = term if total is None else total + term
    return j.groupBy(*keys).agg(total.alias("x_acf10"))


def seas_acf1_df(df: DataFrame, keys: list[str], order: list[str],
                 freq: int, col: str = "y") -> DataFrame:
    """Autocorrelation at the first seasonal lag (acf_features 'seas_acf1',
    tsfeatures.py:98-99), window-native: one lag(freq) column."""
    w = Window.partitionBy(*keys).orderBy(*order)
    lagged = df.withColumn("_lagm", F.lag(F.col(col), freq).over(w))
    stats = df.groupBy(*keys).agg(F.avg(F.col(col)).alias("_m"))
    j = lagged.join(F.broadcast(stats), keys)
    dev = F.col(col) - F.col("_m")
    num = F.sum(dev * (F.col("_lagm") - F.col("_m")))
    den = F.sum(dev * dev)
    return j.groupBy(*keys).agg(F.try_divide(num, den).alias("seas_acf1"))


def intervals_df(df: DataFrame, keys: list[str], order: list[str], col: str = "y") -> DataFrame:
    """intervals_mean / intervals_sd (run lengths of consecutive positive
    values, tsfeatures.py:425-446) via the gaps-and-islands trick:
    island id = row_number over all rows minus row_number over positive
    rows — pure SQL, matches the kernel (which, unlike the reference,
    does not mutate its input). Semantics note: a series with NO positive
    values produces no output row (empty group) where the kernel returns
    (nan, nan); left-join against the key set if those rows are needed."""
    w_all = Window.partitionBy(*keys).orderBy(*order)
    pos = df.withColumn("_rn", F.row_number().over(w_all)).where(F.col(col) > 0)
    w_pos = Window.partitionBy(*keys).orderBy("_rn")
    islands = pos.withColumn("_island", F.col("_rn") - F.row_number().over(w_pos))
    runs = islands.groupBy(*keys, "_island").agg(F.count(F.lit(1)).alias("_len"))
    return runs.groupBy(*keys).agg(
        F.avg("_len").alias("intervals_mean"),
        F.stddev_samp("_len").alias("intervals_sd"),
    )


def flat_spots_df(df: DataFrame, keys: list[str], order: list[str], col: str = "y") -> DataFrame:
    """flat_spots (longest run of equal decile-bin codes, tsfeatures.py:
    203-225) pure SQL. Bin rule matches pd.cut(x, 10, labels=False): ten
    right-closed equal-width bins over [min, max]; values at the bottom
    edge fold into bin 0 (pandas lowers only the first edge by 0.1% of the
    range). code = clamp(ceil((x - mn) * 10 / range) - 1, 0, 9); islands
    via the double-row_number trick; constant series (range 0) -> one bin."""
    c = F.col(col)
    stats = df.groupBy(*keys).agg(F.min(c).alias("_mn"), F.max(c).alias("_mx"))
    w = Window.partitionBy(*keys).orderBy(*order)
    j = df.join(F.broadcast(stats), keys).withColumn("_rn", F.row_number().over(w))
    rng = F.col("_mx") - F.col("_mn")
    code = F.when(rng == 0, F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.least(F.lit(9), (F.ceil((c - F.col("_mn")) * 10.0 / rng) - 1).cast("int")))
    )
    coded = j.withColumn("_code", code)
    w_code = Window.partitionBy(*keys, "_code").orderBy("_rn")
    islands = coded.withColumn("_island", F.col("_rn") - F.row_number().over(w_code))
    runs = islands.groupBy(*keys, "_code", "_island").agg(F.count(F.lit(1)).alias("_len"))
    return runs.groupBy(*keys).agg(F.max("_len").cast("double").alias("flat_spots"))


# Static lag-column cap; the per-series data-dependent nlags enters only
# through the Bartlett weights. nlags = floor(4*(n/100)^0.25) first exceeds
# 20 at n = 100*(21/4)^4 ~ 76k rows per series — pass a larger ``max_lag``
# to kpss_df/unitroot_pp_df beyond that, or the long-run variance silently
# truncates (choose max_lag >= 4*(n_max/100)^0.25; column count is the only
# cost). The driver's event series are ~2k-10k rows (nlags 8-12).
_KPSS_LMAX = 20


def kpss_df(df: DataFrame, keys: list[str], order: list[str], col: str = "y",
            max_lag: int = _KPSS_LMAX) -> DataFrame:
    """KPSS level-stationarity statistic (statsmodels kpss(regression='c')
    parity, reference tsfeatures.py:793-816) pure SQL: eta from the running
    cumsum of demeaned values, long-run variance via Bartlett-weighted
    autocovariances over a STATIC bank of ``max_lag`` lag columns, the
    per-series data-dependent nlags entering only through the weights.
    Exact while nlags <= max_lag, i.e. n <= 100*((max_lag+1)/4)^4 rows per
    series (~76k at the default 20) — raise max_lag beyond that."""
    c = F.col(col)
    stats = df.groupBy(*keys).agg(F.avg(c).alias("_m"), F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(*keys).orderBy(*order)
    j = df.join(F.broadcast(stats), keys).withColumn("_e", c - F.col("_m"))
    j = j.withColumn("_s", F.sum("_e").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    for k in range(1, max_lag + 1):
        j = j.withColumn(f"_el{k}", F.lag("_e", k).over(w))
    eta = F.sum(F.col("_s") * F.col("_s")) / (F.max("_n") * F.max("_n"))
    s2 = F.sum(F.col("_e") * F.col("_e")) / F.max("_n")
    nl = F.floor(4.0 * F.pow(F.max("_n") / 100.0, 0.25))
    terms = [
        F.when(
            F.lit(k) <= nl,
            (1.0 - F.lit(k) / (nl + 1.0)) * 2.0 / F.max("_n")
            * F.sum(F.col("_e") * F.coalesce(F.col(f"_el{k}"), F.lit(0.0))),
        ).otherwise(F.lit(0.0))
        for k in range(1, max_lag + 1)
    ]
    total = s2
    for t in terms:
        total = total + t
    return j.groupBy(*keys).agg(F.try_divide(eta, total).alias("unitroot_kpss"))


def unitroot_pp_df(df: DataFrame, keys: list[str], order: list[str], col: str = "y",
                   max_lag: int = _KPSS_LMAX) -> DataFrame:
    """Phillips-Perron statistic, replicating the reference's own formula
    (utils.py:164-213, including its idiosyncratic s = 1/(n*sum(res^2)))
    pure SQL in two aggregate passes: closed-form OLS of y_t on y_{t-1}
    first, then residual autocovariances over a static ``max_lag`` bank
    gated by the per-series lmax (exact while lmax <= max_lag, ~76k rows
    per series at the default 20 — raise max_lag beyond)."""
    c = F.col(col)
    w = Window.partitionBy(*keys).orderBy(*order)
    d = df.withColumn("_rn", F.row_number().over(w)).withColumn("_yl", F.lag(c).over(w))
    d = d.where(F.col("_yl").isNotNull()).select(*keys, c.alias("_y"), "_yl", "_rn")
    # pass 1: closed-form OLS y = b0 + b1*y_l1 (+ the constants reused later)
    g = d.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").alias("_sy"),
        F.sum("_yl").alias("_syl"),
        F.sum(F.col("_y") * F.col("_yl")).alias("_syyl"),
        F.sum(F.col("_yl") * F.col("_yl")).alias("_syl2"),
        F.avg("_y").alias("_my"),
    ).withColumn(
        "_b1",
        F.try_divide(
            F.col("_n") * F.col("_syyl") - F.col("_sy") * F.col("_syl"),
            F.col("_n") * F.col("_syl2") - F.col("_syl") * F.col("_syl"),
        ),
    ).withColumn("_b0", (F.col("_sy") - F.col("_b1") * F.col("_syl")) / F.col("_n"))
    # pass 2: residuals + lagged residual coproducts (static 20-lag bank)
    r = d.join(F.broadcast(g.select(*keys, "_n", "_b0", "_b1", "_my")), keys)
    r = r.withColumn("_res", F.col("_y") - F.col("_b0") - F.col("_b1") * F.col("_yl"))
    w2 = Window.partitionBy(*keys).orderBy("_rn")
    for k in range(1, max_lag + 1):
        r = r.withColumn(f"_rl{k}", F.lag("_res", k).over(w2))
    # lmax uses the ORIGINAL series length n+1 (reference computes it before
    # dropping the first row, utils.py:180)
    lmax = F.floor(4.0 * F.pow((F.max("_n") + 1) / 100.0, 0.25))
    n_ = F.max("_n")
    s = F.try_divide(F.lit(1.0), n_ * F.sum(F.col("_res") * F.col("_res")))
    myybar = F.sum((F.col("_y") - F.col("_my")) * (F.col("_y") - F.col("_my"))) / (n_ * n_)
    sig = s
    for k in range(1, max_lag + 1):
        term = F.when(
            F.lit(k) <= lmax,
            (1.0 - F.lit(k) / (lmax + 1.0)) * (2.0 / n_)
            * F.sum(F.col("_res") * F.coalesce(F.col(f"_rl{k}"), F.lit(0.0))),
        ).otherwise(F.lit(0.0))
        sig = sig + term
    lambda_ = 0.5 * (sig - s)
    stat = n_ * (F.max("_b1") - 1.0) - F.try_divide(lambda_, myybar)
    return r.groupBy(*keys).agg(stat.alias("unitroot_pp"))


def pacf_at_lag_df(df: DataFrame, keys: list[str], order: list[str],
                   lag: int, col: str = "y") -> DataFrame:
    """Partial autocorrelation AT a given (seasonal) lag — the reference's
    seas_pacf = pacf(x, nlags=max(m,5), 'ldb')[m] (tsfeatures.py:560-571) —
    FULLY SQL-native: ``lag`` lag() columns give biased autocorrelations
    r1..r_lag, then the Levinson-Durbin recursion is GENERATED as column
    arithmetic up to order ``lag`` (the recursion is scale-invariant, so
    normalized r's substitute for autocovariances). phi_{m,m} is the
    answer. O(lag^2) generated columns — ~300 at m=24, built once at plan
    time."""
    w = Window.partitionBy(*keys).orderBy(*order)
    d = df
    for k in range(1, lag + 1):
        d = d.withColumn(f"_lag{k}", F.lag(F.col(col), k).over(w))
    stats = df.groupBy(*keys).agg(F.avg(F.col(col)).alias("_m"))
    j = d.join(F.broadcast(stats), keys)
    dev = F.col(col) - F.col("_m")
    den = F.sum(dev * dev)
    aggs = [
        F.try_divide(F.sum(dev * (F.col(f"_lag{k}") - F.col("_m"))), den).alias(f"r{k}")
        for k in range(1, lag + 1)
    ]
    g = j.groupBy(*keys).agg(*aggs)
    # Levinson-Durbin: phi[k][j]; materialize each order as real columns so
    # the expression trees stay linear in size
    g = g.withColumn("p_1_1", F.col("r1")).withColumn("d_1", 1 - F.col("p_1_1") * F.col("r1"))
    for k in range(2, lag + 1):
        num = F.col(f"r{k}")
        for jj in range(1, k):
            num = num - F.col(f"p_{jj}_{k-1}") * F.col(f"r{k-jj}")
        g = g.withColumn(f"p_{k}_{k}", F.try_divide(num, F.col(f"d_{k-1}")))
        for jj in range(1, k):
            g = g.withColumn(
                f"p_{jj}_{k}",
                F.col(f"p_{jj}_{k-1}") - F.col(f"p_{k}_{k}") * F.col(f"p_{k-jj}_{k-1}"),
            )
        if k < lag:
            g = g.withColumn(f"d_{k}", F.col(f"d_{k-1}") * (1 - F.col(f"p_{k}_{k}") * F.col(f"p_{k}_{k}")))
    return g.select(*keys, F.col(f"p_{lag}_{lag}").alias("seas_pacf"))


def pacf_at_lag_sql(lag: int, table_expr: str, key: str, order: str, col: str) -> str:
    """DuckDB oracle text for ``pacf_at_lag_df`` — the SAME generated
    Levinson-Durbin recursion as chained CTEs, so both engines execute the
    identical IEEE-double formula."""
    lags = ",\n".join(
        f"lag({col}, {k}) over (partition by {key} order by {order}) as l{k}"
        for k in range(1, lag + 1)
    )
    rs = ",\n".join(
        f"sum(case when l{k} is not null then ({col}-m)*(l{k}-m) end) / sum(({col}-m)*({col}-m)) as r{k}"
        for k in range(1, lag + 1)
    )
    ctes = [
        f"base as (select t.*, s.m from ({table_expr}) t join (select {key}, avg({col}) as m from ({table_expr}) group by 1) s using ({key}))",
        f"lagged as (select {key}, {col}, m, {lags} from base)",
        f"rs as (select {key}, {rs} from lagged group by 1)",
        "s1 as (select *, r1 as p_1_1, 1 - r1*r1 as d_1 from rs)",
    ]
    prev = "s1"
    for k in range(2, lag + 1):
        num = f"r{k}" + "".join(f" - p_{jj}_{k-1}*r{k-jj}" for jj in range(1, k))
        cols = [f"({num})/d_{k-1} as p_{k}_{k}"]
        step1 = f"s{k}a as (select *, {', '.join(cols)} from {prev})"
        updates = [f"p_{jj}_{k-1} - p_{k}_{k}*p_{k-jj}_{k-1} as p_{jj}_{k}" for jj in range(1, k)]
        if k < lag:
            updates.append(f"d_{k-1}*(1 - p_{k}_{k}*p_{k}_{k}) as d_{k}")
        step2 = f"s{k} as (select *, {', '.join(updates)} from s{k}a)"
        ctes.extend([step1, step2])
        prev = f"s{k}"
    return (
        "with " + ",\n".join(ctes)
        + f"\nselect {key}, p_{lag}_{lag} as seas_pacf from {prev}"
    )
