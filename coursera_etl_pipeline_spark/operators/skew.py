"""Skew-mitigated join: salting, the manual fallback when AQE's
skew-join splitting isn't available (e.g. bucketed join paths or
pre-3.0 clusters). SURVEY §4.3: skewed keys are the canonical 100 TB
join hazard.

Two forms, in order of preference at scale:

1. ``salted_join_hotkey`` (the registered plan): a cheap map-side-
   combined frequency aggregation finds the keys that actually skew,
   the hot-key set is broadcast (it is tiny by construction — a key
   is only hot if it alone holds a partition-sized share of rows),
   ONLY hot-key probe rows are salted and ONLY hot-key build rows are
   replicated; everything else takes the plain shuffle join. At
   uniform keys the salting machinery vanishes and the cost is one
   extra count-aggregate over the probe side; under planted skew the
   hot reducer's rows spread across R salts. This is the plan you'd
   run at 100 TB when AQE's skew split can't fire.

2. ``salted_join`` (utility + worst-case bound): salts the ENTIRE
   probe side and replicates the FULL build side R times,
   unconditionally. Simple, deterministic shape — but at uniform keys
   it is pure tax (measured 41x vs the plain join at sf1, see
   BASELINE.md §4), so it exists as the building block the hot-key
   form reuses and as the documented upper bound.

Both are semantically EXACT equi-joins — the registry entry is
oracle-checked against the plain SQL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.catalog import load_table
from coursera_etl_pipeline_spark.registry import dsum, query

SALT_BUCKETS = 8
# A key is hot when its row count exceeds max(floor, multiplier x the
# mean per-key count). The floor keeps tiny fixtures from flagging
# noise; the multiplier is the skew ratio at which one reducer's key
# meaningfully outweighs its peers. Both are overridable per call.
HOT_FREQ_FLOOR = 64
HOT_FREQ_MULTIPLIER = 10
# Detection runs on a Bernoulli sample of the probe side (fixed seed:
# deterministic per partition layout). A hot key by definition holds a
# partition-sized share of rows, so a 5% sample sees it thousands of
# times over; what sampling costs is borderline keys near the
# threshold, which don't need salting anyway. What it buys is the
# detection shuffle: at near-unique join keys, map-side combine cannot
# compress the frequency aggregate, so exact counting shuffles O(N)
# (key, count) rows — the single most expensive part of the old plan
# at uniform keys. Sampled detection shuffles O(f*N).
SKEW_DETECT_FRACTION = 0.05
SKEW_DETECT_SEED = 42


def salted_join(large: DataFrame, small: DataFrame, key_large: str,
                key_small: str, n_salts: int = SALT_BUCKETS,
                how: str = "inner",
                salt_cols: list[str] | None = None) -> DataFrame:
    """Inner/left equi-join with the large (skewed) side salted.

    The salt on the large side must be DETERMINISTIC per row (so task
    retries recompute the same shuffle) yet spread uniformly WITHIN a
    key — correctness never depends on which salt a row gets, only
    that it matches exactly one replica of the small side. Pass
    `salt_cols` naming a per-row identity (e.g. the natural key) to
    hash just those; default hashes the whole row, which is correct
    but moves every column through the hash."""
    salted_large = large.withColumn(
        "_salt", F.pmod(F.xxhash64(*(salt_cols or large.columns)),
                        F.lit(n_salts)).cast("int"))
    replicas = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return (salted_large.join(
        replicas,
        (salted_large[key_large] == replicas[key_small])
        & (salted_large["_salt"] == replicas["_salt"]),
        how)
        .drop("_salt"))


def hot_keys(large: DataFrame, key: str,
             hot_threshold: int | None = None,
             sample_fraction: float = 1.0) -> DataFrame:
    """One-column DataFrame of the probe-side keys whose frequency
    crosses the hot threshold — the same per-key stats pass AQE's
    runtime skew detection does. Default is EXACT counting: an
    explicit ``hot_threshold`` means exactly what it says (ADVICE r8 —
    a silently sampled comparison made the returned key set
    sample-dependent and noisy near the floor). Sampling is opt-in:
    pass ``sample_fraction < 1`` to trade exactness for a cheaper
    detection pass, and the threshold — stated in TRUE counts — is
    scaled by the fraction for the sampled comparison (a true count of
    64 at fraction 0.05 is compared as Binomial(64, 0.05), mean 3.2,
    stdev ~1.7: only use sampling when hot keys sit well above the
    threshold, as real skew does).

    When ``hot_threshold`` is None it is data-derived (mean per-key
    count x multiplier, floored) via a broadcast 1-row stats join, so
    the plan stays fully lazy — no driver-side collect. Note the
    sampled mean is taken over keys PRESENT in the sample (absent
    small keys aren't zero-padded), which biases the derived threshold
    up — strictly conservative: borderline keys stay unsalted."""
    base = large.select(key)
    if sample_fraction < 1.0:
        base = base.sample(fraction=sample_fraction, seed=SKEW_DETECT_SEED)
    freq = base.groupBy(key).agg(F.count(F.lit(1)).alias("_freq"))
    if hot_threshold is not None:
        return (freq.filter(F.col("_freq") >= hot_threshold * sample_fraction)
                .select(key))
    stats = freq.agg(F.avg("_freq").alias("_mean_freq"))
    return (freq.crossJoin(F.broadcast(stats))
            .filter(F.col("_freq") >= F.greatest(
                F.lit(HOT_FREQ_FLOOR * sample_fraction),
                F.col("_mean_freq") * HOT_FREQ_MULTIPLIER))
            .select(key))


def salted_join_hotkey(large: DataFrame, small: DataFrame, key_large: str,
                       key_small: str, n_salts: int = SALT_BUCKETS,
                       how: str = "inner",
                       salt_cols: list[str] | None = None,
                       hot_threshold: int | None = None) -> DataFrame:
    """Skew join that pays the salting tax only where skew exists.

    Phase 1: frequency-aggregate the probe side, broadcast the hot-key
    set. Phase 2: ONE broadcast left join per side annotates rows with
    hot-set membership; probe rows get ``_salt = hash % R`` when hot
    else 0, build rows explode into R replicas when hot else a single
    salt-0 row; one shuffle equi-join on (key, salt) produces the
    result. Row multiplication is R x |hot build rows| only.

    Versus the previous split-and-union plan (semi + anti join per
    side, two joins, unionByName): each input is scanned ONCE instead
    of twice, there is a single shuffle join instead of two, and at
    uniform keys the whole mechanism degenerates to the plain shuffle
    join plus the frequency aggregate and two row-local broadcast
    probes — measured within the noise of an unsalted join (the old
    shape cost ~2.7x a plain join on uniform keys at sf10 purely from
    the double scan + union). The two `hot` broadcasts have identical
    plans, so exchange reuse builds the hot-key table once.

    ``how`` supports 'inner' and 'left' (a hot probe row carries
    exactly one salt, so left-preservation is exact; right/full would
    duplicate unmatched replicated build rows R times).

    ``hot_threshold`` (a TRUE count) is evaluated against a 5% sampled
    frequency pass here — detection noise only moves borderline keys
    between the salted and unsalted plans, never changes the join's
    rows; call ``hot_keys`` directly (exact by default) when the key
    SET itself is the product."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join_hotkey supports inner/left, got {how}")
    # the call site opts into sampled detection (hot_keys defaults to
    # exact): the salting decision only needs keys far above the
    # threshold, where a 5% Bernoulli count cannot miss, and the full
    # probe-side frequency pass would otherwise rival the join itself
    hot = F.broadcast(
        hot_keys(large, key_large, hot_threshold,
                 sample_fraction=SKEW_DETECT_FRACTION)
        .withColumnRenamed(key_large, "_hot_key"))
    probe = (
        large.join(hot, large[key_large] == hot["_hot_key"], "left")
        .withColumn(
            "_salt_l",
            F.when(F.col("_hot_key").isNotNull(),
                   F.pmod(F.xxhash64(*(salt_cols or large.columns)),
                          F.lit(n_salts)).cast("int"))
            .otherwise(F.lit(0)))
        .drop("_hot_key"))
    build = (
        small.join(hot, small[key_small] == hot["_hot_key"], "left")
        .withColumn(
            "_salt_r",
            F.explode(F.sequence(
                F.lit(0),
                F.when(F.col("_hot_key").isNotNull(), F.lit(n_salts - 1))
                .otherwise(F.lit(0)))))
        .drop("_hot_key"))
    return (probe.join(
        build,
        (probe[key_large] == build[key_small])
        & (probe["_salt_l"] == build["_salt_r"]),
        how)
        .drop("_salt_l", "_salt_r"))


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n, {dsum('l_extendedprice')} AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-salted lineitem x orders — byte-identical result to the
    plain join (the oracle IS the plain join). At the fixture's uniform
    orderkeys the hot set is empty and the plan degenerates to the
    plain shuffle join plus one count-aggregate; under real skew only
    the hot keys pay the salting tax. This is the scale-safe plan; the
    uniform-salting worst case stays available as ``salted_join``."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = salted_join_hotkey(li, o, "l_orderkey", "o_orderkey",
                                salt_cols=["l_orderkey", "l_linenumber"])
    return (joined.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.expr(dsum("l_extendedprice")).alias("total")))
