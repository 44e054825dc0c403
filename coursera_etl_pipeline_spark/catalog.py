"""Table catalog: parquet datasets -> DataFrames + temp views.

The reference treats "a table" as a prefix-named set of objects on GCS
(transform-service/main.py:84-88); here a table is a parquet dataset
path. Loading registers temp views so both the DataFrame API and
spark.sql() address the same relations — one catalog, two surfaces.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Tables whose downstream operators are map-side compute-heavy per row
# (shingling, token hashing, per-vector cosine): fan these out when the
# scan can't parallelize on its own. Deliberately NOT the relational
# tables — their map-side work is light, and benchmarks show the extra
# round-robin exchange (plus its determinism sort) costs more than the
# parallelism buys there.
FANOUT_TABLES = frozenset({"documents", "embeddings"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def scratch_root() -> str:
    """Root for EPHEMERAL staged state (index-store scratch, landing
    zones, per-batch delta staging): `SPARK_GRAFT_SCRATCH` if set, else
    /dev/shm when writable, else the system tempdir.

    Why tmpfs by default: the lifecycle queries' staged parquet
    round-trips are the only disk-bound work in the suite, and on this
    host's virtio disk they absorb multi-second stall episodes that
    pure-compute rows never see (round-10 bench: dedup_index_update
    1.4 s -> 4.8 s across back-to-back runs with identical plans).
    Scratch on tmpfs is the local-mode analogue of pointing
    spark.local.dir at NVMe — an ops setting, not a semantics change;
    every commit into a DURABLE store location remains a Spark
    write/overwrite, which is cross-filesystem safe. On a cluster,
    deployments set SPARK_GRAFT_SCRATCH to a shared-filesystem path
    (the staging docstrings in streaming/parity.py already require
    that for multi-executor visibility)."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        base = env
    else:
        shm = "/dev/shm"
        if os.path.isdir(shm) and os.access(shm, os.W_OK):
            base = shm
        else:
            import tempfile

            base = tempfile.gettempdir()
    # ALWAYS namespace under the base — never return the base itself.
    # The stale-scratch sweep rmtree's old subdirectories of this root,
    # so an un-namespaced root (the old tempdir fallback, or a
    # user-supplied shared path) would let the sweep delete data that
    # was never ours. Namespacing confines every destructive lifecycle
    # action to dirs this project created.
    return _secure_namespace(base)


def _secure_namespace(base: str) -> str:
    """Create/adopt the scratch namespace with 0700 perms and verified
    ownership (ADVICE r10): the base (/dev/shm, /tmp) is world-
    writable, so a fixed predictable name could be pre-created by
    another user to read or tamper with staged index state, landing
    zones, and replay markers. The dir is taken ONLY if it is a real
    directory (no symlink) owned by us; otherwise fall back to a
    per-uid name, and as a last resort a private mkdtemp (safe, at
    the cost of cross-process zone reuse)."""
    import stat

    uid = os.getuid() if hasattr(os, "getuid") else None
    for name in ("spark_graft_scratch",
                 f"spark_graft_scratch_{uid}" if uid is not None else None):
        if name is None:
            continue
        d = os.path.join(base, name)
        try:
            os.mkdir(d, 0o700)
        except FileExistsError:
            pass
        except OSError:
            continue
        try:
            st = os.lstat(d)
            if not stat.S_ISDIR(st.st_mode):
                continue  # symlink or file squatting on the name
            if uid is not None and st.st_uid != uid:
                continue  # someone else's dir — never adopt it
            if st.st_mode & 0o077:
                os.chmod(d, 0o700)  # tighten a pre-round-11 dir
        except OSError:
            continue
        return d
    import tempfile

    return tempfile.mkdtemp(prefix="spark_graft_scratch_")


_SCRATCH_CREATED: list[str] = []
_SCRATCH_SWEPT = False


def _cleanup_scratch() -> None:
    import shutil

    for d in _SCRATCH_CREATED:
        shutil.rmtree(d, ignore_errors=True)


def _sweep_stale_scratch(root: str, ttl_s: int = 24 * 3600) -> None:
    """Best-effort removal of scratch left by CRASHED processes: on
    tmpfs, leaked dirs cost RAM (unlike /tmp, nothing reclaims them
    until reboot). Live processes' dirs are younger than the TTL —
    every scratch consumer here runs minutes, not hours. The TTL
    also bounds how long a failed-commit recovery copy (the staged
    states apply_index_delete/compact preserve) survives — a real
    deployment stages on a shared filesystem, not scratch."""
    import shutil
    import time

    cutoff = time.time() - ttl_s
    try:
        entries = os.listdir(root)
    except OSError:
        return
    for name in entries:
        p = os.path.join(root, name)
        if name == "spark_local":
            # session.py points spark.local.dir here; its own mtime is
            # the first JVM's start time, so sweeping the whole dir
            # would kill live sessions' shuffle files. But Spark's
            # per-JVM spark-<uuid>/blockmgr-* children are removed
            # only by its shutdown hook, which never runs on a
            # crash/kill — on tmpfs those leak RAM indefinitely, the
            # exact class this sweep exists to bound (ADVICE r10). So
            # TTL-sweep the CHILDREN: a live session's dirs track JVM
            # activity and stay fresh; >TTL-old ones are crash debris.
            try:
                for child in os.listdir(p):
                    c = os.path.join(p, child)
                    if os.path.isdir(c) and os.path.getmtime(c) < cutoff:
                        shutil.rmtree(c, ignore_errors=True)
            except OSError:
                pass
            continue
        try:
            if os.path.isdir(p) and os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue


def scratch_dir(prefix: str) -> str:
    """mkdtemp under scratch_root() — drop-in for tempfile.mkdtemp,
    plus lifecycle hygiene tmpfs needs: dirs this process creates are
    removed at interpreter exit (atexit), and the first call sweeps
    dirs older than 24h that a crashed process left behind. Dirs NOT
    created through here (raw mkdtemp under scratch_root, the staged
    late-data zone) are exempt from the atexit pass — recovery copies
    and cross-process caches must outlive the process — and fall to
    the TTL sweep instead."""
    import atexit
    import tempfile

    global _SCRATCH_SWEPT
    root = scratch_root()
    if not _SCRATCH_SWEPT:
        _SCRATCH_SWEPT = True
        _sweep_stale_scratch(root)
        atexit.register(_cleanup_scratch)
    d = tempfile.mkdtemp(prefix=prefix, dir=root)
    _SCRATCH_CREATED.append(d)
    return d


# load_table results memoized per (session, sf_dir, table, on-disk file
# fingerprint). A DataFrame is an immutable logical plan, so handing the
# same object back is safe; what the memo saves is the per-call driver
# constant — the parquet footer/schema read (~70 ms locally) and
# fan_out's one-partition probe (~25 ms) — which otherwise taxes every
# invocation of every query (bench medians included). The fingerprint
# folds each file's mtime/size in, so a driver-regenerated fixture at
# the same path misses the cache and is re-read (same invalidation
# policy as llm_ops.dedup._materialize).
_LOADED: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _path_fingerprint(path: str) -> tuple:
    """One directory level deep — the layout Spark writes for the flat
    `<table>.parquet` datasets this catalog serves. A nested/
    partitioned layout (`k=v/` subdirs) would need a recursive walk:
    a child-file rewrite does NOT bump the parent directory's mtime,
    so this fingerprint would miss it. All fixture tables are flat by
    construction; revisit if partitioned fixtures ever appear."""
    try:
        st = os.stat(path)
    except OSError:
        return (None,)
    if not os.path.isdir(path):
        return ((path, st.st_mtime_ns, st.st_size),)
    out = []
    for e in os.scandir(path):
        try:
            est = e.stat()
        except OSError:
            # entry deleted mid-scan (concurrent fixture regeneration):
            # record the name with no stats — still distinct from both
            # "absent" and any real (mtime, size), so the memo misses
            # and the table is re-read rather than load_table raising
            out.append((e.path, None, None))
            continue
        out.append((e.path, est.st_mtime_ns, est.st_size))
    return tuple(sorted(out))


# On-disk parquet bytes above which a dimension table is no longer
# force-broadcast (see gated_broadcast). 32 MiB of snappy parquet is
# ~150-250 MB as an in-memory HashedRelation — already near the
# practical per-executor broadcast ceiling, and the same constant the
# events interval join's gate validated with two decades of margin on
# each side (sf0.1 = 2 MB broadcast-wins, 10M-row replica = 156 MB
# shuffle-wins). One constant, one decision rule, everywhere a
# linearly-scaling table feeds a join-side hint.
BROADCAST_GATE_BYTES = 32 * 1024 * 1024


def dataset_nbytes(path: str) -> int | None:
    """Recursive on-disk size of a parquet dataset, or None when the
    size CANNOT be determined (absent path, permission error, or a
    non-local URI this process can't stat).

    os.walk (not a one-level scandir) so partitioned/nested layouts
    (`k=v/` subdirs) count their contents rather than their directory
    inodes (ADVICE r12). Callers MUST treat None as "assume large":
    at the 100 TB target the table lives behind an object-store URI
    precisely where local stats fail, and defaulting the unknown arm
    to broadcast is the OOM the gate exists to prevent. (On a real
    cluster this helper is where Hadoop FS content-summary / catalog
    stats plug in; the decision rule downstream is unchanged.)"""
    if "://" in path:
        return None

    def _surface(err: OSError) -> None:
        # os.walk swallows scandir errors by default (onerror=None),
        # which would return a PARTIAL total — or 0 for an unreadable
        # root — and 0 selects the broadcast arm: the exact
        # 0-means-broadcast failure this function exists to prevent.
        # Re-raise so every unreadable level lands in the except below
        # and the caller sees None = "assume large".
        raise err

    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if not os.path.isdir(path):
            return None
        total = 0
        for root, _dirs, files in os.walk(path, onerror=_surface):
            for fname in files:
                total += os.path.getsize(os.path.join(root, fname))
        return total
    except OSError:
        return None


# Domain cardinalities (NDV) of the literal-predicate columns, fixed
# by the fixture generators (TESTDATA.md) independent of sf — the
# catalog statistics a real deployment's CBO would read from table
# metadata (ANALYZE / parquet footer distinct-count stats). Cut sites
# derive their gate fraction through eq_fraction() below instead of
# hand-pinning a constant (VERDICT r13 item 6: a hand-pinned fraction
# goes stale silently when a predicate changes; a derived one is
# recomputed from the predicate's own argument count).
# tests/test_catalog.py verifies every entry against the fixture.
DOMAIN_NDV = {
    ("customer", "c_mktsegment"): 5,
    ("customer", "c_nationkey"): 25,
    ("supplier", "s_nationkey"): 25,
    ("part", "p_brand"): 25,
    ("nation", "n_nationkey"): 25,
    ("region", "r_regionkey"): 5,
}

# Nations carried by one region (uniform 25/5 layout — verified by
# test_catalog against the fixture): the membership cardinality of a
# one-region cut expressed over the nationkey FK domain.
NATIONS_PER_REGION = (DOMAIN_NDV[("nation", "n_nationkey")]
                      // DOMAIN_NDV[("region", "r_regionkey")])


def eq_fraction(table: str, column: str, n_values: int = 1) -> float:
    """Selinger-style selectivity of an equality/IN literal predicate:
    ``n_values / NDV(column)`` from the DOMAIN_NDV catalog stats —
    never measured from the data, so the estimate is sf-invariant
    under the fixtures' uniform generators, exactly like a CBO's
    NDV-based estimate. Unknown (table, column) raises KeyError by
    design: a new cut site must REGISTER its domain (one line above)
    rather than inherit a silently-wrong default."""
    return n_values / DOMAIN_NDV[(table, column)]


def gated_broadcast(df: DataFrame, sf_dir: str, table: str,
                    cutoff_bytes: int = BROADCAST_GATE_BYTES,
                    fraction: float = 1.0) -> DataFrame:
    """Stats-gated join-side hint for a LINEARLY-SCALING dimension (or
    a filtered cut of one): ``F.broadcast`` while the source table's
    on-disk parquet is provably small, ``SHUFFLE_HASH`` above the
    cutoff or when the size is unknown.

    This is the cost-based-optimizer decision made from table stats —
    the same one-file-stat pattern the events interval join validated
    (streaming/queries.py) — replacing the static ``F.broadcast``
    hints that VERDICT r12 flagged: TPC-H customer/supplier/part scale
    with sf, so at the 100 TB target an unconditional hint forces a
    multi-billion-row broadcast build and OOMs (AQE cannot override an
    explicit hint). Below the cutoff the broadcast arm keeps today's
    benchmarked plans bit-for-bit (sf0.1 dims are KB-to-sub-MB — two
    decades of margin); above it the SHUFFLE_HASH arm hashes the dim
    side after a shuffle — no sort of the fact side, build sized by
    dim selectivity x shuffle-partition count, the shape that survives
    any scale-up. The gate stats the SOURCE table, not the cut fed to
    the join: a filtered slice of a fact-scaled table still scales
    linearly, so the proxy is conservative exactly when it must be.

    ``fraction`` is the Selinger-style selectivity estimate for a
    LITERAL equality/IN predicate already applied to ``df``, derived
    from the predicate's DOMAIN CARDINALITY (one of 5 market
    segments -> 0.2, 2 of 25 nations -> 0.08, one of 25 brands ->
    0.04) — never from measuring the data, so it stays valid at any
    sf under the fixtures' uniform generators, exactly like a CBO's
    NDV-based estimate. The gate compares nbytes x fraction against
    the cutoff: a heavily-cut slice of a large table broadcasts for
    decades longer than its source (q7's 8% nation cut measured
    1.5x faster broadcast at sf100 — BASELINE §4 round-13), while
    still flipping to the shuffle arm once the SLICE itself reaches
    broadcast-hostile size (a 20% slice of a 100 TB-scale customer
    is still TB-scale). Default 1.0 = no predicate, pure table stat.

    Constant-size tables (nation=25, region=5, O(1) aggregates) keep
    their static ``F.broadcast`` — a gate on those is noise."""
    nbytes = dataset_nbytes(table_path(sf_dir, table))
    from pyspark.sql import functions as F

    if nbytes is not None and nbytes * fraction <= cutoff_bytes:
        return F.broadcast(df)
    return df.hint("SHUFFLE_HASH")


def fan_out(spark: SparkSession, df: DataFrame,
            key: tuple[str, ...] | None = None) -> DataFrame:
    """Ensure at least one scan partition per core.

    The local fixtures are single-file, single-row-group parquet — such
    a scan yields exactly one partition no matter what
    maxPartitionBytes/minPartitionNum say (parquet splits at row-group
    boundaries), so every map-side stage before the first shuffle runs
    on one core. A round-robin repartition to defaultParallelism fixes
    that for ~10 MB of local data. The trigger is deliberately ONLY the
    fully-degenerate one-partition scan: with even a handful of input
    files the scan already parallelizes adequately, and a measured 10x
    replica run showed the full-row exchange then costs far more than
    the extra parallelism buys (q1 at 10 files: 1.8s -> 7.2s with an
    unconditional fan-out). Predicate pushdown and column pruning pass
    through Repartition, so scan-level PushedFilters/ReadSchema are
    unaffected.

    ``key`` (optimization r18, guide §2.4 shared exchanges): when a
    query's every shuffle-requiring operator clusters on the same key
    (or a superset of it), a HASH repartition on that key replaces the
    round-robin — the one exchange then satisfies every downstream
    groupBy/join/window clustering requirement and the keyless
    round-robin (plus its sort-before-repartition tax, guide §2.5)
    disappears. Unlike the round-robin, this fires at ANY scan
    partition count: at real scale the downstream operators' exchanges
    on finer keys ((user, bucket), then (user)) do NOT satisfy each
    other, while one key-exchange satisfies all of them. Skew bound:
    one task per hot key value — identical to what the downstream
    window/session operator already requires, so no new exposure.
    REPARTITION_BY_COL stays AQE-coalescible (scale-adaptive partition
    count, not a local[32] constant)."""
    if key:
        from pyspark.sql import functions as F
        return df.repartition(*[F.col(c) for c in key])
    target = spark.sparkContext.defaultParallelism
    if target > 1 and df.rdd.getNumPartitions() == 1:
        return df.repartition(target)
    return df


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a fixture timestamp column to microsecond TimestampType.

    The driver's generated parquet has shipped the column three ways
    across regenerations: TIMESTAMP(NANOS) (Spark reads it as
    nanos-since-epoch bigint under the nanosAsLong legacy conf),
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark 4 reads it as
    TIMESTAMP_NTZ), and plain UTC-adjusted TIMESTAMP. All three encode
    the same UTC wall-clock instants; with the session timezone pinned
    to UTC the normalized values are bit-identical to what the DuckDB
    oracle sees reading the same file."""
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        # integer div — float division would lose precision on 1.7e18 ns;
        # backtick-quote the identifier so non-word column names parse
        return df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    if dt == "timestamp_ntz":
        # naive-UTC -> instant; exact under the pinned UTC session tz
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str,
               cluster_by: tuple[str, ...] | None = None) -> DataFrame:
    """One table: a vectorized parquet scan with pushdown/pruning free
    via Catalyst (PushedFilters/ReadSchema in .explain).

    `events.ts` is normalized to microsecond TimestampType whatever the
    generated file's physical type (see normalize_ts).

    ``cluster_by``: hash-repartition the scan on these columns instead
    of the round-robin fan-out — for queries whose every downstream
    shuffle clusters on that key (see fan_out's key note; guide §2.4).

    Session timezone is pinned to UTC here (runtime-settable) so
    timestamp formatting matches the DuckDB oracle even when the
    caller's SparkSession (e.g. the driver harness) didn't set it."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    fp = _path_fingerprint(table_path(sf_dir, name))
    key = (sf_dir, name, fp, cluster_by)
    per_session = _LOADED.setdefault(spark, {})
    cached = per_session.get(key)
    if cached is not None:
        return cached
    # evict superseded fingerprints for the same table: a driver that
    # regenerates fixtures every round would otherwise grow one pinned
    # analyzed-plan per (table, rewrite) for the session's lifetime
    for stale in [k for k in per_session if k[:2] == (sf_dir, name)
                  and k[2] != fp]:
        del per_session[stale]
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = fan_out(spark, spark.read.parquet(table_path(sf_dir, name)),
                     key=cluster_by)
        df = normalize_ts(df)
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
        if name in FANOUT_TABLES or cluster_by:
            df = fan_out(spark, df, key=cluster_by)
    per_session[key] = df
    return df


def views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the named tables as temp views (for spark.sql queries).

    Re-registration is idempotent and schema-only; queries re-register
    per call so the same session can serve multiple sf_dirs. Single
    registration path: delegates to load_tables, so per-table handling
    (events nanos->micros ts, fan-out) applies identically everywhere."""
    load_tables(spark, sf_dir, names)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load every fixture table present under sf_dir and register each
    as a temp view (idempotent; cheap — schema-only until an action).
    Explicitly-requested names must exist (a typo'd view name should
    fail here, not as a missing relation later); only the default
    load-everything sweep skips absent fixtures."""
    out: dict[str, DataFrame] = {}
    sweep = names is TABLES
    for name in names:
        if sweep and not os.path.exists(table_path(sf_dir, name)):
            continue
        # delegate so per-table handling (events nanos->micros ts,
        # fan-out) applies here too, not just to direct loads
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
