"""catalog._path_fingerprint edge behavior (ADVICE r7: a file deleted
between scandir listing and stat must not raise out of load_table, and
the flat-layout assumption is explicit)."""

from __future__ import annotations

import os

from coursera_etl_pipeline_spark.catalog import _path_fingerprint


def test_fingerprint_absent_path_is_sentinel():
    assert _path_fingerprint("/definitely/not/here.parquet") == (None,)


def test_fingerprint_flat_file(tmp_path):
    p = tmp_path / "f.parquet"
    p.write_bytes(b"xyz")
    fp = _path_fingerprint(str(p))
    assert len(fp) == 1 and fp[0][0] == str(p) and fp[0][2] == 3


def test_fingerprint_dataset_dir_lists_children(tmp_path):
    d = tmp_path / "t.parquet"
    d.mkdir()
    (d / "part-0").write_bytes(b"abc")
    (d / "part-1").write_bytes(b"defg")
    fp = _path_fingerprint(str(d))
    sizes = {os.path.basename(p): size for p, _mt, size in fp}
    assert sizes == {"part-0": 3, "part-1": 4}


def test_fingerprint_tolerates_midscan_deletion(tmp_path, monkeypatch):
    """An entry whose stat() raises (deleted between listing and stat,
    e.g. concurrent fixture regeneration) is recorded with null stats —
    distinct from both 'absent' and any real (mtime, size), so the
    load_table memo misses and re-reads instead of raising."""
    d = tmp_path / "t.parquet"
    d.mkdir()
    (d / "part-0").write_bytes(b"abc")

    real_scandir = os.scandir

    class GhostEntry:
        path = str(d / "ghost-part")

        def stat(self):
            raise FileNotFoundError(self.path)

    def racing_scandir(p):
        return iter(list(real_scandir(p)) + [GhostEntry()])

    monkeypatch.setattr(os, "scandir", racing_scandir)
    fp = _path_fingerprint(str(d))
    assert (str(d / "ghost-part"), None, None) in fp
    assert any(p.endswith("part-0") and size == 3 for p, _mt, size in fp)


def test_package_lazy_api_resolves_every_name():
    """Every name in the package's __all__ must lazily resolve to a
    callable — a new public operator landing without its homes entry
    (or a home moving) fails here, not at a user's first import."""
    import coursera_etl_pipeline_spark as pkg

    for name in pkg.__all__:
        assert callable(getattr(pkg, name)), name


def test_dataset_nbytes_recurses_partitioned_layout(tmp_path):
    """ADVICE r12: a partitioned/nested dataset must count file CONTENTS,
    not immediate-entry inode sizes — a one-level scandir under-counts
    and would flip the broadcast gate to the OOM arm at exactly the
    layouts a large table ships in."""
    from coursera_etl_pipeline_spark.catalog import dataset_nbytes

    d = tmp_path / "t.parquet"
    (d / "k=1").mkdir(parents=True)
    (d / "k=2" / "j=x").mkdir(parents=True)
    (d / "k=1" / "part-0.parquet").write_bytes(b"a" * 1000)
    (d / "k=2" / "j=x" / "part-1.parquet").write_bytes(b"b" * 2345)
    (d / "_SUCCESS").write_bytes(b"")
    assert dataset_nbytes(str(d)) == 3345


def test_dataset_nbytes_flat_file_and_dir(tmp_path):
    from coursera_etl_pipeline_spark.catalog import dataset_nbytes

    f = tmp_path / "flat.parquet"
    f.write_bytes(b"x" * 512)
    assert dataset_nbytes(str(f)) == 512
    d = tmp_path / "ds.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"y" * 100)
    (d / "part-1.parquet").write_bytes(b"z" * 150)
    assert dataset_nbytes(str(d)) == 250


def test_dataset_nbytes_unknown_is_none_never_zero(tmp_path):
    """The gate treats None as 'assume large' -> shuffle arm; returning
    0 for an unstatable path would select the broadcast arm for every
    object-store table — the exact failure ADVICE r12 flagged."""
    from coursera_etl_pipeline_spark.catalog import dataset_nbytes

    assert dataset_nbytes(str(tmp_path / "absent.parquet")) is None
    assert dataset_nbytes("s3a://bucket/warehouse/customer.parquet") is None
    assert dataset_nbytes("hdfs://nn:8020/t.parquet") is None


def test_dataset_nbytes_scandir_failure_is_none_not_partial(tmp_path, monkeypatch):
    """os.walk swallows scandir errors by default, which would turn an
    unreadable level into a PARTIAL total (or 0 for the root) — and 0
    selects the broadcast arm. The onerror hook must surface the
    OSError so the result is None = assume large. (Simulated via
    monkeypatch: the suite runs as root, where chmod 000 still
    reads.)"""
    import os as _os

    from coursera_etl_pipeline_spark.catalog import dataset_nbytes

    d = tmp_path / "t.parquet"
    sub = d / "k=1"
    sub.mkdir(parents=True)
    (d / "part-0.parquet").write_bytes(b"a" * 100)
    (sub / "part-1.parquet").write_bytes(b"b" * 200)
    assert dataset_nbytes(str(d)) == 300

    real_scandir = _os.scandir

    def deny_subdir(path=".", *a, **kw):
        if _os.fspath(path) == str(sub):
            raise PermissionError(13, "Permission denied", str(sub))
        return real_scandir(path, *a, **kw)

    monkeypatch.setattr(_os, "scandir", deny_subdir)
    assert dataset_nbytes(str(d)) is None, \
        "an unreadable subdir must yield None, never a partial count"


def test_domain_ndv_matches_fixture():
    """Every DOMAIN_NDV catalog-stat entry must equal the actual
    distinct count in the fixture (sf0.01 — NDV is generator-fixed,
    sf-invariant), and the nations-per-region layout must be uniform:
    the eq_fraction estimates are only as good as these stats."""
    import duckdb

    from coursera_etl_pipeline_spark.catalog import (
        DOMAIN_NDV,
        NATIONS_PER_REGION,
    )

    con = duckdb.connect()
    d = "/root/testdata/sf0.01"
    for (table, column), ndv in DOMAIN_NDV.items():
        got = con.sql(
            f"SELECT count(DISTINCT {column}) "
            f"FROM '{d}/{table}.parquet'").fetchone()[0]
        assert got == ndv, (table, column, got, ndv)
    per_region = con.sql(
        f"SELECT count(*) FROM '{d}/nation.parquet' "
        f"GROUP BY n_regionkey").fetchall()
    assert {r[0] for r in per_region} == {NATIONS_PER_REGION}


def test_eq_fraction_derives_every_gate_site_value():
    """VERDICT r13 item 6 done-criteria: each existing cut site's
    derived fraction equals the hand-pinned constant it replaced, so
    arm selection is provably identical at every scale (no forced
    re-certification needed). Unknown domains refuse loudly instead
    of defaulting — a new cut site must register its NDV."""
    import pytest

    from coursera_etl_pipeline_spark.catalog import (
        NATIONS_PER_REGION,
        eq_fraction,
    )

    # q3: BUILDING = 1 of 5 market segments
    assert eq_fraction("customer", "c_mktsegment") == 0.2
    # q5: one region's nations over the 25-nation FK domain
    assert eq_fraction("customer", "c_nationkey", NATIONS_PER_REGION) == 0.2
    # q7: 2 named nations of 25, both sides
    assert eq_fraction("supplier", "s_nationkey", 2) == 0.08
    assert eq_fraction("customer", "c_nationkey", 2) == 0.08
    # q17: 1 of 25 brands
    assert eq_fraction("part", "p_brand") == 0.04
    with pytest.raises(KeyError):
        eq_fraction("orders", "o_orderstatus")
