"""Crash-window tests for the index-lifecycle storage verbs
(VERDICT r11 item 1): kill the verb between its commit and
`_seal_epoch`, replay the epoch the way foreachBatch's at-least-once
contract re-delivers it, and require the store to converge to the
from-scratch rebuild — exactly once, no wedge.

Two mechanisms are under test:
  - APPEND verbs (index/ANN/LSH increments, DQ gate): the
    purge+epoch-prefix move commit makes replay self-healing — no
    operator action needed at any crash point.
  - OVERWRITE verbs (delete): the preserved staging dir + _markers
    snapshot, rolled forward by `recover_index_stage`, after which
    the replayed epoch no-ops via its re-sealed marker.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from coursera_etl_pipeline_spark.llm_ops import dedup
from coursera_etl_pipeline_spark.streaming import parity


def _doc(i: int) -> str:
    return " ".join(f"d{i}t{j}" for j in range(30))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def crash_seal(monkeypatch):
    """Patch `_seal_epoch` with a one-shot bomb (crashes AFTER the
    verb's commits have all landed — the exact applied-but-unsealed
    window VERDICT r11 names). Starts DISARMED so test setup can run
    sealed epochs; set ``state["armed"] = True`` right before the
    call under test."""
    real = parity._seal_epoch
    state = {"armed": False}

    def bomb(marker):
        if state["armed"] and marker is not None:
            state["armed"] = False
            raise RuntimeError("simulated crash between commit and seal")
        real(marker)

    monkeypatch.setattr(parity, "_seal_epoch", bomb)
    return state


def _seed_docs(spark):
    return spark.createDataFrame(
        [(11, _doc(11)), (21, _doc(21)), (31, _doc(31)),   # corpus
         (10, _doc(11)), (40, _doc(40))],                  # batch
        "doc_id long, text string")


def _seed_store(spark, tmp_path, docs):
    band_dir, post_dir = str(tmp_path / "band"), str(tmp_path / "post")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    c_post, c_band = dedup.minhash_index_artifacts(corpus)
    c_post.write.parquet(post_dir)
    c_band.write.parquet(band_dir)
    return post_dir, band_dir


def test_increment_crash_between_commit_and_seal_replays_exactly_once(
        spark, tmp_path, crash_seal):
    """Crash AFTER both appends landed but BEFORE the epoch sealed:
    re-delivery must purge the unmarked debris and converge to the
    single-increment rebuild — the window that used to double-append."""
    docs = _seed_docs(spark)
    post_dir, band_dir = _seed_store(spark, tmp_path, docs)
    batch = docs.filter(F.col("doc_id") % 10 == 0)

    crash_seal["armed"] = True
    with pytest.raises(RuntimeError, match="simulated crash"):
        parity.apply_index_increment(batch, post_dir, band_dir,
                                     epoch_id=0, run_token="tok")
    # the data landed (applied) but the epoch is unmarked — the replay
    # MUST NOT trust the store's contents
    marker = parity._epoch_marker(band_dir, "inc", 0, "tok")
    assert not os.path.exists(marker)

    # foreachBatch re-delivery after restart: same epoch, same token
    parity.apply_index_increment(batch, post_dir, band_dir,
                                 epoch_id=0, run_token="tok")
    assert os.path.exists(marker)

    # survivors: 10 drops (dup of corpus 11), 40 survives
    rb_post, rb_band = dedup.minhash_index_artifacts(
        docs.filter(F.col("doc_id").isin([11, 21, 31, 40])))
    assert _rows(spark.read.parquet(band_dir)) == _rows(rb_band)
    assert _rows(spark.read.parquet(post_dir)) == _rows(rb_post)

    # and a THIRD delivery no-ops via the sealed marker (fast path)
    parity.apply_index_increment(batch, post_dir, band_dir,
                                 epoch_id=0, run_token="tok")
    assert _rows(spark.read.parquet(band_dir)) == _rows(rb_band)


def test_increment_purges_mid_commit_debris(spark, tmp_path):
    """Crash MID-commit: some of the epoch's prefixed files landed,
    the rest didn't. Replay must purge the partial files and converge
    — planted here as a foreign prefixed parquet in each dest dir."""
    docs = _seed_docs(spark)
    post_dir, band_dir = _seed_store(spark, tmp_path, docs)
    batch = docs.filter(F.col("doc_id") % 10 == 0)

    prefix = parity._epoch_prefix("inc", 0, "tok")
    junk = docs.limit(1)
    for d in (post_dir, band_dir):
        junk.write.parquet(str(tmp_path / "junk"))
        os.replace(
            next(str(p) for p in (tmp_path / "junk").iterdir()
                 if p.name.endswith(".parquet")),
            os.path.join(d, prefix + "part-junk.parquet"))
        import shutil
        shutil.rmtree(tmp_path / "junk")

    parity.apply_index_increment(batch, post_dir, band_dir,
                                 epoch_id=0, run_token="tok")
    rb_post, rb_band = dedup.minhash_index_artifacts(
        docs.filter(F.col("doc_id").isin([11, 21, 31, 40])))
    assert _rows(spark.read.parquet(band_dir)) == _rows(rb_band)
    assert _rows(spark.read.parquet(post_dir)) == _rows(rb_post)


def test_delete_crash_between_commit_and_seal_recovers_and_replays(
        spark, tmp_path, crash_seal, monkeypatch, capsys):
    """The delete wedge: crash between the overwrite-commits and the
    seal leaves the epoch applied-but-unmarked — naive re-delivery
    fails the indexed-ids contract check (ValueError; the stream
    wedge). `recover_index_stage` rolls the preserved stage forward,
    re-seals the in-flight marker, and the replay then no-ops; the
    final store hash-equals the remainder rebuild."""
    docs = spark.createDataFrame(
        [(11, _doc(11)), (21, _doc(21)), (31, _doc(31)),
         (10, _doc(11)), (40, _doc(40))],
        "doc_id long, text string")
    dirs = {n: str(tmp_path / n)
            for n in ("post", "band", "ledger", "tpost", "tband")}
    aux = (dirs["ledger"], dirs["tpost"], dirs["tband"])
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    c_post, c_band = dedup.minhash_index_artifacts(corpus)
    c_post.write.parquet(dirs["post"])
    c_band.write.parquet(dirs["band"])
    spark.createDataFrame([], "doc_id long, partner long") \
        .write.parquet(dirs["ledger"])
    c_post.limit(0).write.parquet(dirs["tpost"])
    c_band.limit(0).write.parquet(dirs["tband"])
    # increment: 10 drops (dup of 11), 40 survives
    parity.apply_index_increment(
        docs.filter(F.col("doc_id").isin([10, 40])),
        dirs["post"], dirs["band"], aux_dirs=aux,
        epoch_id=0, run_token="inc")

    stages = []
    import tempfile as _tf
    real_mkdtemp = _tf.mkdtemp

    def spy(*a, **kw):
        d = real_mkdtemp(*a, **kw)
        if kw.get("prefix", "").startswith("idx_del_") \
                or (a and str(a[0]).startswith("idx_del_")):
            stages.append(d)
        return d

    monkeypatch.setattr(_tf, "mkdtemp", spy)

    removed = spark.createDataFrame([(11,)], "doc_id long")
    crash_seal["armed"] = True
    with pytest.raises(RuntimeError, match="simulated crash"):
        parity.apply_index_delete(
            spark, removed, dirs["post"], dirs["band"], *aux,
            epoch_id=1, run_token="del")
    assert len(stages) == 1 and os.path.isdir(stages[0]), \
        "failed delete must preserve its staging dir for recovery"
    capsys.readouterr()  # swallow the advertised stage path

    # the wedge, demonstrated: naive re-delivery raises (11 is gone)
    with pytest.raises(ValueError, match="not in the stored band index"):
        parity.apply_index_delete(
            spark, removed, dirs["post"], dirs["band"], *aux,
            epoch_id=1, run_token="del")

    # roll forward from the stage (idempotent: run it twice)
    dests = {"post": dirs["post"], "band": dirs["band"],
             "ledger": dirs["ledger"], "tpost": dirs["tpost"],
             "tband": dirs["tband"]}
    parity.recover_index_stage(spark, stages[0], dests)
    parity.recover_index_stage(spark, stages[0], dests)

    # markers recovered: the increment's prior epoch AND the crashed
    # delete's in-flight epoch are both sealed again
    assert os.path.exists(
        parity._epoch_marker(dirs["band"], "inc", 0, "inc"))
    assert os.path.exists(
        parity._epoch_marker(dirs["band"], "del", 1, "del"))

    # replay now no-ops instead of wedging
    parity.apply_index_delete(
        spark, removed, dirs["post"], dirs["band"], *aux,
        epoch_id=1, run_token="del")

    # final state: 11 gone, 10 resurrected (sole justification removed)
    rb_post, rb_band = dedup.minhash_index_artifacts(
        docs.filter(F.col("doc_id").isin([21, 31, 40, 10])))
    assert _rows(spark.read.parquet(dirs["band"])) == _rows(rb_band)
    assert _rows(spark.read.parquet(dirs["post"])) == _rows(rb_post)


def test_lsh_increment_crash_replay_exactly_once(spark, tmp_path,
                                                 crash_seal):
    """Same window, LSH band-index append: crash after commit, replay,
    no doubled band rows."""
    from coursera_etl_pipeline_spark.llm_ops.similarity import (
        flatten_band_index,
        signatures,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(64)])
         for i in range(20)],
        "vec_id long, embedding array<float>")
    index_dir = str(tmp_path / "index")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    flatten_band_index(signatures(corpus)).write.parquet(index_dir)
    batch = emb.filter(F.col("vec_id") % 10 == 0)

    crash_seal["armed"] = True
    with pytest.raises(RuntimeError, match="simulated crash"):
        parity.apply_lsh_index_increment(batch, index_dir,
                                         epoch_id=0, run_token="tok")
    parity.apply_lsh_index_increment(batch, index_dir,
                                     epoch_id=0, run_token="tok")
    rebuild = flatten_band_index(signatures(emb))
    assert _rows(spark.read.parquet(index_dir)) == _rows(rebuild)


def test_dq_gate_crash_replay_delivers_batch_once(spark, tmp_path,
                                                  crash_seal):
    """DQ-gate append: crash after the batch landed in accept/, replay
    re-routes it — rows must appear exactly once."""
    docs = spark.createDataFrame(
        [(i, _doc(i), "en", "s", len(_doc(i))) for i in range(8)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    accept_dir = str(tmp_path / "accept")
    reject_dir = str(tmp_path / "reject")
    os.makedirs(accept_dir)
    os.makedirs(reject_dir)

    crash_seal["armed"] = True
    with pytest.raises(RuntimeError, match="simulated crash"):
        parity.apply_dq_gate(docs, accept_dir, reject_dir,
                             epoch_id=0, run_token="tok")
    parity.apply_dq_gate(docs, accept_dir, reject_dir,
                         epoch_id=0, run_token="tok")
    assert _rows(spark.read.parquet(accept_dir)) == _rows(docs)
    assert not [f for f in os.listdir(reject_dir)
                if f.endswith(".parquet")]


def test_recover_rejects_colliding_destination_basenames(spark, tmp_path):
    """ADVICE r12: the _markers snapshot is keyed by destination
    BASENAME, so two dests sharing one (store/band vs tomb/band) would
    silently merge their marker re-seals and let a replayed epoch
    double-apply post-recovery. The contract is now explicit: recovery
    refuses the layout instead of corrupting it."""
    stage = tmp_path / "stage"
    for sub in ("a", "b"):
        spark.createDataFrame([(1,)], "x long").write.parquet(
            str(stage / sub))
    dests = {"a": str(tmp_path / "store" / "band"),
             "b": str(tmp_path / "tomb" / "band")}
    with pytest.raises(ValueError, match="basenames must be unique"):
        parity.recover_index_stage(spark, str(stage), dests)


def test_move_commit_sweeps_tmp_debris_on_crash(tmp_path, monkeypatch):
    """ADVICE r12: the cross-device fallback could die between copy2
    and the final rename; epoch callers purge that debris on replay,
    but epoch-less batch callers never revisit their unique prefix —
    the finally-sweep must leave zero ._tmp_ files behind."""
    import shutil

    stage = tmp_path / "stage"
    dest = tmp_path / "dest"
    stage.mkdir()
    dest.mkdir()
    (stage / "part-0.parquet").write_bytes(b"a" * 10)
    (stage / "part-1.parquet").write_bytes(b"b" * 10)

    real_replace = os.replace
    real_copy2 = shutil.copy2
    calls = {"n": 0}

    def failing_replace(src, dst):
        # force every direct move onto the cross-device fallback; the
        # fallback's own rename (tmp -> final) is allowed through
        if "._tmp_" in os.path.basename(src):
            return real_replace(src, dst)
        raise OSError(18, "Invalid cross-device link")

    def crashing_copy2(src, dst):
        calls["n"] += 1
        real_copy2(src, dst)
        if calls["n"] == 2:  # second file: die with its tmp in place
            raise RuntimeError("simulated crash mid-copy")

    monkeypatch.setattr(os, "replace", failing_replace)
    monkeypatch.setattr(shutil, "copy2", crashing_copy2)
    with pytest.raises(RuntimeError, match="simulated crash"):
        parity._move_commit(str(stage), str(dest), "callXYZ_")
    monkeypatch.undo()

    names = sorted(os.listdir(dest))
    assert not any(n.startswith("._tmp_") for n in names), names
    # the first file's commit survived; the torn second never appeared
    assert names == ["callXYZ_part-0.parquet"]
