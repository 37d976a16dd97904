"""Interop with the reference engine's JSON snapshot format.

The reference persists {dim, nextId, vectors:[{id, metadata, vec}]} as one
pretty-printed JSON file (vectordb.cpp:158-218). A migrating user must be
able to (a) load that exact file into this engine and (b) export a file the
reference's load() accepts. Both directions are asserted here, including
the load() error contract for corrupted files (vectordb.cpp:191-214).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from custom_vector_database_spark.sources.reference_snapshot import (
    read_snapshot,
    snapshot_meta,
    write_snapshot,
)

REF_STYLE_SNAPSHOT = {
    "dim": 3,
    "nextId": 5,
    "vectors": [
        {"id": 1, "metadata": {"name": "a", "tag": 7}, "vec": [1.0, 2.0, 3.0]},
        {"id": 2, "metadata": {}, "vec": [0.5, 0.25, 0.125]},
        {"id": 4, "metadata": {"name": "d"}, "vec": [-1.5, 0.0, 9.75]},
    ],
}


@pytest.fixture()
def snap_path(tmp_path):
    p = str(tmp_path / "vectordb.json")
    with open(p, "w") as f:
        json.dump(REF_STYLE_SNAPSHOT, f, indent=2)  # reference uses dump(2)
    return p


def test_read_reference_snapshot(spark, snap_path):
    df = read_snapshot(spark, snap_path)
    rows = {r.id: r for r in df.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1].vec == [1.0, 2.0, 3.0]
    assert rows[2].vec == [0.5, 0.25, 0.125]
    # metadata arrives as the raw JSON document of the reference's object
    assert json.loads(rows[1].metadata) == {"name": "a", "tag": 7}
    assert json.loads(rows[2].metadata) == {}
    assert snapshot_meta(snap_path) == (3, 5)


def test_write_snapshot_is_reference_loadable(spark, snap_path, tmp_path):
    df = read_snapshot(spark, snap_path)
    out = str(tmp_path / "exported.json")
    write_snapshot(df, out, dim=3, next_id=5)
    with open(out) as f:
        doc = json.load(f)
    # exactly the fields the reference's load() requires (vectordb.cpp:199-208)
    assert doc["dim"] == 3 and doc["nextId"] == 5
    by_id = {v["id"]: v for v in doc["vectors"]}
    assert set(by_id) == {1, 2, 4}
    assert by_id[4]["vec"] == [-1.5, 0.0, 9.75]
    # metadata round-trips as an OBJECT, not a quoted string
    assert by_id[1]["metadata"] == {"name": "a", "tag": 7}


def test_write_snapshot_defaults_next_id_to_max_plus_one(spark, snap_path, tmp_path):
    df = read_snapshot(spark, snap_path)
    out = str(tmp_path / "exported.json")
    write_snapshot(df, out, dim=3)  # no next_id
    with open(out) as f:
        assert json.load(f)["nextId"] == 5  # max id 4 + 1 (vectordb.cpp:43)


def test_full_roundtrip_preserves_floats_exactly(spark, tmp_path):
    # float32 values with no short decimal representation
    src = spark.createDataFrame(
        [(1, [0.1, 1.0 / 3.0, 2.0**-30], '{"k": 1}')],
        "id LONG, vec ARRAY<FLOAT>, metadata STRING",
    )
    p = str(tmp_path / "rt.json")
    write_snapshot(src, p, dim=3)
    back = read_snapshot(spark, p)
    assert back.collect()[0].vec == src.collect()[0].vec  # bit-exact float32


def test_corrupted_snapshot_missing_fields_raises(spark, tmp_path):
    p = str(tmp_path / "bad.json")
    with open(p, "w") as f:
        json.dump({"vectors": []}, f)  # no dim/nextId → reference throws
    with pytest.raises(ValueError, match="corrupted"):
        read_snapshot(spark, p)


def test_entry_missing_vec_or_id_raises(spark, tmp_path):
    """Entries without id or vec must ERROR like the reference's load()
    (vectordb.cpp:212-214) — silently importing/dropping a migrating
    user's rows is data loss."""
    for bad_entry in (
        {"id": 2, "metadata": {}},          # no vec
        {"metadata": {}, "vec": [1.0, 2.0]},  # no id
    ):
        p = str(tmp_path / "bad_entry.json")
        with open(p, "w") as f:
            json.dump(
                {"dim": 2, "nextId": 3,
                 "vectors": [{"id": 1, "metadata": {}, "vec": [0.0, 0.0]},
                             bad_entry]},
                f,
            )
        with pytest.raises(ValueError, match="corrupted"):
            read_snapshot(spark, p)


def test_snapshot_missing_vectors_field_raises(spark, tmp_path):
    p = str(tmp_path / "no_vectors.json")
    with open(p, "w") as f:
        json.dump({"dim": 2, "nextId": 1}, f)
    with pytest.raises(ValueError, match="vectors"):
        read_snapshot(spark, p)


def test_import_snapshot_rejects_stale_next_id(spark, tmp_path):
    """nextId must exceed every live id (vectordb.cpp:43) — otherwise a
    subsequent add() would reissue a live id."""
    from custom_vector_database_spark.vector_table import VectorTable

    p = str(tmp_path / "stale.json")
    with open(p, "w") as f:
        json.dump(
            {"dim": 2, "nextId": 1,
             "vectors": [{"id": 1, "metadata": {}, "vec": [1.0, 2.0]}]},
            f,
        )
    with pytest.raises(ValueError, match="nextId"):
        VectorTable(spark, str(tmp_path / "db")).import_snapshot(p)


def test_import_snapshot_rejects_wrong_dim_rows(spark, tmp_path):
    from custom_vector_database_spark.vector_table import VectorTable

    p = str(tmp_path / "wrongdim.json")
    with open(p, "w") as f:
        json.dump(
            {"dim": 3, "nextId": 2,
             "vectors": [{"id": 1, "metadata": {}, "vec": [1.0, 2.0]}]},
            f,
        )
    with pytest.raises(Exception, match="dim"):
        VectorTable(spark, str(tmp_path / "db")).import_snapshot(p)


def test_missing_file_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "absent.json"))


def test_empty_vectors_snapshot_reads_as_empty_df(spark, tmp_path):
    p = str(tmp_path / "empty.json")
    with open(p, "w") as f:
        json.dump({"dim": 4, "nextId": 1, "vectors": []}, f)
    df = read_snapshot(spark, p)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["id", "vec", "metadata"]


def test_vector_table_import_export_roundtrip(spark, snap_path, tmp_path):
    """Migration path end-to-end: reference file → VectorTable (ids and
    nextId preserved, engine ops work on it) → back out to a
    reference-loadable file."""
    from custom_vector_database_spark.vector_table import VectorTable

    t = VectorTable(spark, str(tmp_path / "db")).import_snapshot(snap_path)
    assert t.dim() == 3
    assert t.meta.next_id == 5  # reference counter preserved
    row, found = t.get(4)
    assert found and row.vec == [-1.5, 0.0, 9.75]
    # adds continue the reference id sequence
    assert t.add([([1.0, 1.0, 1.0], None)]) == [5]
    # search works over imported vectors
    top = t.search([1.0, 2.0, 3.0], k=1).collect()
    assert top[0].id == 1
    out = str(tmp_path / "back.json")
    t.export_snapshot(out)
    with open(out) as f:
        doc = json.load(f)
    assert doc["dim"] == 3 and doc["nextId"] == 6
    by_id = {v["id"]: v for v in doc["vectors"]}
    assert set(by_id) == {1, 2, 4, 5}
    # metadata object survives the full import→table→export cycle
    assert by_id[1]["metadata"] == {"name": "a", "tag": 7}


def test_import_snapshot_refuses_existing_table(spark, snap_path, tmp_path):
    from custom_vector_database_spark.vector_table import VectorTable

    VectorTable(spark, str(tmp_path / "db")).init(dim=3)
    with pytest.raises(FileExistsError):
        VectorTable(spark, str(tmp_path / "db")).import_snapshot(snap_path)


def test_plain_string_metadata_survives(spark, tmp_path):
    # VectorTable stores metadata as an opaque string; a non-JSON string
    # must export as a JSON string, not crash
    src = spark.createDataFrame(
        [(1, [1.0, 2.0], "not json")], "id LONG, vec ARRAY<FLOAT>, metadata STRING"
    )
    p = str(tmp_path / "s.json")
    write_snapshot(src, p, dim=2)
    with open(p) as f:
        assert json.load(f)["vectors"][0]["metadata"] == "not json"


def test_sharded_snapshot_export(spark, tmp_path):
    """shards=N writes N complete reference-loadable snapshot documents
    that partition the id space, every part carrying the global nextId —
    executor-side IO, no driver-serial step."""
    from custom_vector_database_spark.sources.reference_snapshot import (
        write_snapshot_sharded,
    )
    from custom_vector_database_spark.vector_table import VectorTable

    t = VectorTable(spark, str(tmp_path / "db")).init(dim=2)
    t.add([([float(i), float(i + 1)], json.dumps({"n": i})) for i in range(20)])

    out = str(tmp_path / "snap.json")
    parts = t.export_snapshot(out, shards=3)
    assert parts == [f"{out}.part-{i:04d}" for i in range(3)]

    seen_ids: set[int] = set()
    for p in parts:
        with open(p) as f:
            doc = json.load(f)  # each part parses standalone
        assert doc["dim"] == 2
        assert doc["nextId"] == 21  # global counter in EVERY part
        ids = {v["id"] for v in doc["vectors"]}
        assert not (ids & seen_ids)  # parts partition the id space
        seen_ids |= ids
        # each part is loadable by this engine's reference reader too
        back = read_snapshot(spark, p)
        assert back.count() == len(ids)
    assert seen_ids == set(range(1, 21))

    # a part round-trips through import_snapshot (reference load semantics)
    t2 = VectorTable(spark, str(tmp_path / "db2")).import_snapshot(parts[0])
    assert t2.dim() == 2 and t2.meta.next_id == 21

    # default single-file behavior unchanged
    assert t.export_snapshot(str(tmp_path / "single.json")) is None
    with open(tmp_path / "single.json") as f:
        assert {v["id"] for v in json.load(f)["vectors"]} == set(range(1, 21))

    # an empty table still writes valid empty parts
    t3 = VectorTable(spark, str(tmp_path / "db3")).init(dim=2)
    parts3 = t3.export_snapshot(str(tmp_path / "empty.json"), shards=2)
    for p in parts3:
        with open(p) as f:
            doc = json.load(f)
        assert doc["vectors"] == [] and doc["nextId"] == 1

    with pytest.raises(ValueError, match="shards"):
        write_snapshot_sharded(t.df(), out, dim=2, shards=0)


REF_ARTIFACT = "/root/reference/my_db.json"


@pytest.mark.skipif(
    not os.path.exists(REF_ARTIFACT), reason="reference artifact not present"
)
def test_reference_committed_artifact_my_db_json(spark, tmp_path):
    """Interop against the reference's own committed sample database
    (my_db.json:1-46 — 4 two-dimensional points, nextId 5): ids and
    float32 vectors preserved bit-exactly, the id counter continues the
    reference sequence, and search mirrors the reference's own assertions
    (test.cpp:91-104: query (1,1) → id 1; query (5,5) region → id 3/4
    cluster)."""
    from custom_vector_database_spark.vector_table import VectorTable

    with open(REF_ARTIFACT) as f:
        doc = json.load(f)

    t = VectorTable(spark, str(tmp_path / "db")).import_snapshot(REF_ARTIFACT)
    assert t.dim() == doc["dim"] == 2
    assert t.meta.next_id == doc["nextId"] == 5

    rows = {r.id: r for r in t.df().collect()}
    assert set(rows) == {1, 2, 3, 4}
    for v in doc["vectors"]:
        # float32 round-trip must be bit-exact (the artifact carries full
        # float32-precision decimals like 1.100000023841858)
        assert rows[v["id"]].vec == pytest.approx(v["vec"], abs=0.0)
        assert json.loads(rows[v["id"]].metadata) == v["metadata"]

    # reference search contract on the artifact (test.cpp:95-103 style)
    t.rebuild()
    top = t.search([1.0, 1.0], k=1).collect()
    assert top[0].id == 1 and top[0].dist_sq == 0.0
    near5 = [r.id for r in t.search([5.0, 5.0], k=2).collect()]
    assert set(near5) == {3, 4}

    # adds continue the reference's id sequence (nextId honored)
    assert t.add([([9.0, 9.0], None)]) == [5]

    # export → the file the reference's load() would accept, values intact
    out = str(tmp_path / "back.json")
    t.export_snapshot(out)
    with open(out) as f:
        back = json.load(f)
    assert back["dim"] == 2 and back["nextId"] == 6
    by_id = {v["id"]: v for v in back["vectors"]}
    for v in doc["vectors"]:
        assert by_id[v["id"]]["vec"] == pytest.approx(v["vec"], abs=0.0)
        assert by_id[v["id"]]["metadata"] == v["metadata"]


def test_vectordb_datasource_error_contract(spark, tmp_path):
    """The DataSource raises on corrupted snapshots like read_snapshot does
    (reference load() contract, vectordb.cpp:191-214)."""
    import json

    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from custom_vector_database_spark.sources import vectordb_datasource as vds

    vds.register(spark)

    ok = tmp_path / "ok.json"
    ok.write_text(json.dumps({
        "dim": 2, "nextId": 3,
        "vectors": [{"id": 1, "vec": [1.0, 2.0], "metadata": {"a": 1}},
                    {"id": 2, "vec": [0.5, 0.5], "metadata": None}],
    }))
    rows = {r["id"]: r for r in
            spark.read.format("vectordbjson").load(str(ok)).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["metadata"] == '{"a":1}' and rows[2]["metadata"] is None
    assert [round(x, 3) for x in rows[1]["vec"]] == [1.0, 2.0]

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"nextId": 3, "vectors": []}))  # missing dim
    with _pytest.raises(Exception) as exc:
        spark.read.format("vectordbjson").load(str(bad)).collect()
    assert "corrupted" in str(exc.value)

    bad2 = tmp_path / "bad2.json"
    bad2.write_text(json.dumps({"dim": 2, "nextId": 3,
                                "vectors": [{"vec": [1.0, 2.0]}]}))  # no id
    with _pytest.raises(Exception) as exc2:
        spark.read.format("vectordbjson").load(str(bad2)).collect()
    assert "corrupted" in str(exc2.value)


def test_vectordb_datasource_writer_roundtrip(spark, tmp_path):
    """df.write.format('vectordbjson') produces one reference-loadable
    part per partition via two-phase commit: global nextId stamped at
    commit, stale parts from a previous write removed, nothing visible
    from an uncommitted write."""
    from custom_vector_database_spark.sources import vectordb_datasource as vds

    vds.register(spark)
    out = str(tmp_path / "w.json")

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], json.dumps({"n": i})) for i in range(1, 9)],
        "id LONG, vec ARRAY<FLOAT>, metadata STRING",
    ).repartition(3)
    df.write.format("vectordbjson").mode("overwrite").option("dim", 2).save(out)

    parts = sorted(p.name for p in tmp_path.iterdir() if ".part-" in p.name)
    assert len(parts) == 3 and not [p for p in parts if p.endswith(".tmp")]
    seen = set()
    for p in parts:
        with open(tmp_path / p) as f:
            doc = json.load(f)  # every part parses standalone
        assert doc["dim"] == 2
        assert doc["nextId"] == 9  # global max(id)+1 in EVERY part
        seen |= {v["id"] for v in doc["vectors"]}
    assert seen == set(range(1, 9))

    # read side: the same format round-trips through the connector
    back = spark.read.format("vectordbjson").load(out + ".part-*")
    assert {r["id"] for r in back.collect()} == set(range(1, 9))
    assert json.loads(back.filter("id = 3").first()["metadata"]) == {"n": 3}

    # overwrite clears stale parts (3 parts -> 2)
    df2 = spark.createDataFrame(
        [(1, [0.0, 0.0], None)], "id LONG, vec ARRAY<FLOAT>, metadata STRING"
    ).repartition(2)
    df2.write.format("vectordbjson").mode("overwrite").option("dim", 2).option(
        "nextId", 100
    ).save(out)
    parts2 = sorted(p.name for p in tmp_path.iterdir() if ".part-" in p.name)
    assert len(parts2) == 2
    with open(tmp_path / parts2[0]) as f:
        assert json.load(f)["nextId"] == 100  # explicit option wins

    # contract errors: append mode and missing dim
    with pytest.raises(Exception, match="overwrite"):
        df2.write.format("vectordbjson").mode("append").option("dim", 2).save(out)
    with pytest.raises(Exception, match="dim"):
        df2.write.format("vectordbjson").mode("overwrite").save(out)


def test_vectordb_datasource_writer_hadoop_fs_path(spark, tmp_path):
    """A file:-URI target routes the ENTIRE two-phase commit through
    pyarrow.fs (the HDFS/S3-portable branch): tmps via the URI writer,
    footer append, move-with-overwrite promotion, glob cleanup of stale
    parts and loser tmps — the exact code path a cluster deployment
    would hit, exercised here on the local filesystem."""
    from custom_vector_database_spark.sources import vectordb_datasource as vds

    assert vds._has_scheme("file:/x") and vds._has_scheme("hdfs://nn/x")
    assert vds._has_scheme("s3a://b/k") and not vds._has_scheme("/plain/path")

    vds.register(spark)
    out_local = str(tmp_path / "h.json")
    out_uri = "file:" + out_local

    df = spark.createDataFrame(
        [(i, [float(i), 2.0], json.dumps({"n": i})) for i in range(1, 7)],
        "id LONG, vec ARRAY<FLOAT>, metadata STRING",
    ).repartition(3)
    df.write.format("vectordbjson").mode("overwrite").option("dim", 2).save(out_uri)

    parts = sorted(p.name for p in tmp_path.iterdir() if ".part-" in p.name)
    assert len(parts) == 3 and not [p for p in parts if p.endswith(".tmp")]
    seen = set()
    for p in parts:
        with open(tmp_path / p) as f:
            doc = json.load(f)  # every part parses standalone
        assert doc["dim"] == 2 and doc["nextId"] == 7
        seen |= {v["id"] for v in doc["vectors"]}
    assert seen == set(range(1, 7))
    # no Hadoop .crc droppings left beside the committed parts
    assert not [p.name for p in tmp_path.iterdir() if p.name.endswith(".tmp")]

    # the reader accepts the file:-URI spelling too
    back = spark.read.format("vectordbjson").load(out_uri + ".part-*")
    assert {r["id"] for r in back.collect()} == set(range(1, 7))

    # overwrite through the Hadoop branch clears stale parts (3 -> 1)
    spark.createDataFrame(
        [(1, [0.0, 0.0], None)], "id LONG, vec ARRAY<FLOAT>, metadata STRING"
    ).coalesce(1).write.format("vectordbjson").mode("overwrite").option(
        "dim", 2
    ).save(out_uri)
    parts2 = [p.name for p in tmp_path.iterdir() if ".part-" in p.name]
    assert len(parts2) == 1


def test_vectordb_datasource_reads_sharded_export_in_parallel(spark, tmp_path):
    """Glob/dir paths expand to one partition per part file — a sharded
    export parses with N parallel tasks and yields the full id space."""
    from custom_vector_database_spark.sources import vectordb_datasource as vds
    from custom_vector_database_spark.sources.reference_snapshot import (
        write_snapshot_sharded,
    )
    from custom_vector_database_spark.vector_table import VectorTable

    vds.register(spark)
    t = VectorTable(spark, str(tmp_path / "db")).init(dim=2)
    t.add([([float(i), 0.0], None) for i in range(12)])
    out = str(tmp_path / "snap.json")
    write_snapshot_sharded(t.df(), out, dim=2, shards=3)

    df = spark.read.format("vectordbjson").load(out + ".part-*")
    assert df.rdd.getNumPartitions() == 3  # one parse task per shard
    assert {r["id"] for r in df.collect()} == set(range(1, 13))

    # a directory path reads every file inside
    df_dir = spark.read.format("vectordbjson").load(str(tmp_path))
    assert {r["id"] for r in df_dir.collect()} == set(range(1, 13))

    import pytest as _pytest

    with _pytest.raises(Exception, match="nomatch"):
        spark.read.format("vectordbjson").load(str(tmp_path / "nomatch*")).collect()


def test_vectordb_datasource_commit_promotes_before_deleting(tmp_path):
    """Crash-safety ordering of the driver-side commit: new parts are
    renamed into place FIRST (same-index overwrite is atomic), only then
    are stale higher-index parts and losing-attempt tmps removed — so the
    directory always holds a complete snapshot, and a speculative
    attempt's tmp never survives a commit."""
    from custom_vector_database_spark.sources.vectordb_datasource import (
        VectorDbJsonWriter,
        _PartMessage,
    )

    out = str(tmp_path / "db.json")
    # previous snapshot: 3 parts
    for i in range(3):
        with open(f"{out}.part-{i:04d}", "w") as f:
            f.write('{"dim": 2, "vectors": [], "nextId": 1}\n')
    # new write produced 2 winning attempt tmps + 1 losing-attempt tmp
    msgs = []
    for i, attempt in [(0, 7), (1, 9)]:
        tmp = str(tmp_path / f".db.json.part-{i:04d}.attempt-{attempt}.tmp")
        with open(tmp, "w") as f:
            f.write('{\n  "dim": 2,\n  "vectors": [\n    '
                    '{"id": %d, "metadata": null, "vec": [1.0, 0.0]}\n  ]' % (i + 1))
        msgs.append(_PartMessage(tmp, i, 1, i + 1))
    loser = str(tmp_path / ".db.json.part-0000.attempt-3.tmp")
    with open(loser, "w") as f:
        f.write("{partial")

    VectorDbJsonWriter(out, 2, None).commit(msgs)

    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["db.json.part-0000", "db.json.part-0001"]  # stale 0002 gone
    for i in range(2):
        with open(f"{out}.part-{i:04d}") as f:
            doc = json.load(f)
        assert doc["nextId"] == 3  # global max(id)+1 stamped at commit
        assert [v["id"] for v in doc["vectors"]] == [i + 1]
