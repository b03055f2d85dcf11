"""Iceberg-catalog backend for the materialization pipeline.

The graft's deployment target is an Iceberg catalog (SURVEY §1.4
`input_hint`); the pipeline routes all physical I/O through a Storage
object, and `sources/iceberg.IcebergStorage` is the catalog-backed
implementation. The parity test here runs the SAME pipeline over both
backends and asserts identical triples + ledger/resume behavior — it
needs the Iceberg Spark runtime jar on the classpath, so it skips
(with that reason) on runtimes that lack it, exactly as a connector
test should. The interface-level tests below run everywhere.
"""

from __future__ import annotations

import pytest

from motive_rdf_spark.data.generators import candidate_dict, source_code_table
from motive_rdf_spark.pipeline.materialize import (
    ParquetStorage,
    load_graph,
    processed_snapshots,
    run_pipeline,
)
from motive_rdf_spark.sources.iceberg import (
    IcebergStorage,
    iceberg_available,
    table_identifier,
)


def test_table_identifier_validates_parts():
    assert table_identifier("local", "motive", "triples") == "local.motive.triples"
    for bad in ("a.b", "a b", "", "x`y"):
        with pytest.raises(ValueError):
            table_identifier("local", bad, "t")


def test_iceberg_storage_requires_runtime(spark):
    """Without the runtime jar the backend must fail loudly at
    construction, not at first write."""
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; covered by the parity test")
    with pytest.raises(RuntimeError, match="classpath"):
        IcebergStorage(spark)


def test_parquet_storage_roundtrip(spark, tmp_path):
    """The default backend honors the exact Storage surface the
    pipeline (and IcebergStorage) depend on: overwrite/append modes,
    None for absent tables, versioned dict semantics."""
    st = ParquetStorage(spark, str(tmp_path / "kg"))
    assert st.read("ledger") is None
    assert st.load_dict("node_dict") is None
    df = spark.createDataFrame([("a", 1)], "term string, id long")
    st.write(df, "ledger", mode="append")
    st.write(df, "ledger", mode="append")
    assert st.read("ledger").count() == 2
    st.write_dict(df, "node_dict")
    st.write_dict(df.unionAll(df), "node_dict")
    # latest committed version wins; previous version stays intact
    assert st.load_dict("node_dict").count() == 2
    assert (tmp_path / "kg" / "node_dict" / "v1").exists()


def test_pipeline_parity_parquet_vs_iceberg(spark, tmp_path):
    """Full pipeline over both backends: identical final graph,
    identical ledger-resume behavior (snapshot 2 skipped on re-run)."""
    if not iceberg_available(spark):
        pytest.skip(
            "Iceberg Spark runtime jar not on the classpath in this "
            "sandbox (no network to resolve "
            "org.apache.iceberg:iceberg-spark-runtime); the backend is "
            "exercised end-to-end when a jar is present"
        )
    src = source_code_table(spark, 40, commits=2).drop("k")
    cands = candidate_dict(spark, 40)

    pq_out = str(tmp_path / "pq")
    run_pipeline(spark, src, cands, pq_out)
    expected = sorted(map(tuple, load_graph(spark, pq_out).collect()))

    ice = IcebergStorage(spark, warehouse=str(tmp_path / "wh"))
    ice_out = str(tmp_path / "ice_unused")
    reports = run_pipeline(spark, src, cands, ice_out, storage=ice)
    assert not any(r.skipped for r in reports)
    got = sorted(
        map(tuple, ice.read("triples").select("s", "p", "o").dropDuplicates().collect())
    )
    assert got == expected

    # resume: both snapshots are in the catalog ledger now
    snaps = {r.snapshot for r in reports}
    assert processed_snapshots(spark, ice_out, storage=ice) == snaps
    again = run_pipeline(spark, src, cands, ice_out, storage=ice)
    assert all(r.skipped for r in again)
