"""Iceberg-catalog storage backend for the materialization pipeline.

The graft's deployment target is an Iceberg catalog (north_rule /
SURVEY §1.4 `input_hint`): the pipeline's snapshot/ledger/lineage
contract is connector-agnostic (`pipeline/materialize.py` routes all
physical I/O through a `Storage` object), and this module is the
catalog-backed implementation of that interface.

What Iceberg replaces, one-for-one:

- `ParquetStorage`'s per-table directory + dynamic partition
  overwrite  →  `df.writeTo(cat.ns.tbl).overwritePartitions()` — an
  *atomic* snapshot commit per write (Iceberg's optimistic metadata
  swap), so re-running a crashed snapshot is idempotent for free;
- the hand-rolled `_SUCCESS`-marker dictionary versioning
  (`materialize._write_dict` keeps vN/vN+1)  →  Iceberg's native
  snapshot history: `createOrReplace()` commits a new table snapshot
  and the previous one stays readable via time travel
  (`VERSION AS OF`), which is exactly the crash-safety contract the
  versioned-parquet dance implements by hand;
- ledger appends  →  `append()` (atomic, no partial files).

The Iceberg runtime is a Spark-side jar
(`org.apache.iceberg:iceberg-spark-runtime-<spark>_<scala>`), not a
Python dependency. This sandbox has no such jar and no network, so
`iceberg_available()` gates every runtime use; the parity test
(`tests/test_iceberg.py`) runs the full pipeline over both backends
and asserts identical triples/ledger/resume behavior when a jar IS
resolvable, and skips with that reason when not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: catalog implementation class shipped in the Iceberg Spark runtime jar
SPARK_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(SPARK_CATALOG_IMPL)
        return True
    except Exception:
        return False


def table_identifier(catalog: str, namespace: str, table: str) -> str:
    """Fully-qualified catalog identifier for one of the pipeline's
    logical tables (triples / node_dict / pred_dict / lineage /
    metrics / ledger)."""
    for part in (catalog, namespace, table):
        if not part or any(ch in part for ch in ".` \n"):
            raise ValueError(f"bad identifier part: {part!r}")
    return f"{catalog}.{namespace}.{table}"


def configure_hadoop_catalog(
    spark: SparkSession, catalog: str, warehouse: str
) -> None:
    """Register a Hadoop-type Iceberg catalog on a running session.

    V2 catalogs are instantiated lazily on first reference, so runtime
    ``spark.conf.set`` suffices — no session restart (the SQL
    extensions jar is only needed for MERGE/CALL, which the pipeline
    doesn't use)."""
    spark.conf.set(f"spark.sql.catalog.{catalog}", SPARK_CATALOG_IMPL)
    spark.conf.set(f"spark.sql.catalog.{catalog}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{catalog}.warehouse", warehouse)


class IcebergStorage:
    """`materialize.Storage` implementation over an Iceberg catalog.

    Each logical pipeline table becomes ``<catalog>.<namespace>.<name>``;
    writes are atomic snapshot commits, reads see only committed
    snapshots — the checkpoint/resume contract (`processed_snapshots`
    anti-join, idempotent snapshot re-run) is inherited unchanged.
    """

    def __init__(
        self,
        spark: SparkSession,
        catalog: str = "local",
        namespace: str = "motive",
        warehouse: str | None = None,
    ):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg Spark runtime jar not on the classpath; add "
                "iceberg-spark-runtime via spark.jars(.packages) or use "
                "ParquetStorage"
            )
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        if warehouse is not None:
            configure_hadoop_catalog(spark, catalog, warehouse)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _ident(self, table: str) -> str:
        return table_identifier(self.catalog, self.namespace, table)

    def _exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._ident(table))

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        from pyspark.sql import functions as F

        w = df.writeTo(self._ident(table))
        if not self._exists(table):
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.create()
        elif mode == "append":
            w.append()
        elif partition_by:
            # replace only the partitions present in df (the Iceberg
            # analog of dynamic partition overwrite) — atomic
            w.overwritePartitions()
        else:
            w.createOrReplace()

    def read(self, table: str) -> DataFrame | None:
        if not self._exists(table):
            return None
        return self.spark.table(self._ident(table))

    # --- dictionaries: Iceberg-native versioning ----------------------
    # createOrReplace commits a new snapshot; the previous dictionary
    # stays readable (time travel) and a crash mid-commit leaves the
    # current snapshot untouched — the same guarantee materialize's
    # _SUCCESS-marker vN directories provide by hand for Parquet.

    def load_dict(self, table: str) -> DataFrame | None:
        return self.read(table)

    def write_dict(self, df: DataFrame, table: str) -> None:
        self.write(df, table, mode="overwrite", partition_by=None)

    def dict_history(self, table: str) -> DataFrame:
        """Committed snapshot history of a dictionary table (the vN
        listing's Iceberg analog)."""
        return self.spark.table(f"{self._ident(table)}.snapshots")
