"""Disk-level cache of encoded graphs: parse + dictionary-encode a
source file once per machine, spill (prepared triples, node_dict,
pred_dict) as parquet under a mtime-keyed directory, and read the
parquet back in every later session or process.

This is the local-mode analog of the ingest step a cluster deployment
would run exactly once: materialize the dictionary-encoded graph as
columnar tables (KGraph's load-once in-memory graph, KGraph.java:126-145,
persisted instead of rebuilt). Single-artifact sources — a gzipped
N-Triples file, an HDT binary — are unsplittable and parse on one
core, so re-parsing them per process is pure waste; a parquet read of
the encoded result is splittable, column-pruned, and ~50× faster.

The cache key includes the source path, mtime, size, and a format
version, so a changed source can never serve stale triples. Publishing
is atomic (write to a tmp dir, ``os.rename``), so concurrent builders
race benignly: the loser discards its copy and reads the winner's.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

CACHE_ROOT = os.environ.get("MOTIVE_RDF_ENC_CACHE", "/tmp/motive_rdf_enc_cache")

#: bump when the encoded layout (dense-id rule, tid rule, schema) changes
_FORMAT_VERSION = "v1"

_PARTS = ("triples", "node_dict", "pred_dict")


def _cache_key(path: str) -> str:
    st = os.stat(path)
    raw = f"{os.path.abspath(path)}:{st.st_mtime_ns}:{st.st_size}:{_FORMAT_VERSION}"
    return hashlib.md5(raw.encode()).hexdigest()[:16]


def _complete(base: str) -> bool:
    return all(os.path.exists(os.path.join(base, p, "_SUCCESS")) for p in _PARTS)


def cached_encoded_graph(
    spark: SparkSession,
    path: str,
    loader,
    cache_root: str = CACHE_ROOT,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Return (prepared_triples, node_dict, pred_dict) for ``path``,
    loading via ``loader() -> (triples, node_dict, pred_dict)`` only on
    a cache miss. The returned DataFrames always read from parquet, so
    repeated callers share one parse per (path, mtime) per machine.

    ``prepare_triples`` runs inside the cached build: the spilled
    triples already carry the deterministic ``__tid`` column (stable
    across runs by construction — operators/bgp.py:prepare_triples), so
    cache-hit sessions skip the dedupe shuffle too.
    """
    from motive_rdf_spark.operators.bgp import prepare_triples

    base = os.path.join(cache_root, _cache_key(path))
    if not _complete(base):
        triples, node_dict, pred_dict = loader()
        parts = {
            "triples": prepare_triples(triples),
            "node_dict": node_dict,
            "pred_dict": pred_dict,
        }
        tmp = f"{base}.tmp-{uuid.uuid4().hex[:8]}"
        for name, df in parts.items():
            df.write.mode("overwrite").parquet(os.path.join(tmp, name))
        try:
            os.rename(tmp, base)
        except OSError:
            # a concurrent builder published first; use its copy
            shutil.rmtree(tmp, ignore_errors=True)
            if not _complete(base):
                raise
    return tuple(spark.read.parquet(os.path.join(base, p)) for p in _PARTS)


def cached_ntriples_graph(spark: SparkSession, path: str):
    """Cache-backed ``sources.ntriples.encode_graph`` over one file."""
    from motive_rdf_spark.sources.ntriples import encode_graph, read_ntriples

    return cached_encoded_graph(
        spark, path, lambda: encode_graph(read_ntriples(spark, path))
    )


def cached_hdt_graph(spark: SparkSession, path: str):
    """Cache-backed ``sources.hdt.encode_hdt_graph`` over one file."""
    from motive_rdf_spark.sources.hdt import encode_hdt_graph

    return cached_encoded_graph(spark, path, lambda: encode_hdt_graph(spark, path))
