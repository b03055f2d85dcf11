"""IRI namespace-prefix shorten/expand (reference Pref.java:12-72) —
cosmetic output compression of IRIs via a broadcast prefix table.

The prefix table mirrors the reference's built-ins (Pref.java:12-43);
shorten() picks the longest matching namespace. Pure native
expressions: a chained ``when`` over the (tiny, constant) table — no
UDF, no join, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# namespace -> short prefix (Pref.java:12-43)
PREFIXES: dict[str, str] = {
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#": "rdf",
    "http://www.w3.org/2000/01/rdf-schema#": "rdfs",
    "http://www.w3.org/2002/07/owl#": "owl",
    "http://www.w3.org/2001/XMLSchema#": "xsd",
    "http://xmlns.com/foaf/0.1/": "foaf",
    "http://purl.org/dc/elements/1.1/": "dc",
    "http://purl.org/dc/terms/": "dct",
    "http://swrc.ontoware.org/ontology#": "swrc",
    "http://data.semanticweb.org/ns/swc/ontology#": "swc",
    "http://www.w3.org/2004/02/skos/core#": "skos",
}

# longest namespaces first so the most specific prefix wins
_ORDERED = sorted(PREFIXES.items(), key=lambda kv: -len(kv[0]))


def shorten(iri: Column) -> Column:
    """``http://xmlns.com/foaf/0.1/name`` -> ``foaf:name`` (IRIs with
    no known namespace pass through unchanged). Handles both bare IRIs
    and angle-bracketed N-Triples terms."""
    bare = F.regexp_replace(iri, r"^<|>$", "")
    out = bare
    expr = None
    for ns, px in _ORDERED:
        cond = bare.startswith(ns)
        repl = F.concat(F.lit(px + ":"), F.substring(bare, len(ns) + 1, 10_000))
        expr = F.when(cond, repl) if expr is None else expr.when(cond, repl)
    return expr.otherwise(out)


def expand(short: Column) -> Column:
    """``foaf:name`` -> the full IRI; unknown prefixes pass through."""
    expr = None
    for ns, px in _ORDERED:
        cond = short.startswith(px + ":")
        repl = F.concat(F.lit(ns), F.substring(short, len(px) + 2, 10_000))
        expr = F.when(cond, repl) if expr is None else expr.when(cond, repl)
    return expr.otherwise(short)
