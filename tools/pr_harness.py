"""Precision/recall harness vs reference semantics (BASELINE.json
metric: "motif-induction P/R >= 0.95 vs motive-rdf reference on its
RDF fixtures ... comparing triple sets, canonical entity IDs, and
motif support counts").

Five axes, each P/R computed against ground truth that is either the
reference's own hard-coded expectations (FindTest.java binding sets,
dogfood golden counts) or closed-form constructions (planted
instances, template extraction, component minima):

  1. BGP binding sets   — findTest1's four patterns, exact expected
                          binding tuples (FindTest.java:33-133)
  2. dogfood supports   — q1/q2/q3 match counts vs the reference's
                          asserted 3307/3307/77897
  3. planted motifs     — recovered pruned instances vs the planted
                          ground-truth instance set
  4. emitted triples    — pipeline extraction output vs the
                          closed-form expected triple set (the
                          "matching the reference's emitted (subj,
                          pred, obj) triples" axis)
  5. canonical entities — CC component ids vs exact component minima

Writes PR_REPORT.md and exits non-zero if any axis < 0.95.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOGFOOD = "/root/reference/src/main/resources/data/swdf-2012-11-28.nt.gz"


def pr(got: set, exp: set) -> tuple[float, float]:
    if not got and not exp:
        return 1.0, 1.0
    tp = len(got & exp)
    p = tp / len(got) if got else 0.0
    r = tp / len(exp) if exp else 0.0
    return p, r


def main() -> int:
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from motive_rdf_spark.data.generators import (
        find1_graph,
        planted_graph,
        source_code_table,
    )
    from motive_rdf_spark.operators.bgp import find, prepare_triples
    from motive_rdf_spark.operators.prune import prune_matches
    from motive_rdf_spark.patterns import Pattern
    from motive_rdf_spark.pipeline.canonicalize import connected_components
    from motive_rdf_spark.pipeline.extract import extract_triples
    from motive_rdf_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions="8")
    spark.sparkContext.setLogLevel("ERROR")
    rows: list[tuple[str, float, float]] = []

    # ---- axis 1: findTest1 exact binding sets -------------------------
    g1 = prepare_triples(find1_graph(spark))
    cases = [
        ("grounded+predvar", Pattern([(3, 1, 4), (4, -1, 5)]), {(1,), (0,)}),
        (
            "all-var triangle",
            Pattern([(-1, -4, -2), (-1, -5, -3), (-2, -6, -3)]),
            {(0, 1, 3, 0, 1, 0), (0, 2, 3, 0, 1, 0)},
        ),
        (
            "vee",
            Pattern([(-1, -4, -3), (-2, -5, -3)]),
            {
                (1, 2, 3, 0, 0), (2, 1, 3, 0, 0),
                (0, 1, 3, 1, 0), (1, 0, 3, 0, 1),
                (0, 2, 3, 1, 0), (2, 0, 3, 0, 1),
            },
        ),
    ]
    got_all, exp_all = set(), set()
    for name, pat, exp in cases:
        got = {tuple(r) for r in find(g1, pat).collect()}
        got_all |= {(name, t) for t in got}
        exp_all |= {(name, t) for t in exp}
    rows.append(("BGP binding sets (findTest1)", *pr(got_all, exp_all)))

    # ---- axis 2: dogfood golden supports ------------------------------
    if os.path.exists(DOGFOOD):
        from motive_rdf_spark.sources.ntriples import encode_graph, read_ntriples, term_id

        nt = read_ntriples(spark, DOGFOOD)
        t, nd, pd_ = encode_graph(nt)
        t = prepare_triples(t).persist()
        year = term_id(pd_, "<http://swrc.ontoware.org/ontology#year>")
        typ = term_id(pd_, "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>")
        inproc = term_id(nd, "<http://swrc.ontoware.org/ontology#InProceedings>")
        got = {
            ("q1", find(t, Pattern([(-1, year, -2), (-1, typ, inproc)])).count()),
            ("q2", find(t, Pattern([(-1, year, -2), (-1, -3, inproc)])).count()),
            ("q3", find(t, Pattern([(-1, -3, -2), (-1, typ, inproc)])).count()),
        }
        exp = {("q1", 3307), ("q2", 3307), ("q3", 77897)}
        rows.append(("dogfood support counts", *pr(got, exp)))

        # published motif support: the supplement's #1 dogfood motif
        # (?n1 dc:creator ?n2. ?n1 foaf:maker ?n2. ?n2 foaf:made ?n1.)
        # at frequency 10,475 (supplement.pdf p.1)
        from motive_rdf_spark.operators.prune import prune_matches as _pm

        creator = term_id(pd_, "<http://purl.org/dc/elements/1.1/creator>")
        maker = term_id(pd_, "<http://xmlns.com/foaf/0.1/maker>")
        made = term_id(pd_, "<http://xmlns.com/foaf/0.1/made>")
        mp = Pattern([(-1, creator, -2), (-1, maker, -2), (-2, made, -1)])
        kept = _pm(mp, sorted([list(x) for x in find(t, mp).collect()]))
        rows.append(
            ("published top-motif support (10475)",
             *pr({("top", len(kept))}, {("top", 10475)}))
        )
        t.unpersist()

    # ---- axis 2b: HDT golden supports (aifb/mutag) --------------------
    data = "/root/reference/src/main/resources/data"
    if os.path.exists(f"{data}/aifb.complete.hdt"):
        from motive_rdf_spark.sources.hdt import encode_hdt_graph
        from motive_rdf_spark.sources.ntriples import term_id as _tid

        swrs = "http://swrc.ontoware.org/ontology#"
        mtg = "http://dl-learner.org/carcinogenesis#"
        a, _nd, apd = encode_hdt_graph(spark, f"{data}/aifb.complete.hdt")
        a = prepare_triples(a).persist()
        pub = _tid(apd, f"{swrs}publication")
        auth = _tid(apd, f"{swrs}author")
        rtype = _tid(apd, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        got = {
            ("aifb_row2", find(a, Pattern([(-1, pub, -2), (-2, -3, -1)])).count()),
            ("aifb_row3", find(a, Pattern([(-1, pub, -2), (-2, auth, -1)])).count()),
            ("aifb_row4", find(a, Pattern([(-1, pub, -2), (-2, rtype, -3), (-2, auth, -1)])).count()),
        }
        a.unpersist()
        mgr, _nd2, mpd = encode_hdt_graph(spark, f"{data}/mutag.complete.hdt")
        mgr = prepare_triples(mgr).persist()
        ha, hb, ib = (_tid(mpd, f"{mtg}{x}") for x in ("hasAtom", "hasBond", "inBond"))
        got.add(
            ("mutag_top", find(mgr, Pattern([(-1, ha, -3), (-1, hb, -2), (-2, ib, -3)])).count())
        )
        mgr.unpersist()
        exp = {
            ("aifb_row2", 4154),
            ("aifb_row3", 3965),
            ("aifb_row4", 7930),
            ("mutag_top", 18634),
        }
        rows.append(("HDT golden supports (aifb/mutag)", *pr(got, exp)))

    # ---- axis 3: planted-motif instance recovery ----------------------
    pat_edges = [(-1, 0, -2), (-1, 1, -3), (-2, 2, -3)]
    n_base, m, r, k = 400, 800, 7, 25
    g = prepare_triples(planted_graph(spark, n_base, m, r, pat_edges, k)).persist()
    pat = Pattern(pat_edges)
    matches = sorted([list(x) for x in find(g, pat).collect()])
    kept = prune_matches(pat, matches)
    got = {tuple(x) for x in kept if all(v >= n_base for v in x[:3])}
    exp = set()
    for j in range(k):
        base = n_base + j * 3
        exp.add((base, base + 1, base + 2))
    # recall over planted; precision counts only planted-node rows (base
    # graph can legitimately contain extra motif occurrences)
    rows.append(("planted motif instances", *pr(got, exp)))
    g.unpersist()

    # ---- axis 4: emitted pipeline triples vs closed form --------------
    src = source_code_table(spark, 200)
    got_t = {
        (r["subj"], r["pred"], r["obj"])
        for r in extract_triples(src.drop("k")).collect()
    }
    exp_t = set()
    for rrow in src.collect():
        file_id = f"{rrow['repo']}/{rrow['path']}"
        kk = rrow["k"]
        callee = re.search(r"return (f\d+_fn)\(\)", rrow["content"]).group(1)
        module = re.search(r"import ([\w.]+)", rrow["content"]).group(1)
        exp_t |= {
            (file_id, "defines_class", f"C{kk}_cls"),
            (file_id, "defines_function", f"f{kk}_fn"),
            (f"f{kk}_fn", "member_of", f"C{kk}_cls"),
            (file_id, "imports", module),
            (file_id, "in_repo", rrow["repo"]),
        }
        if callee != f"f{kk}_fn":
            exp_t.add((f"f{kk}_fn", "calls", callee))
    rows.append(("emitted (subj,pred,obj) triples", *pr(got_t, exp_t)))

    # ---- axis 5: canonical entity ids ---------------------------------
    edges = spark.range(600).select(
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(250)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(12)), F.lit(250)).alias("dst"),
    )
    cc = {(r["node"], r["component"]) for r in connected_components(edges).collect()}
    # exact ground truth via union-find on the collected edge list
    parent: dict[int, int] = {}

    def findp(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges.collect():
        a, b = findp(int(e["src"])), findp(int(e["dst"]))
        if a != b:
            parent[max(a, b)] = min(a, b)
    comp: dict[int, int] = {}
    for node in list(parent):
        comp[node] = findp(node)
    exp_cc = {
        (node, min(x for x in comp if comp[x] == c)) for node, c in comp.items()
        for c in [comp[node]]
    }
    rows.append(("canonical entity ids (CC)", *pr(cc, exp_cc)))

    # ---- report -------------------------------------------------------
    lines = [
        "# P/R REPORT — measured precision/recall vs reference semantics",
        "",
        "Target (BASELINE.json): P/R >= 0.95 on triple sets, canonical",
        "entity IDs, and motif support counts. Ground truth per axis is",
        "the reference's own hard-coded expectations or closed-form",
        "constructions (tools/pr_harness.py).",
        "",
        "| axis | precision | recall |",
        "|---|---|---|",
    ]
    ok = True
    for name, p, rr in rows:
        lines.append(f"| {name} | {p:.4f} | {rr:.4f} |")
        print(f"{name:38s} P={p:.4f} R={rr:.4f}")
        if p < 0.95 or rr < 0.95:
            ok = False
    lines.append("")
    lines.append(f"All axes >= 0.95: **{'yes' if ok else 'NO'}**")
    with open(os.path.join(REPO, "PR_REPORT.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote PR_REPORT.md; all >= 0.95:", ok)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
