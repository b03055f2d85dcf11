"""Result sinks: top-k motif tables as LaTeX/plain text and CSV —
the reference's report writers (RealWorld.java:68-120,
Multi.java:108-158, Synthetic.java:215-248).

Driver-side formatting of the (small) collected top-k; the CSV path
also has a distributed variant for large result sets.
"""

from __future__ import annotations

import csv
import io

from pyspark.sql import DataFrame

from motive_rdf_spark.functions.pref import shorten
from motive_rdf_spark.search import MotifResult


def motif_rows(
    results: list[MotifResult], node_names: dict[int, str] | None = None,
    pred_names: dict[int, str] | None = None,
) -> list[dict]:
    """Decode ids through the dictionaries (KGraph.recover semantics)
    and flatten to display rows."""
    def nn(t: int) -> str:
        if t < 0:
            return f"?n{-t}"
        return (node_names or {}).get(t, str(t))

    def pn(t: int) -> str:
        if t < 0:
            return f"?p{-t}"
        return (pred_names or {}).get(t, str(t))

    rows = []
    for r in results:
        bgp = ". ".join(
            f"{nn(s)} {pn(p)} {nn(o)}" for s, p, o in r.pattern.edges
        )
        rows.append({"score": r.score, "frequency": r.frequency, "bgp": bgp})
    return rows


def to_latex(results: list[MotifResult], null_bits: float, **names) -> str:
    """Top-k motif table: log-factor (bits saved vs null), frequency,
    BGP text (RealWorld.java:68-120 table shape)."""
    out = [
        r"\begin{tabular}{rrl}",
        r"log-factor & frequency & pattern \\",
        r"\hline",
    ]
    for row in motif_rows(results, **names):
        lf = null_bits - row["score"]
        out.append(rf"{lf:.1f} & {row['frequency']} & \texttt{{{row['bgp']}}} \\")
    out.append(r"\end{tabular}")
    return "\n".join(out)


def to_csv(results: list[MotifResult], null_bits: float, **names) -> str:
    """Scores/frequencies per motif as CSV (Synthetic.java:215-248)."""
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["log_factor", "score_bits", "frequency", "bgp"])
    for row in motif_rows(results, **names):
        w.writerow([round(null_bits - row["score"], 2), round(row["score"], 2), row["frequency"], row["bgp"]])
    return buf.getvalue()


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed CSV sink for large result DataFrames."""
    df.write.mode(mode).option("header", True).csv(path)
