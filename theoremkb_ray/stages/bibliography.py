"""End-to-end bibliography resolution (J7).

Re-expresses the reference's GROBID-title citation linking
(reference: Styling/tools/references/get_links.py:57-162 ``getitem`` /
``get_links``: normalize each bibliography entry's title to
``lower + [a-z] only`` and equality-match it against known paper
titles, emitting the ``links_%i.csv`` rows ``(pdf_from, tag,
pdf_to)``) as a NORMALIZED-TITLE EQUI-JOIN over Datasets:

    bib entries (doc_from, tag, raw_title)
      |x| norm_title(raw_title) == norm_title(title)
    papers (doc_id, title)
      -> links (doc_from, tag, doc_to)

Physical plans: broadcast join while the papers side fits in memory
(the common case — one row per known paper), hash-partitioned
``Dataset.join`` fallback above that. The output feeds the existing
citation resolution (stages/link.py) unchanged, closing the loop:
bib table -> links table -> cites triples.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.text import norm_title_array
from .joins import broadcast_join, hash_join


def _add_norm(col: str, out: str = "norm_title"):
    def fn(b: pa.Table) -> pa.Table:
        if out in b.column_names:
            b = b.drop_columns([out])
        return b.append_column(out, norm_title_array(b[col]))

    return fn


def resolve_bibliography(
    bib_ds,
    papers,
    bib_title_col: str = "raw_title",
    paper_title_col: str = "title",
    paper_id_col: str = "doc_id",
    broadcast: bool = True,
):
    """bib entries + paper-title table -> resolved links Dataset
    ``(doc_from, tag, doc_to)``.

    ``papers`` may be a pandas DataFrame / Arrow table (broadcast path)
    or a Dataset (either path). Entries whose normalized title matches
    no paper are dropped — the reference's ``TNF`` (title-not-found)
    bucket (get_links.py:100-102)."""
    keyed = bib_ds.map_batches(
        _add_norm(bib_title_col), batch_format="pyarrow"
    )
    if broadcast:
        if hasattr(papers, "map_batches"):  # a Dataset: collect small side
            papers = papers.to_pandas()
        if isinstance(papers, pa.Table):
            papers = papers.to_pandas()
        right = pd.DataFrame(
            {
                "norm_title": norm_title_array(
                    pa.array(papers[paper_title_col], pa.string())
                ).to_pylist(),
                "doc_to": papers[paper_id_col],
            }
        )
        joined = broadcast_join(keyed, right, on=["norm_title"], how="inner")
    else:
        right = papers.map_batches(
            _add_norm(paper_title_col), batch_format="pyarrow"
        ).map_batches(
            lambda b: pa.table(
                {"norm_title": b["norm_title"], "doc_to": b[paper_id_col]}
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(keyed, right, on=["norm_title"], how="inner")
    return joined.map_batches(
        lambda b: pa.table(
            {
                "doc_from": b["doc_from"],
                "tag": b["tag"],
                "doc_to": b["doc_to"],
            }
        ),
        batch_format="pyarrow",
    )
