"""Bibliography resolution (J7): norm-title join -> links table."""

import pyarrow as pa
import ray.data as rd


def _fixtures():
    bib = pa.table(
        {
            "doc_from": pa.array(["p1", "p1", "p2", "p2"]),
            "tag": pa.array(["[1]", "[2]", "[1]", "[2]"]),
            "raw_title": pa.array(
                [
                    "On the THEORY of Graphs!",   # matches t1 (case/punct)
                    "A Missing Title",            # no match -> dropped (TNF)
                    "on-the-theory-of-graphs",    # matches t1
                    "Spectral   Bounds, 2nd ed.", # matches t2
                ]
            ),
        }
    )
    papers = pa.table(
        {
            "doc_id": pa.array(["t1", "t2"]),
            "title": pa.array(
                ["On the Theory of Graphs", "Spectral Bounds 2nd ed"]
            ),
        }
    )
    return bib, papers


def test_resolve_bibliography_broadcast_and_shuffle_match():
    from theoremkb_ray.stages.bibliography import resolve_bibliography

    bib, papers = _fixtures()
    want = {
        ("p1", "[1]", "t1"),
        ("p2", "[1]", "t1"),
        ("p2", "[2]", "t2"),
    }
    b = resolve_bibliography(rd.from_arrow(bib), papers.to_pandas()).to_pandas()
    assert set(zip(b["doc_from"], b["tag"], b["doc_to"])) == want
    s = resolve_bibliography(
        rd.from_arrow(bib), rd.from_arrow(papers), broadcast=False
    ).to_pandas()
    assert set(zip(s["doc_from"], s["tag"], s["doc_to"])) == want


def test_bib_links_feed_citation_resolution():
    """Closing the reference loop: resolved bib links drive extra-doc
    cites exactly like a driver-provided links table."""
    from theoremkb_ray.stages.bibliography import resolve_bibliography
    from theoremkb_ray.stages.link import resolve_citations

    bib, papers = _fixtures()
    links_tbl = pa.Table.from_pandas(
        resolve_bibliography(rd.from_arrow(bib), papers.to_pandas())
        .to_pandas()
    )
    mentions = pa.table(
        {
            "doc_id": pa.array(["p1", "p2", "p9"]),
            "src_entity": pa.array(["p1#theorem 1", "p2#proof 2", "p9#x"]),
            "src_group": pa.array([1, 2, 3], pa.int64()),
            "kind": pa.array(["lemma", "theorem", "claim"]),
            "num": pa.array(["3.1", "2", "1"]),
            "cite_tag": pa.array(["[1]", "[2]", "[7]"]),
        }
    )
    out = resolve_citations(rd.from_arrow(mentions), links_tbl).to_pandas()
    got = set(zip(out["subject"], out["object"]))
    assert got == {
        ("p1#theorem 1", "t1#lemma 3.1"),
        ("p2#proof 2", "t2#theorem 2"),
    }  # p9's tag resolves to nothing -> dropped
