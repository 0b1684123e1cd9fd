"""TF-IDF matcher: forks' theorems must match back to the originals
(the gold dup pairs), mirroring the reference's ~80% top-1 success —
ours should be near-perfect on 97%-similar forks."""

import ray.data as rd

from theoremkb_ray.pipelines.kg import results_dataset
from theoremkb_ray.stages.match import tfidf_match


def test_tfidf_match_recovers_fork_entities(gold100):
    corpus = gold100["corpus"].to_pandas()
    forks = corpus[corpus["repo"].str.startswith("fork/")]
    assert len(forks) > 0
    pairs = []
    for r in forks.itertuples():
        fork_doc = f"{r.repo}/{r.path}@{r.commit}"
        orig = corpus[
            (corpus["path"] == r.path)
            & (~corpus["repo"].str.startswith("fork/"))
        ].iloc[0]
        orig_doc = f"{orig.repo}/{orig.path}@{orig.commit}"
        pairs.append((fork_doc, orig_doc))

    results = results_dataset(
        rd.from_arrow(gold100["corpus"]), segmenter="naive"
    ).materialize()
    matches = tfidf_match(results, pairs).to_pandas()

    gold = dict(
        zip(
            gold100["gold_dup_pairs"]["entity_b"].to_pylist(),
            gold100["gold_dup_pairs"]["entity_a"].to_pylist(),
        )
    )
    assert len(gold) > 0
    hits = sum(
        1
        for r in matches.itertuples()
        if gold.get(r.src_entity) == r.dst_entity
    )
    # every fork entity should appear, and nearly all match correctly
    assert len(matches) >= len(gold) * 0.95
    assert hits / len(gold) >= 0.9
    assert (matches["confidence"] > 0.3).all()
