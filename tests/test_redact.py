"""PII redaction (stages/redact.py) + mixture sampling
(stages/sampling.py:mixture_sample)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from theoremkb_ray.stages.redact import redact
from theoremkb_ray.stages.sampling import mixture_sample


def test_redact_plants():
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "mail me at a.user+tag@example.co.uk or call 555-867-5309",
                    "server 192.168.0.1 and 10.0.0.255 are up",
                    "nothing to hide here",
                ],
            }
        )
    )
    out = redact(ds).to_pandas().set_index("doc_id").sort_index()
    assert (
        out.loc[1, "redacted"]
        == "mail me at <EMAIL> or call <PHONE>"
    )
    assert out.loc[1, "n_email"] == 1 and out.loc[1, "n_phone"] == 1
    assert out.loc[2, "redacted"] == "server <IP> and <IP> are up"
    assert out.loc[2, "n_ipv4"] == 2
    assert out.loc[3, "redacted"] == "nothing to hide here"
    assert (
        out[["n_email", "n_ipv4", "n_phone"]].loc[3] == 0
    ).all()


def test_redact_order_email_before_ip():
    # the domain of an email contains dot-separated tokens an IP regex
    # could partially match — email must be replaced first (the
    # documented contract the SQL oracle mirrors)
    ds = rd.from_arrow(
        pa.table({"doc_id": [1], "text": ["x a.b@c1.d2.com y 1.2.3.4 z"]})
    )
    out = redact(ds).to_pandas()
    assert out["redacted"].iloc[0] == "x <EMAIL> y <IP> z"
    assert out["n_email"].iloc[0] == 1 and out["n_ipv4"].iloc[0] == 1


def _docs(n=500, langs=("en", "en", "en", "de", "fr")):
    ids = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "doc_id": ids,
            "lang": pa.array([langs[i % len(langs)] for i in range(n)]),
        }
    )


def _brute_mixture(tbl: pa.Table, quotas: dict) -> set[int]:
    ids = tbl["doc_id"].to_numpy()
    langs = tbl["lang"].to_numpy(zero_copy_only=False)
    keep: set[int] = set()
    for lang, q in quotas.items():
        sel = ids[langs == lang]
        rank = (sel.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            1 << 32
        )
        order = np.lexsort((sel, rank))
        keep.update(int(i) for i in sel[order[:q]])
    return keep


def test_mixture_sample_quotas_and_determinism():
    tbl = _docs()
    quotas = {"en": 30, "de": 10, "fr": 5}
    want = _brute_mixture(tbl, quotas)
    for blocks in (1, 7):
        out = (
            mixture_sample(
                rd.from_arrow(tbl).repartition(blocks),
                "lang",
                "doc_id",
                quotas,
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert set(out["doc_id"]) == want
        counts = out["lang"].value_counts().to_dict()
        assert counts == {"en": 30, "de": 10, "fr": 5}


def test_mixture_sample_small_group_kept_whole():
    # a group smaller than its quota survives intact; a group absent
    # from quotas is dropped entirely
    tbl = pa.table(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "lang": pa.array(["zh"] * 3 + ["en"] * 7),
        }
    )
    out = mixture_sample(
        rd.from_arrow(tbl), "lang", "doc_id", {"zh": 100}
    ).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2]
