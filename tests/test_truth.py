"""Truth-discovery gates: agreement matrix vs a pandas recompute,
vote patterns hand-checked, and the pattern-histogram EM against an
independent per-claim-expansion reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from payor_linkage.survivorship import (CLAIM_FIELDS, source_accuracy_em,
                                        source_agreement, source_claims,
                                        source_vote_patterns)


def test_source_agreement_matches_pandas(ray_session, pipeline_result):
    res = pipeline_result
    got = (source_agreement(res.unified, res.golden, res.xref).to_pandas()
           .sort_values(["source_system", "field"]).reset_index(drop=True))

    recs = res.unified.select_columns(
        ["source_record_id", "source_system"] + CLAIM_FIELDS).to_pandas()
    xr = res.xref.select_columns(
        ["source_record_id", "master_payor_id"]).to_pandas()
    gold = res.golden.select_columns(
        ["master_payor_id"] + CLAIM_FIELDS).to_pandas()
    j = recs.merge(xr, on="source_record_id").merge(
        gold, on="master_payor_id", suffixes=("", "_g"))
    rows = []
    for c in CLAIM_FIELDS:
        a = j[c].astype("string")
        g = j[c + "_g"].astype("string")
        claim = a.notna()
        agree = claim & (a == g)
        grp = pd.DataFrame({"source_system": j["source_system"],
                            "n_claims": claim.astype("int64"),
                            "n_agree": agree.astype("int64")}) \
            .groupby("source_system", as_index=False).sum()
        grp.insert(1, "field", c)
        rows.append(grp)
    want = (pd.concat(rows).sort_values(["source_system", "field"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


@pytest.fixture(scope="module")
def crafted_claims(ray_session):
    import ray.data as rd

    # master m1/f: A,B say "x", C says "y"; m2/f: A says "x", C says "x"
    return rd.from_arrow(pa.table({
        "master_payor_id": ["m1", "m1", "m1", "m2", "m2"],
        "field": ["f"] * 5,
        "source_system": ["A", "B", "C", "A", "C"],
        "value": ["x", "x", "y", "x", "x"]}))


def test_vote_patterns_hand_checked(crafted_claims):
    got = (source_vote_patterns(crafted_claims, ["A", "B", "C"])
           .to_pandas().sort_values("pattern").reset_index(drop=True))
    # m1: A(0),B(1) claim value-class 0 ("x"), C(2) class 1 ("y")
    # m2: A(0) and C(2) both claim class 0
    want = pd.DataFrame({"pattern": ["0:0,1:0,2:1", "0:0,2:0"],
                         "n": [1, 1]})
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes))


def _per_claim_em(claims_df, sources, iters, prior, eps):
    """Independent EM over expanded claims (no pattern grouping)."""
    acc = {s: prior for s in sources}
    for _ in range(iters):
        conf = {}
        for (m, f), g in claims_df.groupby(["master_payor_id", "field"]):
            w = g.groupby("value")["source_system"].apply(
                lambda ss: sum(acc[s] for s in ss))
            tot = w.sum()
            for v, wv in w.items():
                conf[(m, f, v)] = wv / tot
        new = {s: [] for s in sources}
        for r in claims_df.itertuples():
            new[r.source_system].append(
                conf[(r.master_payor_id, r.field, r.value)])
        acc = {s: float(np.clip(np.mean(v), eps, 1 - eps)) if v else prior
               for s, v in new.items()}
    return acc


def test_accuracy_em_matches_per_claim_reference(crafted_claims):
    srcs = ["A", "B", "C"]
    pats = source_vote_patterns(crafted_claims, srcs)
    got = source_accuracy_em(pats, srcs, iters=15).to_pandas()
    ref = _per_claim_em(crafted_claims.to_pandas(), srcs, 15, 0.8, 1e-6)
    for r in got.itertuples():
        np.testing.assert_allclose(r.accuracy, ref[r.source_system],
                                   rtol=1e-9)
    m = dict(zip(got["source_system"], got["accuracy"]))
    assert m["C"] < m["A"] and m["C"] < m["B"]  # the outvoted source


def test_claims_grain(ray_session, pipeline_result):
    res = pipeline_result
    c = source_claims(res.unified, res.xref).to_pandas()
    assert set(c.columns) == {"master_payor_id", "field", "source_system",
                              "value"}
    assert c["value"].notna().all()
    assert not c.duplicated().any()
    assert set(c["field"]).issubset(set(CLAIM_FIELDS))
