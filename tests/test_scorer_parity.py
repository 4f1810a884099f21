"""Scorer-path equivalence: the batched-DuckDB JW kernel, the pure-python
fallback, and the reference-parity ensemble function must agree exactly
on adversarial random pairs."""

import random
import string

import pyarrow as pa
import pytest

from payor_linkage.scoring import EnsembleScorer
from payor_linkage.strategies import ensemble_match_score


def _random_pairs(n=300, seed=11):
    rng = random.Random(seed)

    def maybe(v, p=0.3):
        return None if rng.random() < p else v

    def word(k):
        return "".join(rng.choice(string.ascii_uppercase + "  ")
                       for _ in range(k)).strip() or "X"

    rows = []
    for k in range(n):
        name = word(rng.randint(2, 30))
        name2 = name if rng.random() < 0.3 else word(rng.randint(2, 30))
        if rng.random() < 0.2:
            name2 = "BCBS " + name2
        row = {
            "source_record_id_a": f"a{k}", "source_record_id_b": f"b{k}",
            "payor_name_clean_a": maybe(name), "payor_name_clean_b": maybe(name2),
            "tax_id_a": maybe(str(rng.randint(10**8, 10**9 - 1))),
            "tax_id_b": maybe(str(rng.randint(10**8, 10**9 - 1))),
            "cms_plan_id_a": maybe("H" + str(rng.randint(1000, 9999))),
            "cms_plan_id_b": maybe("H" + str(rng.randint(1000, 9999))),
            "state_code_a": maybe(rng.choice(["CA", "NY", "TX"])),
            "state_code_b": maybe(rng.choice(["CA", "NY", "TX"])),
            "address_line_1_a": maybe(f"{rng.randint(1, 999)} {word(6)} ST"),
            "address_line_1_b": maybe(f"{rng.randint(1, 999)} {word(6)} ST"),
            "city_a": maybe(word(7)), "city_b": maybe(word(7)),
            "zip_code_a": maybe(str(rng.randint(10000, 99999))),
            "zip_code_b": maybe(str(rng.randint(10000, 99999))),
            "phone_a": maybe(str(rng.randint(10**9, 10**10 - 1))),
            "phone_b": maybe(str(rng.randint(10**9, 10**10 - 1))),
            "media_fingerprint_a": None, "media_fingerprint_b": None,
        }
        if rng.random() < 0.1:
            row["tax_id_b"] = row["tax_id_a"]
        rows.append(row)
    return rows


def test_duckdb_and_python_paths_identical():
    rows = _random_pairs()
    t = pa.table({k: pa.array([r[k] for r in rows], pa.string()) for k in rows[0]})
    duck = EnsembleScorer(use_duckdb_jw=True)(t).to_pylist()
    py = EnsembleScorer(use_duckdb_jw=False)(t).to_pylist()
    assert duck == py


def test_scorer_matches_reference_ensemble():
    rows = _random_pairs(seed=23)
    t = pa.table({k: pa.array([r[k] for r in rows], pa.string()) for k in rows[0]})
    got = EnsembleScorer()(t).to_pylist()
    for i, r in enumerate(rows):
        addr_a = (None if r["address_line_1_a"] is None else
                  f"{r['address_line_1_a']} {r['city_a'] or ''} "
                  f"{r['state_code_a'] or ''} {r['zip_code_a'] or ''}")
        addr_b = (None if r["address_line_1_b"] is None else
                  f"{r['address_line_1_b']} {r['city_b'] or ''} "
                  f"{r['state_code_b'] or ''} {r['zip_code_b'] or ''}")
        ref = ensemble_match_score(
            r["payor_name_clean_a"], r["payor_name_clean_b"],
            r["tax_id_a"], r["tax_id_b"], addr_a, addr_b,
            r["phone_a"], r["phone_b"], r["cms_plan_id_a"], r["cms_plan_id_b"])
        g = got[i]
        assert ref["name_score"] == g["score_name"], i
        assert ref["addr_score"] == g["score_address"], i
        assert ref["tax_score"] == g["score_tax_id"], i
        assert ref["phone_score"] == g["score_phone"], i
        assert ref["cms_score"] == g["score_cms_plan_id"], i
        assert ref["name_strategy"] == g["winning_name_strategy"], i
        assert ref["addr_strategy"] == g["winning_addr_strategy"], i
        assert ref["strategies_used"] == g["strategies_used"], i
        if g["match_rule"] == "FUZZY":
            assert ref["composite"] == g["overall_score"], i


def test_task_mode_matches_pool(ray_session):
    """score_pairs task mode (per-worker module cache) must be
    byte-identical to the actor-pool path on the same pairs."""
    import pandas as pd

    from payor_linkage.blocking import blocking_pairs
    from payor_linkage.normalize import unify
    from payor_linkage.scoring import score_pairs
    from payor_linkage.synth import synth_documents

    pairs = blocking_pairs(unify(synth_documents(2)).materialize()) \
        .materialize()

    def canon(ds):
        df = ds.to_pandas()
        return df.sort_values(["source_record_id_a", "source_record_id_b"]) \
            .reset_index(drop=True)

    pool = canon(score_pairs(pairs, task_mode=False))
    task = canon(score_pairs(pairs, task_mode=True))
    pd.testing.assert_frame_equal(pool, task)
