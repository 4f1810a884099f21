"""Fellegi–Sunter estimation gates: the distributed pattern histogram
matches a pandas recompute, and the pattern-grouped EM matches an
independent per-pair-expansion reference (the rows-only gate for
q_fs_em_weights)."""

import numpy as np
import pytest

from payor_linkage.evaluate import FS_FIELDS, fs_agreement_patterns, fs_em_weights


@pytest.fixture(scope="module")
def fs_pairs(ray_session, pipeline_result):
    from payor_linkage.blocking import blocking_pairs

    return blocking_pairs(pipeline_result.unified).materialize()


def _pandas_patterns(pairs_df, fields):
    mask = np.zeros(len(pairs_df), dtype=np.int64)
    for i, f in enumerate(fields):
        a, b = pairs_df[f + "_a"], pairs_df[f + "_b"]
        agree = a.notna() & b.notna() & (a == b)
        mask |= agree.to_numpy().astype(np.int64) << i
    return mask


def test_patterns_match_pandas(fs_pairs):
    got = (fs_agreement_patterns(fs_pairs).to_pandas()
           .sort_values("pattern").reset_index(drop=True))
    mask = _pandas_patterns(fs_pairs.to_pandas(), FS_FIELDS)
    import pandas as pd

    want = (pd.Series(mask).value_counts().rename_axis("pattern")
            .reset_index(name="n_pairs").sort_values("pattern")
            .reset_index(drop=True))
    assert got["pattern"].tolist() == want["pattern"].tolist()
    assert got["n_pairs"].tolist() == want["n_pairs"].tolist()


def _reference_em_per_pair(mask, k, iters, init_m, init_u, init_lambda, eps):
    """Independent EM over the EXPANDED pair list (no pattern grouping) —
    a different computation path that must agree with the histogram EM."""
    g = ((mask[:, None] >> np.arange(k)) & 1).astype(np.float64)  # N×K
    m = np.full(k, init_m)
    u = np.full(k, init_u)
    lam = init_lambda
    for _ in range(iters):
        pm = lam * np.exp(g @ np.log(m) + (1 - g) @ np.log(1 - m))
        pu = (1 - lam) * np.exp(g @ np.log(u) + (1 - g) @ np.log(1 - u))
        w = pm / (pm + pu)
        m = np.clip(g.T @ w / w.sum(), eps, 1 - eps)
        u = np.clip(g.T @ (1 - w) / (1 - w).sum(), eps, 1 - eps)
        lam = float(np.clip(w.mean(), 1e-9, 1 - 1e-9))
    return m, u, lam


def test_em_matches_per_pair_reference(fs_pairs):
    pats = fs_agreement_patterns(fs_pairs)
    tbl, lam = fs_em_weights(pats, iters=30)
    mask = _pandas_patterns(fs_pairs.to_pandas(), FS_FIELDS)
    m_ref, u_ref, lam_ref = _reference_em_per_pair(
        mask, len(FS_FIELDS), 30, 0.9, 0.1, 0.05, 1e-6)
    np.testing.assert_allclose(tbl["m_prob"].to_numpy(), m_ref, rtol=1e-9)
    np.testing.assert_allclose(tbl["u_prob"].to_numpy(), u_ref, rtol=1e-9)
    assert abs(lam - lam_ref) < 1e-9


def test_em_separates_m_from_u(fs_pairs):
    # on the seeded corpus true duplicates agree far more often than
    # random blocked pairs: every field's m must exceed its u, and the
    # strong identifiers must carry positive agreement weight
    tbl, lam = fs_em_weights(fs_agreement_patterns(fs_pairs))
    m = tbl["m_prob"].to_numpy()
    u = tbl["u_prob"].to_numpy()
    assert (m > u).all()
    assert 0.0 < lam < 1.0
    aw = dict(zip(tbl["field"].to_pylist(), tbl["agree_weight"].to_numpy()))
    assert aw["tax_id"] > 0 and aw["phone"] > 0
