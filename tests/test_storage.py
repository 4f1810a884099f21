"""Checkpoint / lineage / resume tests (storage.py) — the dbt-style
per-stage materialization contract (SURVEY §2.1 S7, S10)."""

import json
import os

import pytest


def test_write_read_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from payor_linkage.storage import fingerprint, read_stage, write_stage

    ds = rd.range(100)
    fp = fingerprint("test", 1)
    out = write_stage(ds, str(tmp_path / "stage1"), fp=fp)
    assert out.count() == 100
    again = read_stage(str(tmp_path / "stage1"))
    assert again.count() == 100
    manifest = json.load(open(tmp_path / "stage1" / "_lineage.json"))
    assert manifest["fingerprint"] == fp
    assert manifest["rows"] == 100


def test_stage_validity(ray_session, tmp_path):
    import ray.data as rd

    from payor_linkage.storage import stage_is_valid, write_stage

    p = str(tmp_path / "stage2")
    write_stage(rd.range(10), p, fp="abc")
    assert stage_is_valid(p, "abc")
    assert not stage_is_valid(p, "xyz")
    assert not stage_is_valid(str(tmp_path / "missing"), "abc")


def test_checkpointed_skips_valid_stage(ray_session, tmp_path):
    import ray.data as rd

    from payor_linkage.storage import checkpointed

    calls = []

    def make():
        calls.append(1)
        return rd.range(5)

    root = str(tmp_path)
    r1 = checkpointed(root, "s", "fp1")(make)
    assert r1.count() == 5 and len(calls) == 1
    r2 = checkpointed(root, "s", "fp1")(make)
    assert r2.count() == 5 and len(calls) == 1      # resumed, not recomputed
    r3 = checkpointed(root, "s", "fp2")(make)
    assert r3.count() == 5 and len(calls) == 2      # fingerprint change → rerun


def test_checkpointed_none_root_passthrough(ray_session):
    import ray.data as rd

    from payor_linkage.storage import checkpointed

    out = checkpointed(None, "x", "fp")(lambda: rd.range(3))
    assert out.count() == 3


def test_pipeline_resume_from_checkpoints(ray_session, tmp_path):
    """Full pipeline with checkpoint_dir: a second run reuses every stage
    (the reference's downstream-only rebuild, S10) and outputs match."""
    from payor_linkage.config import PipelineConfig
    from payor_linkage.pipeline import run_linkage
    from payor_linkage.synth import synth_documents

    cfg = PipelineConfig(checkpoint_dir=str(tmp_path / "ckpt"))
    docs = synth_documents(1)
    r1 = run_linkage(docs, cfg)
    g1 = r1.golden.to_pandas().sort_values("master_payor_id").reset_index(drop=True)

    r2 = run_linkage(docs, cfg)  # stages all resume from checkpoint
    g2 = r2.golden.to_pandas().sort_values("master_payor_id").reset_index(drop=True)
    assert g1.drop(columns=["spans"]).equals(g2.drop(columns=["spans"]))
    # stage dirs exist with lineage manifests
    for stage in ["unified", "pairs", "candidates", "groups", "golden", "xref"]:
        assert os.path.exists(tmp_path / "ckpt" / stage / "_lineage.json"), stage


def test_write_partitioned_roundtrip_and_resume(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.storage import read_partitioned, write_partitioned

    def mk():
        return rd.from_arrow(pa.table({
            "k": pa.array(["a", "a", "b", "c", "c", "c"]),
            "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        }))

    root = str(tmp_path / "part")
    written = write_partitioned(mk(), root, by="k")
    assert written == ["a", "b", "c"]
    back = read_partitioned(root, by="k").to_pandas().sort_values("v")
    assert back.v.tolist() == [1, 2, 3, 4, 5, 6]
    assert sorted(back.k.unique()) == ["a", "b", "c"]

    # simulate a crash: partition b lost its marker (incomplete) — resume
    # must rewrite ONLY b; finished partitions keep their files untouched
    os.remove(os.path.join(root, "k=b", "_done"))
    a_files = set(os.listdir(os.path.join(root, "k=a")))
    written2 = write_partitioned(mk(), root, by="k")
    assert written2 == ["b"]
    assert set(os.listdir(os.path.join(root, "k=a"))) == a_files
    back2 = read_partitioned(root, by="k").to_pandas().sort_values("v")
    assert back2.v.tolist() == [1, 2, 3, 4, 5, 6]

    # fully-done resume: nothing written, data unchanged
    assert write_partitioned(mk(), root, by="k") == []
    back3 = read_partitioned(root, by="k").to_pandas().sort_values("v")
    assert back3.v.tolist() == [1, 2, 3, 4, 5, 6]


def test_ipc_roundtrip_row_identity(ray_session, tmp_path):
    """IPC sink/source must round-trip every row byte-exactly, and a
    re-write into the same directory must be idempotent (content-hash
    names; stale files truncated)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.storage import read_ipc_dir, write_ipc_dir

    df = pd.DataFrame({
        "i": pd.array(range(500), dtype="int64"),
        "s": [f"row-{i}\x1fodd" if i % 2 else f"row-{i}" for i in range(500)],
        "f": [i / 7 for i in range(500)],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(7)
    d = str(tmp_path / "ipc")
    write_ipc_dir(ds, d)
    back1 = read_ipc_dir(d).to_pandas().sort_values("i").reset_index(drop=True)
    pd.testing.assert_frame_equal(back1, df)
    write_ipc_dir(ds, d)  # idempotent re-run
    back2 = read_ipc_dir(d).to_pandas().sort_values("i").reset_index(drop=True)
    pd.testing.assert_frame_equal(back2, df)


def test_orc_roundtrip_row_identity(ray_session, tmp_path):
    """ORC sink/source must round-trip every row exactly, and a
    re-write into the same directory must be idempotent (content-hash
    names; stale files truncated)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.storage import read_orc_dir, write_orc_dir

    df = pd.DataFrame({
        "i": pd.array(range(500), dtype="int64"),
        "s": [f"row-{i}\x1fodd" if i % 2 else f"row-{i}" for i in range(500)],
        "f": [i / 7 for i in range(500)],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(7)
    d = str(tmp_path / "orc")
    write_orc_dir(ds, d)
    back1 = read_orc_dir(d).to_pandas().sort_values("i").reset_index(drop=True)
    pd.testing.assert_frame_equal(back1, df)
    write_orc_dir(ds, d)  # idempotent re-run
    back2 = read_orc_dir(d).to_pandas().sort_values("i").reset_index(drop=True)
    pd.testing.assert_frame_equal(back2, df)


def test_grouped_checksum_detects_difference(ray_session):
    """Equal tables agree per group; a single changed byte in one group
    changes exactly that group's checksum (n unchanged)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.aggregates import grouped_checksum

    def ds(df):
        return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))

    df = pd.DataFrame({
        "g": ["a"] * 50 + ["b"] * 50,
        "id": pd.array(range(100), dtype="int64"),
        "txt": [f"content {i}" for i in range(100)],
    })
    c1 = grouped_checksum(ds(df), "g", ["id", "txt"]).to_pandas() \
        .set_index("g").sort_index()
    df2 = df.copy()
    df2.loc[70, "txt"] = "content 70 TAMPERED"
    c2 = grouped_checksum(ds(df2), "g", ["id", "txt"]).to_pandas() \
        .set_index("g").sort_index()
    assert c1.loc["a", "checksum"] == c2.loc["a", "checksum"]
    assert c1.loc["b", "checksum"] != c2.loc["b", "checksum"]
    assert (c1["n"] == c2["n"]).all()
    # order independence: shuffled rows give identical checksums
    c3 = grouped_checksum(ds(df.sample(frac=1, random_state=3)),
                          "g", ["id", "txt"]).to_pandas() \
        .set_index("g").sort_index()
    pd.testing.assert_frame_equal(c1, c3)


def test_lance_branch_dispatch_stubbed(ray_session, tmp_path, monkeypatch):
    """Interface coverage for the environment-blocked Lance branch
    (VERDICT r03 #5): no pylance wheel exists in this container, so the
    branch is exercised through a stub at the exact module boundary the
    real wheel would fill — `storage.HAVE_LANCE` plus the Ray
    `Dataset.write_lance` / `ray.data.read_lance` calls. The stub
    round-trips through parquet but lays down Lance's `_versions`
    marker so `read_stage`'s format detection takes the Lance path.
    Proves: write_stage dispatches to write_lance, the lineage manifest
    records format=lance, read_stage detects + dispatches to read_lance,
    and checkpointed() resume works over the Lance layout."""
    import ray.data as rd
    from ray.data import Dataset

    import payor_linkage.storage as storage

    calls = {"write": 0, "read": 0}

    def fake_write_lance(self, uri, *a, **kw):
        calls["write"] += 1
        os.makedirs(os.path.join(uri, "_versions"), exist_ok=True)
        self.write_parquet(os.path.join(uri, "data"))

    def fake_read_lance(uri, *a, **kw):
        calls["read"] += 1
        return rd.read_parquet(os.path.join(uri, "data"))

    monkeypatch.setattr(storage, "HAVE_LANCE", True)
    monkeypatch.setattr(Dataset, "write_lance", fake_write_lance)
    monkeypatch.setattr(storage.rd, "read_lance", fake_read_lance)

    from payor_linkage.storage import (checkpointed, fingerprint,
                                       read_stage, stage_is_valid,
                                       write_stage)

    p = str(tmp_path / "lance_stage")
    fp = fingerprint("lance-test", 7)
    out = write_stage(rd.range(64), p, fp=fp)
    assert out.count() == 64
    assert calls["write"] == 1 and calls["read"] >= 1
    manifest = json.load(open(os.path.join(p, "_lineage.json")))
    assert manifest["format"] == "lance"
    assert manifest["rows"] == 64
    assert stage_is_valid(p, fp)
    # read_stage must take the _versions-marker lance path
    before = calls["read"]
    assert read_stage(p).count() == 64
    assert calls["read"] == before + 1
    # checkpointed() resume: valid fingerprint → read, no rebuild
    ran = {"n": 0}

    def build():
        ran["n"] += 1
        return rd.range(64)

    got = checkpointed(str(tmp_path), "lance_stage", fp)(build)
    assert got.count() == 64 and ran["n"] == 0


def test_bucketed_patch_rewrites_only_touched_buckets(ray_session, tmp_path):
    """patch_bucketed must splice rebuilt rows over affected keys while
    leaving every untouched bucket's files byte-identical on disk — the
    persisted-output form of the incremental splice (a daily delta
    rewrites O(delta) partitions, never the corpus)."""
    import hashlib
    import os
    import zlib

    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.storage import (patch_bucketed, read_bucketed,
                                       write_bucketed)

    n_buckets = 8
    base = pa.table({
        "master_id": [f"M{i:04d}" for i in range(200)],
        "val": list(range(200)),
    })
    path = str(tmp_path / "golden_bucketed")
    written = write_bucketed(rd.from_arrow(base), path, "master_id",
                             n_buckets=n_buckets)
    assert written  # all touched buckets got markers

    def bucket_files():
        out = {}
        for d in sorted(os.listdir(path)):
            if not d.startswith("_bucket="):
                continue
            for f in sorted(os.listdir(os.path.join(path, d))):
                if f.endswith(".parquet"):
                    p = os.path.join(path, d, f)
                    out[p] = hashlib.sha256(
                        open(p, "rb").read()).hexdigest()
        return out

    before = bucket_files()

    # delta: modify two existing keys, add one brand-new key
    affected = ["M0003", "M0007", "M9999"]
    rebuilt = pa.table({
        "master_id": ["M0003", "M9999"],   # M0007 is dropped outright
        "val": [3000, 9999],
    })
    touched = patch_bucketed(path, "master_id", rd.from_arrow(rebuilt),
                             affected, n_buckets=n_buckets)
    exp_touched = sorted({zlib.crc32(k.encode()) % n_buckets
                          for k in affected})
    assert touched == exp_touched

    # read-back equals the logical splice
    got = read_bucketed(path).to_pandas().sort_values(
        "master_id").reset_index(drop=True)
    assert "M0007" not in set(got["master_id"])
    assert int(got.loc[got["master_id"] == "M0003", "val"].iloc[0]) == 3000
    assert int(got.loc[got["master_id"] == "M9999", "val"].iloc[0]) == 9999
    # dropped M0007 (−1), replaced M0003 (±0), added M9999 (+1)
    assert len(got) == 200

    # untouched buckets: byte-identical files
    after = bucket_files()
    touched_dirs = {f"_bucket={b}" for b in touched}
    for p, h in before.items():
        d = os.path.basename(os.path.dirname(p))
        if d not in touched_dirs:
            assert after.get(p) == h, f"untouched bucket rewritten: {p}"

    # idempotent re-patch (crash-retry shape): same end state
    patch_bucketed(path, "master_id", rd.from_arrow(rebuilt), affected,
                   n_buckets=n_buckets)
    got2 = read_bucketed(path).to_pandas().sort_values(
        "master_id").reset_index(drop=True)
    assert got2.equals(got)

def test_bucketed_patch_crash_recovery_and_validation(ray_session, tmp_path):
    """The rename-swap crash contract: a leftover ``.old`` dir is the
    authoritative old-complete state (restored when the live dir is
    missing, discarded when it is present); rebuilt keys outside
    affected_keys are refused loudly; non-string/int keys are refused."""
    import os
    import shutil
    import zlib

    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.storage import (patch_bucketed, read_bucketed,
                                       write_bucketed)

    n_buckets = 4
    base = pa.table({
        "master_id": [f"K{i:03d}" for i in range(40)],
        "val": list(range(40)),
    })
    path = str(tmp_path / "crash_bucketed")
    write_bucketed(rd.from_arrow(base), path, "master_id",
                   n_buckets=n_buckets)

    # simulate a crash between swap steps 2 and 3: bucket dir parked as
    # .old, live dir missing — a patch over that bucket must first
    # restore the old state, then splice (unaffected rows survive)
    b = zlib.crc32(b"K001") % n_buckets
    bdir = os.path.join(path, f"_bucket={b}")
    os.rename(bdir, bdir + ".old")
    assert not os.path.exists(bdir)
    patch_bucketed(path, "master_id",
                   rd.from_arrow(pa.table({"master_id": ["K001"],
                                           "val": [1001]})),
                   ["K001"], n_buckets=n_buckets)
    got = read_bucketed(path).to_pandas()
    assert len(got) == 40  # every unaffected row in the crashed bucket survived
    assert int(got.loc[got["master_id"] == "K001", "val"].iloc[0]) == 1001
    assert not os.path.exists(bdir + ".old")

    # crash during step 4 (.old left beside a complete live dir): the
    # live dir wins, .old is discarded
    shutil.copytree(bdir, bdir + ".old")
    patch_bucketed(path, "master_id",
                   rd.from_arrow(pa.table({"master_id": ["K001"],
                                           "val": [1002]})),
                   ["K001"], n_buckets=n_buckets)
    got = read_bucketed(path).to_pandas()
    assert len(got) == 40
    assert int(got.loc[got["master_id"] == "K001", "val"].iloc[0]) == 1002
    assert not os.path.exists(bdir + ".old")

    # rebuilt rows whose key is outside affected_keys: loud refusal
    import pytest as _pytest
    with _pytest.raises(ValueError, match="outside"):
        patch_bucketed(path, "master_id",
                       rd.from_arrow(pa.table({"master_id": ["K001",
                                                             "K999"],
                                               "val": [1, 2]})),
                       ["K001"], n_buckets=n_buckets)

    # unsupported key dtype (float): refused at write time, not
    # silently mis-bucketed (TypeError raised inside the map task,
    # surfaced wrapped by Ray — match on the message)
    with _pytest.raises(Exception, match="string/int"):
        write_bucketed(
            rd.from_arrow(pa.table({"k": [1.5, 2.5], "v": [1, 2]})),
            str(tmp_path / "floatkeys"), "k", n_buckets=2)


def test_compact_bucketed_merges_and_preserves(ray_session, tmp_path):
    import os

    import pandas as pd
    import ray.data as rd

    from payor_linkage import storage

    base = str(tmp_path / "state")
    rows1 = [{"k": i, "v": f"a{i}"} for i in range(20)]
    rows2 = [{"k": i + 100, "v": f"b{i}"} for i in range(20)]
    rows3 = [{"k": i + 200, "v": f"c{i}"} for i in range(5)]
    storage.write_bucketed(rd.from_items(rows1), base, "k", n_buckets=4)
    storage.append_bucketed(rd.from_items(rows2), base, "k", n_buckets=4)
    storage.append_bucketed(rd.from_items(rows3), base, "k", n_buckets=4)

    def part_counts():
        return {d: sum(1 for f in os.listdir(os.path.join(base, d))
                       if f.endswith(".parquet"))
                for d in os.listdir(base) if d.startswith("_bucket=")}

    before = storage.read_bucketed(base).to_pandas() \
        .sort_values(["k"]).reset_index(drop=True)
    assert any(n > 1 for n in part_counts().values())
    compacted = storage.compact_bucketed(base)
    assert compacted, "multi-part buckets must be compacted"
    counts = part_counts()
    assert all(n == 1 for n in counts.values())
    after = storage.read_bucketed(base).to_pandas() \
        .sort_values(["k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    # idempotent: second compact is a no-op
    assert storage.compact_bucketed(base) == []
