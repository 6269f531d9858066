"""Dedup-family tests: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Oracle strategy: build a small corpus with PLANTED duplicate groups
(exact copies and near-copies by small edits); the expected survivor set is
computed independently (exact dedup: pandas; near-dup: brute-force O(n²)
true Jaccard + union-find on the driver)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from migration_pair_ray.functions.hashing import MinHasher, ngram_jaccard, simhash64, hamming64
from migration_pair_ray.stages.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)


def corpus(n_uniq=40, seed=3):
    """Synthetic docs: n_uniq distinct base texts; every 4th has an exact
    copy, every 5th a near-copy (one word substituted)."""
    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]
    rows = []
    did = 0
    for u in range(n_uniq):
        base = " ".join(rng.choice(words, size=30))
        rows.append({"doc_id": did, "text": base}); did += 1
        if u % 4 == 0:
            rows.append({"doc_id": did, "text": base}); did += 1           # exact dup
        if u % 5 == 0:
            toks = base.split(); toks[3] = "zulu"
            rows.append({"doc_id": did, "text": " ".join(toks)}); did += 1  # near dup
    return pd.DataFrame(rows)


def union_find_oracle(df, sim_fn, threshold):
    ids = df["doc_id"].tolist()
    texts = dict(zip(df["doc_id"], df["text"]))
    parent = {i: i for i in ids}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]; x = parent[x]
        return x
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sim_fn(texts[ids[i]], texts[ids[j]]) >= threshold:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return sorted(i for i in ids if find(i) == i)


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup():
    df = corpus()
    ds = ray.data.from_pandas(df)
    got = sorted(exact_dedup(ds).to_pandas()["doc_id"])
    want = sorted(df.sort_values("doc_id").drop_duplicates("text")["doc_id"])
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_dedup_catches_planted_dups():
    df = corpus()
    ds = ray.data.from_pandas(df)
    survivors = sorted(minhash_lsh_dedup(ds, threshold=0.7).to_pandas()["doc_id"])
    want = union_find_oracle(df, lambda a, b: ngram_jaccard(a, b, 5), 0.7)
    # MinHash is probabilistic: estimated-vs-true Jaccard may disagree near
    # the threshold, but every exact duplicate MUST be merged and survivors
    # must be a subset of docs (sanity) with the oracle's exact-dup removals.
    exact_dups = set(df["doc_id"]) - set(
        df.sort_values("doc_id").drop_duplicates("text")["doc_id"])
    assert not exact_dups & set(survivors)
    # and near-total agreement with the true-Jaccard oracle
    sym = set(survivors) ^ set(want)
    assert len(sym) <= max(2, len(want) // 10), (sorted(sym), want)


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_dedup_matches_union_find_oracle():
    df = corpus()
    ds = ray.data.from_pandas(df)
    survivors = sorted(ngram_jaccard_dedup(ds, threshold=0.7, n=5).to_pandas()["doc_id"])
    want = union_find_oracle(df, lambda a, b: ngram_jaccard(a, b, 5), 0.7)
    # recall is LSH-bounded; precision is exact. Survivors can only differ
    # where LSH failed to surface a candidate pair.
    missed = set(want) - set(survivors)
    extra = set(survivors) - set(want)
    assert not missed  # never delete a doc the oracle keeps...
    assert len(extra) <= max(2, len(want) // 10)


@pytest.mark.usefixtures("ray_session")
def test_simhash_dedup_exact_copies_merge():
    df = corpus()
    ds = ray.data.from_pandas(df)
    survivors = set(simhash_dedup(ds, max_hamming=3).to_pandas()["doc_id"])
    exact_dups = set(df["doc_id"]) - set(
        df.sort_values("doc_id").drop_duplicates("text")["doc_id"])
    assert not exact_dups & survivors        # exact copies always hamming 0
    assert len(survivors) <= len(df)


def test_minhash_estimate_tracks_true_jaccard():
    mh = MinHasher(n_perm=128, k=5)
    a = "the quick brown fox jumps over the lazy dog " * 3
    b = "the quick brown fox jumps over the lazy cat " * 3
    c = "completely different content with no overlap at all xyz"
    true_ab = ngram_jaccard(a, b, 5)
    est_ab = MinHasher.jaccard_estimate(mh.signature(a), mh.signature(b))
    assert abs(true_ab - est_ab) < 0.15
    est_ac = MinHasher.jaccard_estimate(mh.signature(a), mh.signature(c))
    assert est_ac < 0.2


def test_simhash_hamming_properties():
    sh = simhash64(["aaaa bbbb cccc", "aaaa bbbb cccc", "zzzz yyyy xxxx"])
    assert hamming64(sh[:1], sh[1:2])[0] == 0          # identical text
    assert hamming64(sh[:1], sh[2:3])[0] > 10          # unrelated text


@pytest.mark.usefixtures("ray_session")
def test_distributed_components_equal_union_find():
    """connected_components_distributed must agree with driver union-find
    on an adversarial edge set: chains (where a pairwise min rule would
    diverge), a star, singleton pairs and a long path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from migration_pair_ray.stages.dedup import (
        connected_components, connected_components_distributed)

    rng = np.random.default_rng(8)
    edges = [(1, 3), (2, 3),                 # star-ish: min label must reach 2
             (10, 11), (11, 12), (12, 13),   # chain
             (20, 21)]                       # simple pair
    edges += [(100 + i, 100 + i + 1) for i in range(7)]  # path (several rounds)
    extra = rng.integers(200, 240, size=(25, 2))
    edges += [(int(a), int(b)) for a, b in extra if a != b]
    pairs = pa.table({
        "a": pa.array([min(e) for e in edges], pa.int64()),
        "b": pa.array([max(e) for e in edges], pa.int64()),
        "sim": pa.array([1.0] * len(edges)),
    })
    want = {r["doc_id"]: r["cluster"]
            for r in connected_components(rd.from_arrow(pairs)).take_all()}
    got = {r["doc_id"]: r["cluster"]
           for r in connected_components_distributed(rd.from_arrow(pairs)).take_all()}
    assert got == want
    # AUTO-ROUTE: a tiny driver_max_edges forces the same call through the
    # distributed fallback — output identical on both sides of the threshold
    routed = {r["doc_id"]: r["cluster"]
              for r in connected_components(rd.from_arrow(pairs),
                                            driver_max_edges=3).take_all()}
    assert routed == want


@pytest.mark.usefixtures("ray_session")
def test_minhash_join_verify_equals_broadcast_verify():
    """The fully-distributed hash-join verify path (the beyond-broadcast-
    ceiling regime) must produce the same verified pair set as the
    broadcast in-group verify."""
    from migration_pair_ray.stages.dedup import minhash_candidate_pairs

    df = corpus()
    ds = ray.data.from_pandas(df)

    def pairset(verify):
        rows = minhash_candidate_pairs(
            ray.data.from_pandas(df), threshold=0.7, verify=verify).take_all()
        return {(r["a"], r["b"]) for r in rows}

    assert pairset("join") == pairset("broadcast")
    # and survivors agree end to end
    b = sorted(minhash_lsh_dedup(ds, threshold=0.7).to_pandas()["doc_id"])
    j = sorted(minhash_lsh_dedup(ray.data.from_pandas(df), threshold=0.7,
                                 verify="join").to_pandas()["doc_id"])
    assert b == j
    # verify="auto" flips on the sketch count: a tiny ceiling forces the
    # distributed join path, the default keeps broadcast — survivors are
    # identical either way (the operator never picks a mode by hand)
    auto_small = sorted(minhash_lsh_dedup(
        ray.data.from_pandas(df), threshold=0.7, verify="auto",
        broadcast_ceiling_docs=1).to_pandas()["doc_id"])
    auto_big = sorted(minhash_lsh_dedup(
        ray.data.from_pandas(df), threshold=0.7,
        verify="auto").to_pandas()["doc_id"])
    assert auto_small == auto_big == b


@pytest.mark.usefixtures("ray_session")
def test_adversarial_dup_rate_routes_distributed():
    """50% duplicate rate (every doc has an exact copy): the pair set is
    large relative to the corpus, the auto-route threshold trips, and the
    dedup still returns exactly the unique originals — no driver-memory
    dependence on the edge count."""
    from unittest import mock

    import migration_pair_ray.stages.dedup as dd

    rng = np.random.default_rng(13)
    words = ["red", "green", "blue", "cyan", "teal", "plum", "gold", "jade"]
    base = [" ".join(rng.choice(words, size=25)) + f" uniq{u}" for u in range(30)]
    df = pd.DataFrame(
        [{"doc_id": i, "text": t} for i, t in enumerate(base)]
        + [{"doc_id": 1000 + i, "text": t} for i, t in enumerate(base)])
    ds = ray.data.from_pandas(df)

    calls = {"distributed": 0}
    real = dd.connected_components_distributed

    def spy(pairs, **kw):
        calls["distributed"] += 1
        return real(pairs, **kw)

    with mock.patch.object(dd, "connected_components_distributed", spy):
        survivors = sorted(
            dd.minhash_lsh_dedup(ds, threshold=0.9).to_pandas()["doc_id"])
    # threshold default is 2M edges — far above this corpus; force the
    # route by calling CC directly with a tiny cap on the same pair shape
    assert survivors == sorted(range(30))
    pairs = dd.minhash_candidate_pairs(ds, threshold=0.9)
    with mock.patch.object(dd, "connected_components_distributed", spy):
        clusters = dd.connected_components(pairs, driver_max_edges=5)
        losers = {r["doc_id"] for r in clusters.take_all()
                  if r["doc_id"] != r["cluster"]}
    assert calls["distributed"] == 1
    assert losers == {1000 + i for i in range(30)}


@pytest.mark.usefixtures("ray_session")
def test_minhash_exchange_carries_no_signatures():
    """Design-property regression guard: the LSH exchange must carry ONLY
    (coarse, band_hash, doc_id) — if signatures ever ride the shuffle
    again, the per-row byte size blows past this bound (the round-2 layout
    measured ~530 B/row; the slim layout ~20 B/row + block overhead)."""
    import re
    from migration_pair_ray.stages.dedup import minhash_candidate_pairs

    df = corpus(n_uniq=80)
    ds = ray.data.from_pandas(df)
    pairs = minhash_candidate_pairs(ds, threshold=0.7).materialize()
    stats = pairs.stats()
    # the Sort operator's input == the exchanged band rows; parse its
    # total output bytes and row count from ds.stats()
    m = re.search(r"Operator \d+ Sort:.*?(?:\n.*?)*?bytes per block:.*?(\d+) total",
                  stats)
    assert m, stats
    total_bytes = int(m.group(1))
    n_band_rows = len(df) * 16
    per_row = total_bytes / n_band_rows
    assert per_row < 60, f"exchange carries {per_row:.0f} B/band-row — " \
                         f"signature payload has crept back into the shuffle"


@pytest.mark.usefixtures("ray_session")
def test_span_exact_dedup_crafted():
    """Cross-doc duplicate spans die, in-doc order survives, a doc whose
    every span was seen earlier vanishes entirely."""
    from migration_pair_ray.stages.dedup import span_exact_dedup
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "a b c d e f",       # spans (w=2): "a b" "c d" "e f"
            "c d x y a b",       # "c d" dup, "x y" new, "a b" dup
            "e f c d",           # all spans already seen -> vanishes
        ]),
    })
    ds = ray.data.from_arrow(docs).repartition(3)
    got = (span_exact_dedup(ds, "text", "doc_id", span_words=2)
           .sort("doc_id").to_pandas())
    assert got["doc_id"].tolist() == [0, 1]
    assert got["text_dedup"].tolist() == ["a b c d e f", "x y"]
    assert got["n_rows"].tolist() == [3, 1]


@pytest.mark.usefixtures("ray_session")
def test_explode_spans_offsets():
    from migration_pair_ray.stages.dedup import explode_spans
    t = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                  "text": pa.array(["w1 w2 w3", "u1"])})
    s = explode_spans(t, "doc_id", "text", span_words=2)
    assert s.column("doc_id").to_pylist() == [7, 7, 8]
    assert s.column("span_idx").to_pylist() == [0, 1, 0]
    assert s.column("span").to_pylist() == ["w1 w2", "w3", "u1"]


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_incremental(tmp_path):
    """Incremental dedup against a persisted fingerprint index equals
    full exact_dedup restricted to the new batch; re-running the same
    tag is idempotent (probes the pre-append state); a later batch sees
    the earlier batch's appends."""
    from migration_pair_ray.stages.dedup import (build_fingerprint_index,
                                                 exact_dedup_incremental)
    df = corpus(n_uniq=40)
    half = len(df) // 2
    old, new = df.iloc[:half], df.iloc[half:]
    idx = str(tmp_path / "fp_idx")
    build_fingerprint_index(ray.data.from_pandas(old.reset_index(drop=True)),
                            idx, num_buckets=8)
    got = sorted(exact_dedup_incremental(
        ray.data.from_pandas(new.reset_index(drop=True)), idx,
        tag="b1").to_pandas()["doc_id"])
    # oracle: full exact dedup over old+new, survivors restricted to new
    full = df.sort_values("doc_id").drop_duplicates("text")
    want = sorted(full[full["doc_id"] >= new["doc_id"].min()]["doc_id"])
    assert got == want
    # idempotent re-run of the same tag
    again = sorted(exact_dedup_incremental(
        ray.data.from_pandas(new.reset_index(drop=True)), idx,
        tag="b1").to_pandas()["doc_id"])
    assert again == got
    # a later batch that repeats batch-1 content is fully deduped, and a
    # genuinely new text survives
    b2 = pd.DataFrame({"doc_id": [10_000, 10_001],
                       "text": [new.iloc[0]["text"], "entirely new text"]})
    got2 = sorted(exact_dedup_incremental(
        ray.data.from_pandas(b2), idx, tag="b2").to_pandas()["doc_id"])
    assert got2 == [10_001]


@pytest.mark.usefixtures("ray_session")
def test_fingerprint_index_compaction(tmp_path):
    """Compacting append segments into base changes no membership
    decision: a batch replayed against the compacted index dedups
    identically, and the appends are gone."""
    import glob
    from migration_pair_ray.stages.dedup import (build_fingerprint_index,
                                                 compact_fingerprint_index,
                                                 exact_dedup_incremental)
    df = corpus(n_uniq=30)
    half = len(df) // 2
    idx = str(tmp_path / "fp_idx")
    build_fingerprint_index(
        ray.data.from_pandas(df.iloc[:half].reset_index(drop=True)),
        idx, num_buckets=4)
    new = df.iloc[half:].reset_index(drop=True)
    got1 = sorted(exact_dedup_incremental(
        ray.data.from_pandas(new), idx, tag="b1").to_pandas()["doc_id"])
    assert glob.glob(f"{idx}/bucket=*/append-b1.parquet")
    n = compact_fingerprint_index(idx)
    assert n >= 1
    assert not glob.glob(f"{idx}/bucket=*/append-*.parquet")
    # probe a batch repeating b1 content + one new text: identical logic
    b2 = pd.DataFrame({"doc_id": [20_000, 20_001],
                       "text": [new.iloc[0]["text"], "brand new words"]})
    got2 = sorted(exact_dedup_incremental(
        ray.data.from_pandas(b2), idx, tag="b2").to_pandas()["doc_id"])
    assert got2 == [20_001]
    # compaction FINALIZES b1: its prints are in base now, so a re-run
    # can no longer exclude its own appends — zero survivors (documented)
    again = exact_dedup_incremental(ray.data.from_pandas(new), idx,
                                    tag="b1")
    assert again.count() == 0
