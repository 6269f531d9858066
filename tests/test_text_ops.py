"""Text-analysis operator tests over the driver testdata documents table."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from migration_pair_ray.functions.text import (
    LangId,
    add_token_count,
    md5_fingerprint,
    quality_features,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(f"{SF}/documents.parquet")


@pytest.mark.usefixtures("ray_session")
def test_token_count_matches_sql_formula(docs_table):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = (ds.map_batches(add_token_count, batch_format="pyarrow")
             .select_columns(["doc_id", "n_tokens"]).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    want = duckdb.sql(f"""
        SELECT doc_id, CASE WHEN text IS NULL OR length(text)=0 THEN 0
               ELSE length(text) - length(replace(text,' ','')) + 1 END AS n_tokens
        FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quality_features_deterministic(docs_table):
    out = quality_features(docs_table)
    out2 = quality_features(docs_table)
    assert out.equals(out2)
    d = out.to_pylist()[0]
    assert d["n_tokens"] > 0 and 0 <= d["stop_ratio"] <= 1
    assert 0 <= d["quality_score"] <= 1.0


def test_md5_fingerprint_matches_duckdb(docs_table):
    got = md5_fingerprint(docs_table.slice(0, 50)).select(["doc_id", "fp"]).to_pandas()
    want = duckdb.sql(f"""
        SELECT doc_id, md5(text) AS fp FROM read_parquet('{SF}/documents.parquet')
        ORDER BY doc_id LIMIT 50""").df()
    pd.testing.assert_frame_equal(got, want)


def test_langid_actor_stage_smoke(docs_table):
    # smoke the class directly (actor __init__ failures surface late in Ray)
    stage = LangId()
    out = stage(docs_table.slice(0, 100))
    preds = out.column("lang_pred").to_pylist()
    assert len(preds) == 100 and all(isinstance(p, str) for p in preds)
    # the corpus is synthetic word-salad, so accuracy is not asserted —
    # but 'en' docs containing real stopwords should mostly hit 'en'
    en = out.filter(pa.compute.equal(out.column("lang"), "en"))
    en_acc = np.mean(np.array(en.column("lang_pred").to_pylist()) == "en")
    assert en_acc > 0.5


def test_bpe_token_count_granularity():
    import pyarrow as pa
    from migration_pair_ray.functions.text import bpe_token_count

    col = pa.array(["hello world", "a1b2", "don't stop!", "你好吗", "", None])
    got = bpe_token_count(col).to_pylist()
    # hello|world; a|1|b|2; don|'|t|stop|!; 你|好|吗 (one rune each); 0; 0
    assert got == [2, 4, 5, 3, 0, 0]


def test_redact_patterns_ordered_counts():
    from migration_pair_ray.functions.text import redact_patterns

    col = pa.array(["mail me at bob42@x.io or 555-1234",
                    "no pii here", None, "a@b.co c@d.org 7"])
    red, (n_email, n_num) = redact_patterns(
        col, [(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
              (r"[0-9]+", "<NUM>")])
    assert red.to_pylist() == [
        "mail me at <EMAIL> or <NUM>-<NUM>", "no pii here", None,
        "<EMAIL> <EMAIL> <NUM>"]
    assert n_email.to_pylist() == [1, 0, None, 2]
    # digit counts are taken AFTER the email scrub (42 inside the address
    # must not count) — the nested-regexp_replace SQL semantics
    assert n_num.to_pylist() == [2, 0, None, 1]


def test_extract_int_field_null_on_miss():
    from migration_pair_ray.functions.text import extract_int_field

    col = pa.array(['{"k": 17, "s": "x"}', '{"s": "no k"}', None, '{"k": 0}'])
    got = extract_int_field(col, r'"k": ([0-9]+)')
    assert got.to_pylist() == [17, None, None, 0]
    assert got.type == pa.int64()
