"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in migration_pair_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: CDC replay of the change log derived from the
    sf0.001 events table through the full engine (normalize → partial LWW
    reduce → hash partition → actor-pool merge → manifest commit), then the
    visible final state in stable (conv_id, turn_idx) order."""
    from migration_pair_ray.pipelines.queries import cdc_lww_merge
    return cdc_lww_merge("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from migration_pair_ray.pipelines import queries as q
    return {
        # The harness records correctness for the FIRST 50 entries only —
        # this prefix is a breadth-first sample: CDC lifecycle, every join
        # flavor, windows/sessions, aggregates/analytic, the full dedup
        # family, text/training ops, embeddings, media, sketches, CSV.
        "cdc_lww_merge": q.cdc_lww_merge,
        "cdc_two_phase_replay": q.cdc_two_phase_replay,
        "cdc_multi_source": q.cdc_multi_source,
        "cdc_hot_layout": q.cdc_hot_layout,
        "cdc_mor_replay": q.cdc_mor_replay,
        "cdc_cell_replay": q.cdc_cell_replay,
        "cdc_patch_merge": q.cdc_patch_merge,
        "cdc_time_travel": q.cdc_time_travel,
        "cdc_rollback": q.cdc_rollback,
        "cdc_point_lookup": q.cdc_point_lookup,
        "cdc_conv_fetch": q.cdc_conv_fetch,
        "cdc_find_by_tool": q.cdc_find_by_tool,
        "cdc_feed_resume": q.cdc_feed_resume,
        "cdc_replica": q.cdc_replica,
        "cdc_refill": q.cdc_refill,
        "cdc_delete_where": q.cdc_delete_where,
        "cdc_txn_boundary": q.cdc_txn_boundary,
        "cdc_snapshot_unix_ms": q.cdc_snapshot_unix_ms,
        "cdc_changefeed": q.cdc_changefeed,
        "cdc_incremental_agg": q.cdc_incremental_agg,
        "cdc_quarantine_stats": q.cdc_quarantine_stats,
        "cdc_state_diff": q.cdc_state_diff,
        "cdc_schema_gate": q.cdc_schema_gate,
        "cdc_lineage_totals": q.cdc_lineage_totals,
        "join_orders_customer_segment": q.join_orders_customer_segment,
        "join_orders_lineitem_priority": q.join_orders_lineitem_priority,
        "join_customer_orders_semi": q.join_customer_orders_semi,
        "join_customer_orders_anti": q.join_customer_orders_anti,
        "join_events_orders_asof": q.join_events_orders_asof,
        "join_events_orders_range": q.join_events_orders_range,
        "events_hourly_windows": q.events_hourly_windows,
        "events_sessionize": q.events_sessionize,
        "events_sliding_windows": q.events_sliding_windows,
        "events_late_data": q.events_late_data,
        "agg_pricing_summary": q.agg_pricing_summary,
        "topk_orders_by_price": q.topk_orders_by_price,
        "distinct_event_types": q.distinct_event_types,
        "topn_orders_per_customer": q.topn_orders_per_customer,
        "events_type_pivot": q.events_type_pivot,
        "doc_exact_dedup": q.doc_exact_dedup,
        "doc_near_dedup_minhash": q.doc_near_dedup_minhash,
        "embed_near_dedup": q.embed_near_dedup,
        "doc_dedup_incremental": q.doc_dedup_incremental,
        "doc_langid": q.doc_langid,
        "doc_token_stats_bpe": q.doc_token_stats_bpe,
        "doc_quality": q.doc_quality,
        "events_csv_roundtrip": q.events_csv_roundtrip,
        "conv_transcripts": q.conv_transcripts,
        "corpus_curation": q.corpus_curation,
        "training_prep": q.training_prep,
        # ---- end of the recorded-50 prefix (all entries below are
        # equally oracle-backed; pytest + cold rehearsals cover them) ----
        "cdc_replica_repair": q.cdc_replica_repair,
        "cdc_replica_bootstrap": q.cdc_replica_bootstrap,
        "join_orders_customer_left": q.join_orders_customer_left,
        "events_session_windows": q.events_session_windows,
        "doc_near_dedup_simhash": q.doc_near_dedup_simhash,
        "doc_near_dedup_ngram": q.doc_near_dedup_ngram,
        "embed_topk_bruteforce": q.embed_topk_bruteforce,
        "embed_knn_ivf": q.embed_knn_ivf,
        "media_features": q.media_features,
        "events_approx_distinct": q.events_approx_distinct,
        "cdc_hotspots": q.cdc_hotspots,
        "cdc_wire_forms": q.cdc_wire_forms,
        "cdc_ttl_expiry": q.cdc_ttl_expiry,
        "cdc_replica_verify": q.cdc_replica_verify,
        "cdc_jsonl_ingest": q.cdc_jsonl_ingest,
        "cdc_log_compaction": q.cdc_log_compaction,
        "cdc_tombstone_keys": q.cdc_tombstone_keys,
        "cdc_changelog_stats": q.cdc_changelog_stats,
        "cdc_snapshot_incremental": q.cdc_snapshot_incremental,
        "cdc_snapshot_jsonl": q.cdc_snapshot_jsonl,
        "cdc_turn_versions": q.cdc_turn_versions,
        "cdc_state_asof": q.cdc_state_asof,
        "cdc_clone_branch": q.cdc_clone_branch,
        "cdc_branch_merge": q.cdc_branch_merge,
        "cdc_view_maintain": q.cdc_view_maintain,
        "cdc_jsonl_roundtrip": q.cdc_jsonl_roundtrip,
        "cdc_snapshot_diff": q.cdc_snapshot_diff,
        "cdc_stale_updates": q.cdc_stale_updates,
        "events_value_outliers": q.events_value_outliers,
        "events_funnel": q.events_funnel,
        "events_retention_cohorts": q.events_retention_cohorts,
        "events_value_moments": q.events_value_moments,
        "events_type_drift": q.events_type_drift,
        "conv_near_dup": q.conv_near_dup,
        "conv_token_packing": q.conv_token_packing,
        "conv_repeated_turns": q.conv_repeated_turns,
        "conv_context_windows": q.conv_context_windows,
        "conv_tool_stats": q.conv_tool_stats,
        "conv_role_violations": q.conv_role_violations,
        "conv_role_transitions": q.conv_role_transitions,
        "conv_template_turns": q.conv_template_turns,
        "agg_rollup_pricing": q.agg_rollup_pricing,
        "filter_highvalue_orders": q.filter_highvalue_orders,
        "join_lineitem_part_type": q.join_lineitem_part_type,
        "events_hot_users": q.events_hot_users,
        "join_urgent_lineitems": q.join_urgent_lineitems,
        "join_events_orders_salted": q.join_events_orders_salted,
        "orders_running_revenue": q.orders_running_revenue,
        "events_value_quantiles": q.events_value_quantiles,
        "events_type_quantiles": q.events_type_quantiles,
        "events_type_transitions": q.events_type_transitions,
        "conv_turn_gaps": q.conv_turn_gaps,
        "lineitem_price_bands": q.lineitem_price_bands,
        "doc_token_stats": q.doc_token_stats,
        "doc_fingerprints": q.doc_fingerprints,
        "doc_fingerprints_rolling": q.doc_fingerprints_rolling,
        "doc_span_dedup": q.doc_span_dedup,
        "corpus_union_dedup": q.corpus_union_dedup,
        "doc_near_dup_probe": q.doc_near_dup_probe,
        "doc_bigram_typicality": q.doc_bigram_typicality,
        "join_customer_orders_full": q.join_customer_orders_full,
        "doc_split_leakage": q.doc_split_leakage,
        "doc_dup_clusters": q.doc_dup_clusters,
        "doc_dedup_by_quality": q.doc_dedup_by_quality,
        "doc_pack_bins": q.doc_pack_bins,
        "doc_decontaminate": q.doc_decontaminate,
        "doc_chunk_windows": q.doc_chunk_windows,
        "doc_term_freq": q.doc_term_freq,
        "doc_normalize": q.doc_normalize,
        "doc_repetition": q.doc_repetition,
        "doc_tfidf_top": q.doc_tfidf_top,
        "doc_quality_gate": q.doc_quality_gate,
        "doc_model_gate": q.doc_model_gate,
        "embed_quantize": q.embed_quantize,
        "events_value_stats": q.events_value_stats,
        "events_user_cm_counts": q.events_user_cm_counts,
        "events_type_approx_users": q.events_type_approx_users,
        "events_heavy_users": q.events_heavy_users,
        "events_sample_hash": q.events_sample_hash,
        "doc_shuffle_shards": q.doc_shuffle_shards,
        "events_stratified_sample": q.events_stratified_sample,
        "corpus_mixture": q.corpus_mixture,
        "orders_range_shards": q.orders_range_shards,
        "conv_split_assign": q.conv_split_assign,
        "events_redact_pii": q.events_redact_pii,
        "events_props_extract": q.events_props_extract,
        "embed_label_centroids": q.embed_label_centroids,
        "embed_knn_ivf_incremental": q.embed_knn_ivf_incremental,
        "embed_knn_hnsw": q.embed_knn_hnsw,
        "doc_decontaminate_join": q.doc_decontaminate_join,
        "doc_tfidf_top_join": q.doc_tfidf_top_join,
        "cdc_changefeed_join": q.cdc_changefeed_join,
        "media_byte_stats": q.media_byte_stats_q,
        "media_frame_stats": q.media_frame_stats,
    }


# FROZEN langid scoring SQL (generated once from functions.text.LangId's
# profiles, then frozen): shared by the doc_langid oracle and the composed
# corpus_curation oracle.  Being a literal makes the oracles independent of
# the code under test — profile/scoring drift FAILS the check.
_LANGID_SCORED_CTES = """padded AS (
          SELECT doc_id, lang, ' ' || COALESCE(text, '') || ' ' AS p
          FROM documents),
        scored AS (SELECT doc_id, lang, CAST((length(p) - length(replace(p, ' the ', ''))) / 5 + (length(p) - length(replace(p, ' and ', ''))) / 5 + (length(p) - length(replace(p, ' of ', ''))) / 4 + (length(p) - length(replace(p, ' to ', ''))) / 4 + (length(p) - length(replace(p, ' is ', ''))) / 4 AS BIGINT) AS s_en, CAST((length(p) - length(replace(p, ' der ', ''))) / 5 + (length(p) - length(replace(p, ' und ', ''))) / 5 + (length(p) - length(replace(p, ' die ', ''))) / 5 + (length(p) - length(replace(p, ' ist ', ''))) / 5 + (length(p) - length(replace(p, ' das ', ''))) / 5 AS BIGINT) AS s_de, CAST((length(p) - length(replace(p, ' le ', ''))) / 4 + (length(p) - length(replace(p, ' la ', ''))) / 4 + (length(p) - length(replace(p, ' et ', ''))) / 4 + (length(p) - length(replace(p, ' les ', ''))) / 5 + (length(p) - length(replace(p, ' est ', ''))) / 5 AS BIGINT) AS s_fr, CAST((length(p) - length(replace(p, ' el ', ''))) / 4 + (length(p) - length(replace(p, ' la ', ''))) / 4 + (length(p) - length(replace(p, ' los ', ''))) / 5 + (length(p) - length(replace(p, ' es ', ''))) / 4 + (length(p) - length(replace(p, ' y ', ''))) / 3 AS BIGINT) AS s_es, CAST((length(p) - length(replace(p, '的', ''))) / 1 + (length(p) - length(replace(p, '是', ''))) / 1 + (length(p) - length(replace(p, '了', ''))) / 1 + (length(p) - length(replace(p, '在', ''))) / 1 + (length(p) - length(replace(p, '我', ''))) / 1 AS BIGINT) AS s_zh FROM padded)"""

_LANGID_PRED_CASE = """CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 AND s_zh = 0 THEN 'und' WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en' WHEN s_de >= s_en AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de' WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr' WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es' WHEN s_zh >= s_en AND s_zh >= s_de AND s_zh >= s_fr AND s_zh >= s_es THEN 'zh' END"""


def _langid_oracle() -> str:
    return f"""
        WITH {_LANGID_SCORED_CTES}
        SELECT doc_id, lang, {_LANGID_PRED_CASE} AS lang_pred
        FROM scored ORDER BY doc_id"""


def _corpus_curation_oracle(min_tokens: int = 25, threshold: float = 0.8) -> str:
    """Composed-pipeline oracle: frozen langid scoring -> token-count
    quality gate -> exact dedup (min doc_id per text) -> exact 5-gram
    Jaccard near-dedup with recursive-CTE components among the SURVIVORS
    -> per-language stats.  Mirrors queries.corpus_curation stage for
    stage."""
    return f"""
        WITH RECURSIVE {_LANGID_SCORED_CTES},
        pred AS (SELECT doc_id, {_LANGID_PRED_CASE} AS lang_pred FROM scored),
        base AS (SELECT d.doc_id, d.text, p.lang_pred,
                        CASE WHEN d.text IS NULL OR length(d.text) = 0 THEN 0
                             ELSE length(d.text) - length(replace(d.text, ' ', '')) + 1
                        END AS n_tokens
                 FROM documents d JOIN pred p USING (doc_id)),
        q AS (SELECT * FROM base WHERE n_tokens >= {min_tokens}),
        ex AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text),
        surv AS (SELECT q.* FROM q JOIN ex USING (doc_id)),
        nums AS (SELECT i FROM range(1, 2000) t(i)),
        sh AS (SELECT DISTINCT s0.doc_id, substr(COALESCE(s0.text,''), i, 5) AS s
               FROM surv s0 JOIN nums
                 ON i <= GREATEST(length(COALESCE(s0.text,'')) - 4, 1)),
        sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id ai, b.doc_id bi, COUNT(*) c
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        pairs AS (SELECT ai, bi FROM inter
                  JOIN sz x ON x.doc_id = ai JOIN sz y ON y.doc_id = bi
                  WHERE c * 1.0 / (x.n + y.n - c) >= {threshold}),
        edges AS (SELECT ai a, bi b FROM pairs
                  UNION ALL SELECT bi, ai FROM pairs),
        cc(id, lbl) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.id
        ),
        losers AS (SELECT id FROM
                   (SELECT id, MIN(lbl) AS root FROM cc GROUP BY id)
                   WHERE root < id),
        final AS (SELECT * FROM surv
                  WHERE doc_id NOT IN (SELECT id FROM losers))
        SELECT lang_pred, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               COUNT(*) AS n_docs
        FROM final GROUP BY lang_pred ORDER BY lang_pred"""


def _jaccard_dedup_oracle(threshold: float) -> str:
    """Exact 5-gram-Jaccard near-dedup with TRUE connected components
    (recursive min-label CTE — a pairwise NOT EXISTS would diverge from
    union-find on path-shaped clusters).  Safe as an oracle for both the
    exact-jaccard engine path and the seeded minhash path because the
    corpus's pair-similarity distribution is bimodal around the threshold
    (no pair between 0.36 and 0.92 at sf0.01)."""
    return f"""
        WITH RECURSIVE nums AS (SELECT i FROM range(1, 2000) t(i)),
        sh AS (
          SELECT DISTINCT doc_id, substr(COALESCE(text,''), i, 5) AS s
          FROM documents JOIN nums
            ON i <= GREATEST(length(COALESCE(text,'')) - 4, 1)
        ),
        sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id ai, b.doc_id bi, COUNT(*) c
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        pairs AS (SELECT ai, bi FROM inter
                  JOIN sz x ON x.doc_id = ai JOIN sz y ON y.doc_id = bi
                  WHERE c * 1.0 / (x.n + y.n - c) >= {threshold}),
        edges AS (SELECT ai a, bi b FROM pairs
                  UNION ALL SELECT bi, ai FROM pairs),
        cc(id, lbl) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.id
        ),
        losers AS (SELECT id FROM
                   (SELECT id, MIN(lbl) AS root FROM cc GROUP BY id)
                   WHERE root < id)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id FROM losers)
        ORDER BY doc_id"""


def _simhash_dedup_oracle(max_hamming: int = 3) -> str:
    """Bit-exact SQL mirror of functions.hashing.simhash64 (k=4 byte
    shingles, polynomial rolling hash base 1099511628211 with uint64
    wraparound, multiplicity-weighted bit votes) — verified fingerprint-
    identical to the engine on the test corpora (ASCII text, so ord() ==
    utf-8 byte).  Pairs = exact 64-bit hamming ≤ max_hamming over ALL
    pairs; the engine's 16-bit-block bucketing finds exactly these by
    pigeonhole (3 differing bits cannot touch all 4 blocks).  Components
    via recursive min-label propagation, keep the minimum doc_id."""
    return f"""
        WITH RECURSIVE nums AS (SELECT i FROM range(1, 2000) t(i)),
        sh AS (
          SELECT doc_id,
            CAST((((((CAST(ord(substr(text,i,1)) AS HUGEINT) * 1099511628211
                + ord(substr(text,i+1,1))) % 18446744073709551616) * 1099511628211
                + ord(substr(text,i+2,1))) % 18446744073709551616) * 1099511628211
                + ord(substr(text,i+3,1))) % 18446744073709551616 AS UBIGINT) AS h
          FROM documents JOIN nums ON i <= length(text) - 3
        ),
        bb AS (SELECT CAST(i AS UBIGINT) AS bit FROM range(0, 64) t(i)),
        bits AS (
          SELECT doc_id, bit,
                 SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS votes
          FROM sh CROSS JOIN bb GROUP BY 1, 2
        ),
        fp AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN votes > 0
                          THEN CAST(1 AS HUGEINT) << CAST(bit AS INTEGER)
                          ELSE 0 END) AS UBIGINT) AS f
          FROM bits GROUP BY doc_id
        ),
        pairs AS (
          SELECT a.doc_id ai, b.doc_id bi
          FROM fp a JOIN fp b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.f, b.f)) <= {max_hamming}
        ),
        edges AS (SELECT ai a, bi b FROM pairs
                  UNION ALL SELECT bi, ai FROM pairs),
        cc(id, lbl) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.id
        ),
        losers AS (SELECT id FROM
                   (SELECT id, MIN(lbl) AS root FROM cc GROUP BY id)
                   WHERE root < id)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id FROM losers)
        ORDER BY doc_id"""


def _rolling_fp_oracle(k: int = 8) -> str:
    """Bit-exact mirror of the engine's k-byte polynomial rolling-hash
    fingerprint (functions/hashing._batch_shingles, base 1099511628211,
    uint64 wraparound): per doc, the MINIMUM rolling hash — the winnowing
    anchor.  ``ord(substr(...))`` == utf-8 byte because the documents
    corpus is pure ASCII (verified: octet_length == length for every row;
    same precondition the simhash oracle relies on), and every doc is
    longer than k so the short-doc zero-padding branch never fires."""
    b, m = 1099511628211, 1 << 64
    expr = "CAST(ord(substr(text, i, 1)) AS HUGEINT)"
    for j in range(1, k):
        expr = f"(({expr}) * {b} + ord(substr(text, i+{j}, 1))) % {m}"
    return f"""
        WITH nums AS (SELECT i FROM range(1, 3000) t(i)),
        sh AS (
          SELECT doc_id, CAST({expr} AS UBIGINT) AS h
          FROM documents JOIN nums ON i <= length(text) - {k - 1}
        )
        SELECT doc_id, MIN(h) AS rfp FROM sh GROUP BY doc_id
        ORDER BY doc_id"""


# quality-feature CTE shared by the doc_model_gate oracle (same guarded
# substring-count stop_hits expression the doc_quality oracle inlines)
_QFEAT_CTE = """f AS (SELECT doc_id,
        length(COALESCE(text, '')) AS n_chars,
        CASE WHEN text IS NULL OR length(text) = 0 THEN 0
             ELSE length(text) - length(replace(text, ' ', '')) + 1
        END AS n_tokens,
        CAST(
          (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' the ', ''))) / 5
        + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' a ', ''))) / 3
        + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' and ', ''))) / 5
        + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' of ', ''))) / 4
        + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' to ', ''))) / 4
        + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' in ', ''))) / 4
        + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' is ', ''))) / 4
        + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' it ', ''))) / 4
        AS BIGINT) AS stop_hits
      FROM documents)"""


def oracle_sql() -> dict[str, str]:
    from migration_pair_ray.pipelines.queries import DERIVED_CHANGES_SQL

    lww_winners = f"""
    WITH ch AS ({DERIVED_CHANGES_SQL}),
    w AS (SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) rn
          FROM ch)
    """

    out = {
        "cdc_lww_merge": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        "cdc_replica_bootstrap": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # sharded ingest via lsn-parity split + namespaced merge is EXACT:
        # global_lsn reconstructs the original offset, so the merged lake
        # equals the plain single-log winners
        "cdc_multi_source": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        "cdc_two_phase_replay": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # disaster recovery: a dropped partition rebuilt from the retained
        # change log equals the plain winners
        "cdc_refill": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # whale probe: top-5 convs by visible key count, total order
        # (n_rows desc, conv_id asc) makes the LIMIT boundary exact
        "cdc_hotspots": lww_winners + """
            SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM w WHERE rn = 1 AND op <> 'D'
            GROUP BY conv_id
            ORDER BY n_rows DESC, conv_id LIMIT 5""",
        # layout never changes semantics: the hot-mode lake (whale convs
        # salted per-key, everything else conv-disjoint) equals the plain
        # winners bit for bit
        "cdc_hot_layout": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # incremental per-partition export read back == visible winners
        "cdc_snapshot_incremental": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # follower lake under a different layout converges to the same
        # visible winners as the source
        "cdc_replica": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # a diverged follower (rogue ghost keys) repaired back onto the
        # source equals the plain winners — the ghosts must be gone
        "cdc_replica_repair": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # JSONL export -> re-ingest round-trip: ts_us on the wire keeps
        # microsecond fidelity, so the follower equals the plain winners
        "cdc_jsonl_roundtrip": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # consumer acked pass 1 → resume delivers exactly the pass-2
        # change events (lsn >= the two-phase cut)
        "cdc_feed_resume": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            cut AS (SELECT 2 * CAST(CEIL(COUNT(*) / 4.0) AS BIGINT) AS c
                    FROM events)
            SELECT conv_id, turn_idx, role, text, tool, ts, op, lsn
            FROM ch, cut WHERE lsn >= cut.c ORDER BY lsn""",
        # merge-on-read ingest must be read-invisible: folded base+delta
        # view == the same copy-on-write winners
        "cdc_mor_replay": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # compaction must be lossless: replaying [compacted prefix + tail]
        # equals the full uncompacted replay
        "cdc_log_compaction": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # time travel: the lake as of the FIRST retained pass = LWW winners
        # over the lsn prefix files 0-1 own (cut = 2*ceil(n/4), the same
        # file split every two-pass fixture uses)
        "cdc_time_travel": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            cut AS (SELECT 2 * CAST(CEIL(COUNT(*) / 4.0) AS BIGINT) AS c
                    FROM events),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn
                  FROM ch, cut WHERE lsn < cut.c)
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # rollback: passes were (files 0-1), (file 2), (file 3) with a
        # rollback to pass 1 between passes 2 and 3 — file 2's lsn range
        # is carved out, files 0, 1 and 3 win by LWW
        "cdc_rollback": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            cut AS (SELECT CAST(CEIL(COUNT(*) / 4.0) AS BIGINT) AS c
                    FROM events),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn
                  FROM ch, cut
                  WHERE lsn < 2 * cut.c OR lsn >= 3 * cut.c)
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # JSONL envelope ingestion: every event's ts traveled as epoch-ms,
        # so the oracle truncates ALL rows to ms before picking winners
        "cdc_jsonl_ingest": f"""
            WITH ch0 AS ({DERIVED_CHANGES_SQL}),
            ch AS (SELECT conv_id, turn_idx, role, text, tool,
                          epoch_ms(epoch_ms(ts)) AS ts, op, lsn FROM ch0),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn FROM ch)
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # targeted delete: winners whose role matched the predicate are
        # tombstoned through the CDC path; survivors = the complement
        "cdc_delete_where": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D' AND role <> 'purchase'
            ORDER BY conv_id, turn_idx""",
        # transactional consistency: only autocommit events (lsn%5==4)
        # and events of COMMITTED txns (t = lsn//7, committed iff
        # t%10 != 3) are ever applied; aborted txns stay held back
        "cdc_txn_boundary": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            tx AS (SELECT *, CASE WHEN lsn % 5 = 4 THEN NULL
                                  ELSE CAST(lsn // 7 AS BIGINT) END AS t
                   FROM ch),
            ev AS (SELECT * FROM tx WHERE t IS NULL OR (t % 10) <> 3),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn FROM ev)
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # branch merge: two diverged clones each fold the other's change
        # history back in — both converge (asserted in the query) to LWW
        # winners over original ∪ branch-A ∪ branch-B
        "cdc_branch_merge": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            bra AS (SELECT 'c7' AS conv_id, CAST(t.i AS INTEGER) AS turn_idx,
                           'branch' AS role, 'merged-a' AS text,
                           CAST(NULL AS VARCHAR) AS tool,
                           TIMESTAMP '2025-01-01 00:00:00' AS ts,
                           'U' AS op,
                           (SELECT COUNT(*) FROM events) + 100 + t.i AS lsn
                    FROM range(8) t(i)),
            brb AS (SELECT 'c9' AS conv_id, CAST(t.i AS INTEGER) AS turn_idx,
                           'branch' AS role, 'merged-b' AS text,
                           CAST(NULL AS VARCHAR) AS tool,
                           TIMESTAMP '2025-01-01 00:00:00' AS ts,
                           'U' AS op,
                           (SELECT COUNT(*) FROM events) + 200 + t.i AS lsn
                    FROM range(8) t(i)),
            a AS (SELECT * FROM ch UNION ALL SELECT * FROM bra
                  UNION ALL SELECT * FROM brb),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn FROM a)
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # maintained view: delta-rewrite (keep=click ⇒ reshaped event,
        # else tombstone at the same ts/lsn) preserves LWW order, so view
        # winners == transform(source winners)
        "cdc_view_maintain": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            tr AS (SELECT conv_id, turn_idx, role, upper(text) AS text,
                          tool, ts,
                          CASE WHEN op = 'D' THEN 'D'
                               WHEN role = 'click' THEN op
                               ELSE 'D' END AS op, lsn
                   FROM ch),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn FROM tr)
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # event-time retention: winners at or after the 2024-01-15 cutoff
        "cdc_ttl_expiry": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
              AND epoch_us(ts) >= 1705276800000000
            ORDER BY conv_id, turn_idx""",
        # replication audit: a healthy replica yields ZERO mismatched
        # key-space buckets (the negative path is pytest-verified)
        "cdc_replica_verify": """
            SELECT CAST(NULL AS INTEGER) AS bucket,
                   CAST(NULL AS BIGINT) AS src_rows,
                   CAST(NULL AS BIGINT) AS dst_rows,
                   CAST(NULL AS UBIGINT) AS src_sum,
                   CAST(NULL AS UBIGINT) AS dst_sum
            WHERE 1 = 0""",
        # wire forms: ts of the lsn prefix (file 0) traveled as unix-epoch
        # ms, so its sub-ms precision is truncated in BOTH engine and
        # oracle; turn_idx widening (int16 -> int32) is value-invisible
        "cdc_wire_forms": f"""
            WITH ch0 AS ({DERIVED_CHANGES_SQL}),
            cut AS (SELECT CAST(CEIL(COUNT(*) / 4.0) AS BIGINT) AS c
                    FROM events),
            ch AS (SELECT conv_id, turn_idx, role, text, tool,
                          CASE WHEN lsn < (SELECT c FROM cut)
                               THEN epoch_ms(epoch_ms(ts)) ELSE ts END AS ts,
                          op, lsn FROM ch0),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn FROM ch)
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # point lookup: LWW winners restricted to the three served keys
        # distributed pruned fetch == the same winners restriction
        "cdc_conv_fetch": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
              AND conv_id IN ('c1', 'c7', 'c23', 'c30')
            ORDER BY conv_id, turn_idx""",
        "cdc_point_lookup": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
              AND conv_id IN ('c0', 'c17', 'c42')
            ORDER BY conv_id, turn_idx""",
        # net effect of advancing from the files-0/1 checkpoint state to
        # the full-log state; cut = 2*ceil(n/4) is the lsn range files
        # 0-1 own (the engine links exactly those files into log_feed)
        "cdc_changefeed": lww_winners + """
            , cut AS (SELECT 2 * CAST(CEIL(COUNT(*) / 4.0) AS BIGINT) AS c
                      FROM events),
            wf AS (SELECT conv_id, turn_idx, role, text, tool, ts
                   FROM w WHERE rn = 1 AND op <> 'D'),
            wp AS (SELECT conv_id, turn_idx, role, text, tool, ts FROM (
                     SELECT *, row_number() OVER (
                        PARTITION BY conv_id, turn_idx
                        ORDER BY ts DESC, lsn DESC) rn2
                     FROM ch, cut WHERE lsn < cut.c)
                   WHERE rn2 = 1 AND op <> 'D'),
            j AS (SELECT COALESCE(a.conv_id, b.conv_id) AS conv_id,
                         COALESCE(a.turn_idx, b.turn_idx) AS turn_idx,
                         a.conv_id IS NULL AS ins,
                         b.conv_id IS NULL AS del,
                         a.text AS before_text, b.text AS after_text,
                         (a.text IS DISTINCT FROM b.text)
                         OR (a.role IS DISTINCT FROM b.role)
                         OR (a.tool IS DISTINCT FROM b.tool)
                         OR (a.ts IS DISTINCT FROM b.ts) AS differ
                  FROM wp a FULL OUTER JOIN wf b
                    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx)
            SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
                   CASE WHEN ins THEN 'insert' WHEN del THEN 'delete'
                        ELSE 'update' END AS change,
                   before_text, after_text
            FROM j WHERE ins OR del OR differ
            ORDER BY conv_id, turn_idx""",
        "cdc_tombstone_keys": lww_winners + """
            SELECT conv_id, turn_idx
            FROM w WHERE rn = 1 AND op = 'D'
            ORDER BY conv_id, turn_idx""",
        # IVM check: the incrementally-maintained view must equal the
        # from-scratch recomputation
        "cdc_incremental_agg": lww_winners + """
            SELECT conv_id, COUNT(*) AS n_turns
            FROM w WHERE rn = 1 AND op <> 'D'
            GROUP BY conv_id ORDER BY conv_id""",
        # transcript assembly: string_agg skips nulls, so both sides
        # filter null role/text explicitly (grouped_string_agg contract)
        "conv_transcripts": lww_winners + """
            SELECT conv_id,
                   string_agg(role || ': ' || text, chr(10)
                              ORDER BY turn_idx) AS transcript,
                   COUNT(*) AS n_turns
            FROM w
            WHERE rn = 1 AND op <> 'D'
              AND role IS NOT NULL AND text IS NOT NULL
            GROUP BY conv_id ORDER BY conv_id""",
        # transcript-grain near-dedup: the dedup decision is the EXACT
        # 5-gram Jaccard (the engine's LSH banding at rows-per-band=1 has
        # miss probability (1-j)^64 at the 0.5 threshold — negligible),
        # components via recursive min-label propagation on the NUMERIC
        # conv id (the engine's keep-min rule is numeric, and 'c10' < 'c2'
        # lexicographically would diverge)
        "conv_near_dup": f"""
            WITH RECURSIVE ch AS ({DERIVED_CHANGES_SQL}),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn FROM ch),
            tr AS (SELECT CAST(substr(conv_id, 2) AS BIGINT) AS did,
                          string_agg(role || ': ' || text, chr(10)
                                     ORDER BY turn_idx) AS t
                   FROM w WHERE rn = 1 AND op <> 'D'
                     AND role IS NOT NULL AND text IS NOT NULL
                   GROUP BY 1),
            nums AS (SELECT i FROM range(1, 60000) x(i)),
            sh AS (SELECT DISTINCT did, substr(t, i, 5) AS s
                   FROM tr JOIN nums
                     ON i <= GREATEST(length(t) - 4, 1)),
            sz AS (SELECT did, COUNT(*) n FROM sh GROUP BY 1),
            inter AS (SELECT a.did ai, b.did bi, COUNT(*) c
                      FROM sh a JOIN sh b ON a.s = b.s AND a.did < b.did
                      GROUP BY 1, 2),
            pairs AS (SELECT ai, bi FROM inter
                      JOIN sz x ON x.did = ai JOIN sz y ON y.did = bi
                      WHERE c * 1.0 / (x.n + y.n - c) >= 0.5),
            edges AS (SELECT ai a, bi b FROM pairs
                      UNION ALL SELECT bi, ai FROM pairs),
            cc(id, lbl) AS (
              SELECT a, a FROM edges
              UNION
              SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.id
            ),
            losers AS (SELECT id FROM
                       (SELECT id, MIN(lbl) AS root FROM cc GROUP BY id)
                       WHERE root < id)
            SELECT 'c' || CAST(did AS VARCHAR) AS conv_id,
                   CAST(length(t) AS BIGINT) AS n_chars
            FROM tr WHERE did NOT IN (SELECT id FROM losers)
            ORDER BY conv_id""",
        # repeats = turns minus distinct texts, per conversation
        "conv_repeated_turns": lww_winners + """
            SELECT conv_id,
                   COUNT(*) - COUNT(DISTINCT text) AS n_repeats,
                   COUNT(*) AS n_turns
            FROM w WHERE rn = 1 AND op <> 'D' AND text IS NOT NULL
            GROUP BY conv_id ORDER BY conv_id""",
        # transcript -> BPE-ish tokens -> 4096-token packs; the cumsum
        # window mirrors the distributed two-pass prefix scan
        "conv_token_packing": lww_winners + r"""
            , tr AS (SELECT CAST(substr(conv_id, 2) AS BIGINT) AS did,
                            string_agg(role || ': ' || text, chr(10)
                                       ORDER BY turn_idx) AS t
                     FROM w WHERE rn = 1 AND op <> 'D'
                       AND role IS NOT NULL AND text IS NOT NULL
                     GROUP BY 1),
            d AS (SELECT did,
                         len(regexp_extract_all(COALESCE(t, ''),
                             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]'))
                             AS n_tokens
                  FROM tr),
            o AS (SELECT did, n_tokens,
                         COALESCE(SUM(n_tokens) OVER (
                            ORDER BY did
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS off
                  FROM d)
            SELECT CAST(off // 4096 AS BIGINT) AS bin,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   COUNT(*) AS n_convs,
                   CAST(MIN(did) AS BIGINT) AS first_conv
            FROM o GROUP BY 1 ORDER BY 1""",
        # last-k context assembly: row_number over turn_idx DESC picks the
        # tail, string_agg re-joins it ascending (grouped_top_n contract)
        "conv_context_windows": lww_winners + """
            , s AS (SELECT conv_id, turn_idx, role, text
                    FROM w WHERE rn = 1 AND op <> 'D'
                      AND role IS NOT NULL AND text IS NOT NULL),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id ORDER BY turn_idx DESC) rk FROM s)
            SELECT conv_id,
                   string_agg(role || ': ' || text, chr(10)
                              ORDER BY turn_idx) AS context,
                   COUNT(*) AS n_context
            FROM r WHERE rk <= 8
            GROUP BY conv_id ORDER BY conv_id""",
        "conv_tool_stats": lww_winners + """
            , s AS (SELECT conv_id, text, tool, ts
                    FROM w WHERE rn = 1 AND op <> 'D')
            SELECT conv_id, COUNT(*) AS n_turns,
                   CAST(COUNT(tool) AS BIGINT) AS n_tool_calls,
                   CAST(COUNT(DISTINCT tool) AS BIGINT) AS n_tools,
                   CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS n_chars,
                   MAX(ts) AS last_ts
            FROM s GROUP BY conv_id ORDER BY conv_id""",
        # lag() shapes: transition bigrams and inter-turn gap latencies
        "events_type_transitions": """
            WITH l AS (SELECT event_type,
                              lag(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_type
                       FROM events)
            SELECT prev_type, event_type AS next_type, COUNT(*) AS n
            FROM l WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type ORDER BY prev_type, next_type""",
        # secondary-index probe == winners whose tool matches the values
        "cdc_find_by_tool": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D' AND tool IN ('w1', 'w3')
            ORDER BY conv_id, turn_idx""",
        # stale-update audit: events whose lsn exceeds their key's winner
        # lsn but lost LWW on event-time (winner = rn 1 under ts,lsn DESC)
        "cdc_stale_updates": lww_winners + """
            , win AS (SELECT conv_id, turn_idx, lsn AS wlsn
                      FROM w WHERE rn = 1)
            SELECT ch.op AS op, COUNT(*) AS n_events,
                   CAST(SUM(CASE WHEN ch.lsn > win.wlsn THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_stale
            FROM ch JOIN win USING (conv_id, turn_idx)
            GROUP BY ch.op ORDER BY ch.op""",
        "conv_role_transitions": lww_winners + """
            , s AS (SELECT conv_id, turn_idx, role
                    FROM w WHERE rn = 1 AND op <> 'D'),
            l AS (SELECT role, lead(role) OVER (
                    PARTITION BY conv_id ORDER BY turn_idx) AS next_role
                  FROM s)
            SELECT role, next_role, COUNT(*) AS n
            FROM l WHERE next_role IS NOT NULL
            GROUP BY role, next_role ORDER BY role, next_role""",
        "conv_turn_gaps": lww_winners + """
            , s AS (SELECT conv_id, turn_idx, ts
                    FROM w WHERE rn = 1 AND op <> 'D'),
            l AS (SELECT conv_id,
                         epoch_us(ts) - epoch_us(lag(ts) OVER (
                           PARTITION BY conv_id ORDER BY turn_idx))
                             AS gap_us
                  FROM s)
            SELECT conv_id, COUNT(gap_us) AS n_gaps,
                   MAX(gap_us) AS max_gap_us,
                   CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
            FROM l WHERE gap_us IS NOT NULL
            GROUP BY conv_id ORDER BY conv_id""",
        # split unit is the conversation (md5(conv_id) % 100 < 80), so no
        # conversation can straddle train/test
        "conv_split_assign": lww_winners + """
            , s AS (SELECT conv_id FROM w WHERE rn = 1 AND op <> 'D')
            SELECT conv_id,
                   CASE WHEN ('0x' || substr(md5(conv_id), 1, 16)
                             )::UBIGINT % 100 < 80
                        THEN 'train' ELSE 'test' END AS split,
                   COUNT(*) AS n_turns
            FROM s GROUP BY conv_id ORDER BY conv_id""",
        "cdc_changelog_stats": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL})
            SELECT op, COUNT(*) AS n, MIN(lsn) AS lsn_lo, MAX(lsn) AS lsn_hi
            FROM ch GROUP BY op ORDER BY op""",
        # ground truth the engine's manifests/lineage must agree with;
        # manifest row_count = ALL LWW winners (tombstone rows stay in
        # the lake as 'D' markers and are filtered at read time)
        "cdc_lineage_totals": lww_winners + """
            SELECT (SELECT COUNT(*) FROM w WHERE rn = 1) AS rows_state,
                   (SELECT COUNT(*) FROM w WHERE rn = 1 AND op = 'D')
                       AS tombstones,
                   (SELECT MIN(lsn) FROM ch) AS lsn_lo,
                   (SELECT MAX(lsn) FROM ch) AS lsn_hi""",
        "cdc_snapshot_unix_ms": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool,
                   epoch_ms(ts) AS ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        "cdc_snapshot_jsonl": lww_winners + """
            SELECT conv_id, turn_idx, role, text, tool,
                   epoch_ms(ts) AS ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # dead-letter routing: same corruption pattern, reasons with
        # null_key precedence, merged state excludes every reject
        "cdc_quarantine_stats": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            c2 AS (SELECT *, CASE WHEN lsn % 97 = 13 THEN 'null_key'
                                  WHEN lsn % 101 = 7 THEN 'bad_op'
                             END AS reason FROM ch),
            qc AS (SELECT reason, COUNT(*) AS n FROM c2
                   WHERE reason IS NOT NULL GROUP BY 1),
            good AS (SELECT * FROM c2 WHERE reason IS NULL),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn FROM good)
            SELECT reason, n FROM qc
            UNION ALL
            SELECT '_state_rows', COUNT(*) FROM w
            WHERE rn = 1 AND op <> 'D'
            ORDER BY reason""",
        # schema compliance gate (M5/A3, Tasks/EndToEnd.cs:51-85):
        # file{{i}} rows carry the REAL footer schemas of the 4-way
        # lsn-split change log (file 0 predates `tool`; row counts
        # recomputed here from the events table via per = ceil(n/4)),
        # synthetic rows pin the strict/evolve decision matrix
        # (wire int64 ts convertible; added column evolves; list<int64>
        # turn_idx aborts both modes)
        "cdc_schema_gate": """
            WITH p AS (SELECT COUNT(*) AS n,
                              CAST(CEIL(COUNT(*) / 4.0) AS BIGINT) AS per
                       FROM events),
            fc AS (SELECT 'file' || CAST(i AS VARCHAR) AS case_id,
                          CASE WHEN i = 0 THEN 'tool' ELSE '' END AS missing,
                          LEAST(per, n - i * per) AS source_rows
                   FROM range(0, 4) t(i), p),
            modes AS (SELECT 'strict' AS mode UNION ALL SELECT 'evolve'),
            fm AS (SELECT case_id, m.mode,
                          (missing = '' OR m.mode = 'evolve') AS compliant,
                          '' AS added, missing, '' AS mismatched,
                          CAST(0 AS BIGINT) AS mismatch_count, source_rows
                   FROM fc, modes m),
            syn(case_id, mode, compliant, added, missing, mismatched,
                mismatch_count, source_rows) AS (VALUES
              ('extra_col', 'evolve', TRUE, 'model', '', '',
               CAST(1 AS BIGINT), CAST(-1 AS BIGINT)),
              ('extra_col', 'strict', FALSE, 'model', '', '', 1, -1),
              ('incompatible', 'evolve', FALSE, '', '', 'turn_idx', 1, -1),
              ('incompatible', 'strict', FALSE, '', '', 'turn_idx', 1, -1),
              ('wire_unix_ms', 'evolve', TRUE, '', '', '', 0, -1),
              ('wire_unix_ms', 'strict', FALSE, '', '', 'ts', 1, -1))
            SELECT * FROM fm UNION ALL SELECT * FROM syn
            ORDER BY case_id, mode""",
        # point-in-time reconstruction: LWW winners over the change
        # prefix with ts <= cutoff (2024-01-15)
        "cdc_state_asof": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            f AS (SELECT * FROM ch
                  WHERE epoch_us(ts) <= 1705276800000000),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn FROM f)
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # cell-level LWW with patch ops: value of column c = the last
        # event (ts,lsn after the last D) that DETERMINES c (I/U always;
        # P only when non-null); struct_pack keeps arg_max from skipping
        # legitimately-null I/U values; key exists iff any live event
        "cdc_patch_merge": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            p AS (SELECT conv_id, turn_idx,
                    CASE WHEN op <> 'D' AND lsn % 7 IN (2, 4)
                         THEN NULL ELSE role END AS role,
                    CASE WHEN op <> 'D' AND lsn % 7 = 4
                         THEN NULL ELSE text END AS text,
                    CASE WHEN op <> 'D' AND lsn % 7 = 2
                         THEN NULL ELSE tool END AS tool,
                    ts,
                    CASE WHEN op <> 'D' AND lsn % 7 IN (2, 4)
                         THEN 'P' ELSE op END AS op,
                    lsn
                  FROM ch),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts, lsn) rn FROM p),
            d AS (SELECT *, coalesce(max(CASE WHEN op = 'D' THEN rn END)
                    OVER (PARTITION BY conv_id, turn_idx), 0) AS d_rn
                  FROM w),
            live AS (SELECT * FROM d WHERE rn > d_rn)
            SELECT conv_id, turn_idx,
                   (arg_max(struct_pack(v := role), rn)
                    FILTER (WHERE op <> 'P' OR role IS NOT NULL)).v AS role,
                   (arg_max(struct_pack(v := text), rn)
                    FILTER (WHERE op <> 'P' OR text IS NOT NULL)).v AS text,
                   (arg_max(struct_pack(v := tool), rn)
                    FILTER (WHERE op <> 'P' OR tool IS NOT NULL)).v AS tool,
                   max(ts) AS ts
            FROM live GROUP BY conv_id, turn_idx
            ORDER BY conv_id, turn_idx""",
        # zero-copy branch: LWW winners over original ∪ branch changes
        # (the engine hardlink-clones the lake and replays the branch
        # batch into the clone; isolation is pytest-verified)
        "cdc_clone_branch": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            br AS (SELECT 'c3' AS conv_id, CAST(t.i AS INTEGER) AS turn_idx,
                          'branch' AS role, 'branched' AS text,
                          CAST(NULL AS VARCHAR) AS tool,
                          TIMESTAMP '2025-01-01 00:00:00' AS ts,
                          'U' AS op,
                          (SELECT COUNT(*) FROM events) + t.i AS lsn
                   FROM range(10) t(i)),
            a AS (SELECT * FROM ch UNION ALL SELECT * FROM br),
            w AS (SELECT *, row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, lsn DESC) rn FROM a)
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM w WHERE rn = 1 AND op <> 'D'
            ORDER BY conv_id, turn_idx""",
        # two-cutoff state diff: LWW winners at t1 vs t2 (engine computes
        # both sides in one pass; the oracle joins two reconstructions);
        # IS DISTINCT FROM mirrors the engine's null-safe payload compare
        "cdc_state_diff": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            w1 AS (SELECT *, row_number() OVER (
                     PARTITION BY conv_id, turn_idx
                     ORDER BY ts DESC, lsn DESC) rn
                   FROM ch WHERE epoch_us(ts) <= 1705276800000000),
            s1 AS (SELECT conv_id, turn_idx, role, text, tool, ts
                   FROM w1 WHERE rn = 1 AND op <> 'D'),
            w2 AS (SELECT *, row_number() OVER (
                     PARTITION BY conv_id, turn_idx
                     ORDER BY ts DESC, lsn DESC) rn FROM ch),
            s2 AS (SELECT conv_id, turn_idx, role, text, tool, ts
                   FROM w2 WHERE rn = 1 AND op <> 'D'),
            j AS (SELECT CASE
                    WHEN s1.conv_id IS NULL THEN 'added'
                    WHEN s2.conv_id IS NULL THEN 'deleted'
                    WHEN s1.role IS DISTINCT FROM s2.role
                      OR s1.text IS DISTINCT FROM s2.text
                      OR s1.tool IS DISTINCT FROM s2.tool
                      OR s1.ts IS DISTINCT FROM s2.ts THEN 'changed'
                    ELSE 'unchanged' END AS diff_class
                  FROM s1 FULL OUTER JOIN s2
                    ON s1.conv_id = s2.conv_id
                   AND s1.turn_idx = s2.turn_idx)
            SELECT diff_class, COUNT(*) AS n_keys
            FROM j GROUP BY diff_class ORDER BY diff_class""",
        # snapshot-diff bootstrap: the change batch turning the t1 snapshot
        # into the final state (I/U carry the new payload, D the old
        # winning ts + null payload); untouched keys absent
        "cdc_snapshot_diff": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL}),
            w1 AS (SELECT *, row_number() OVER (
                     PARTITION BY conv_id, turn_idx
                     ORDER BY ts DESC, lsn DESC) rn
                   FROM ch WHERE epoch_us(ts) <= 1705276800000000),
            s1 AS (SELECT conv_id, turn_idx, role, text, tool, ts
                   FROM w1 WHERE rn = 1 AND op <> 'D'),
            w2 AS (SELECT *, row_number() OVER (
                     PARTITION BY conv_id, turn_idx
                     ORDER BY ts DESC, lsn DESC) rn FROM ch),
            s2 AS (SELECT conv_id, turn_idx, role, text, tool, ts
                   FROM w2 WHERE rn = 1 AND op <> 'D')
            SELECT COALESCE(s2.conv_id, s1.conv_id) AS conv_id,
                   COALESCE(s2.turn_idx, s1.turn_idx) AS turn_idx,
                   CASE WHEN s2.conv_id IS NULL THEN NULL
                        ELSE s2.role END AS role,
                   CASE WHEN s2.conv_id IS NULL THEN NULL
                        ELSE s2.text END AS text,
                   CASE WHEN s2.conv_id IS NULL THEN NULL
                        ELSE s2.tool END AS tool,
                   CASE WHEN s2.conv_id IS NULL THEN s1.ts
                        ELSE s2.ts END AS ts,
                   CASE WHEN s1.conv_id IS NULL THEN 'I'
                        WHEN s2.conv_id IS NULL THEN 'D'
                        ELSE 'U' END AS op
            FROM s1 FULL OUTER JOIN s2
              ON s1.conv_id = s2.conv_id AND s1.turn_idx = s2.turn_idx
            WHERE s1.conv_id IS NULL OR s2.conv_id IS NULL
               OR s1.role IS DISTINCT FROM s2.role
               OR s1.text IS DISTINCT FROM s2.text
               OR s1.tool IS DISTINCT FROM s2.tool
               OR s1.ts IS DISTINCT FROM s2.ts
            ORDER BY conv_id, turn_idx""",
        # adjacent same-role turn pairs per conversation (lead() mirror of
        # stages/analytic.grouped_lead); convs with <2 role-bearing turns
        # have no pairs and drop out on both sides
        "conv_role_violations": lww_winners + """
            , s AS (SELECT conv_id, turn_idx, role
                    FROM w WHERE rn = 1 AND op <> 'D'
                      AND role IS NOT NULL),
            l AS (SELECT conv_id, role,
                         lead(role) OVER (PARTITION BY conv_id
                                          ORDER BY turn_idx) AS next_role
                  FROM s)
            SELECT conv_id, COUNT(*) AS n_pairs,
                   CAST(SUM(CASE WHEN next_role = role THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_same_role
            FROM l WHERE next_role IS NOT NULL
            GROUP BY conv_id ORDER BY conv_id""",
        # canned/template turns: texts visible in >= 2 distinct convs
        "conv_template_turns": lww_winners + """
            SELECT text,
                   CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
                   COUNT(*) AS n_uses
            FROM w WHERE rn = 1 AND op <> 'D' AND text IS NOT NULL
            GROUP BY text HAVING COUNT(DISTINCT conv_id) >= 2
            ORDER BY text""",
        # SCD2 validity intervals: valid_to = next version's valid_from
        # per (conv_id, turn_idx), year-9999 sentinel for open intervals
        "cdc_turn_versions": f"""
            WITH ch AS ({DERIVED_CHANGES_SQL})
            SELECT conv_id, turn_idx, lsn, op,
                   epoch_us(ts) AS valid_from_us,
                   COALESCE(lead(epoch_us(ts)) OVER (
                                PARTITION BY conv_id, turn_idx
                                ORDER BY ts, lsn),
                            253402300800000000) AS valid_to_us,
                   CAST(CASE WHEN lead(ts) OVER (
                                      PARTITION BY conv_id, turn_idx
                                      ORDER BY ts, lsn) IS NULL
                              AND op <> 'D'
                             THEN 1 ELSE 0 END AS BIGINT) AS is_current
            FROM ch ORDER BY conv_id, turn_idx, lsn""",
        # variance from exact integer sums, ONE float expression mirrored
        # verbatim -> bit-identical, no tolerance needed
        "events_value_moments": """
            WITH vc AS (SELECT event_type,
                               CAST(FLOOR(value * 100) AS BIGINT) AS c
                        FROM events),
            a AS (SELECT event_type, SUM(c) AS s, SUM(c * c) AS s2,
                         COUNT(*) AS n
                  FROM vc GROUP BY 1)
            SELECT event_type, n,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
                   (CAST(s2 AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS var_c,
                   sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)) AS stddev_c
            FROM a ORDER BY event_type""",
        # cross-multiplied integer L1 over types present in BOTH weeks
        # (inner-join semantics, mirrored by the engine's lag kernel)
        "events_type_drift": """
            WITH cw AS (SELECT event_type,
                               epoch_us(ts) // 604800000000 AS week,
                               COUNT(*) AS c
                        FROM events GROUP BY 1, 2),
            n AS (SELECT week, CAST(SUM(c) AS BIGINT) AS n
                  FROM cw GROUP BY 1)
            SELECT a.week,
                   CAST(SUM(ABS(a.c * np_.n - b.c * na.n)) AS BIGINT)
                       AS l1_num,
                   na.n AS n, np_.n AS n_prev
            FROM cw a
            JOIN cw b ON b.event_type = a.event_type
                     AND b.week = a.week - 1
            JOIN n na ON na.week = a.week
            JOIN n np_ ON np_.week = a.week - 1
            GROUP BY a.week, na.n, np_.n ORDER BY a.week""",
        "events_retention_cohorts": """
            WITH uw AS (SELECT DISTINCT user_id,
                               epoch_us(ts) // 604800000000 AS week
                        FROM events),
            c AS (SELECT user_id, MIN(week) AS cohort FROM uw GROUP BY 1)
            SELECT c.cohort, uw.week, COUNT(*) AS n_users
            FROM uw JOIN c ON uw.user_id = c.user_id
            GROUP BY 1, 2 ORDER BY 1, 2""",
        # greedy-earliest chaining is exact for existence funnels:
        # t1 = first view, t2 = first click after t1, ...
        "events_funnel": """
            WITH u1 AS (SELECT user_id, MIN(ts) t FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            u2 AS (SELECT e.user_id, MIN(e.ts) t FROM events e
                   JOIN u1 ON e.user_id = u1.user_id
                   WHERE e.event_type = 'click' AND e.ts > u1.t GROUP BY 1),
            u3 AS (SELECT e.user_id, MIN(e.ts) t FROM events e
                   JOIN u2 ON e.user_id = u2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > u2.t
                   GROUP BY 1)
            SELECT '1_view' AS stage, COUNT(*) AS n_users FROM u1
            UNION ALL SELECT '2_click', COUNT(*) FROM u2
            UNION ALL SELECT '3_purchase', COUNT(*) FROM u3
            ORDER BY stage""",
        # IQR anomaly rule on exact quantile_disc quartiles: identical
        # float threshold arithmetic on both engines
        "events_value_outliers": """
            WITH vc AS (SELECT event_type,
                               CAST(FLOOR(value * 100) AS BIGINT) AS c
                        FROM events),
            q AS (SELECT event_type,
                         quantile_disc(c, 0.25) AS q1,
                         quantile_disc(c, 0.75) AS q3
                  FROM vc GROUP BY event_type)
            SELECT vc.event_type,
                   CAST(SUM(CASE WHEN vc.c > q.q3 + 1.5 * (q.q3 - q.q1)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   COUNT(*) AS n
            FROM vc JOIN q ON vc.event_type = q.event_type
            GROUP BY vc.event_type ORDER BY vc.event_type""",
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS sum_qty,
                   CAST(ROUND(SUM(l_extendedprice), 0) AS BIGINT) AS sum_base_price,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS BIGINT)
                       AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        # keys are non-null in the data, so 'ALL' markers are unambiguous
        "agg_rollup_pricing": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS sum_qty,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY 1, 2""",
        "filter_highvalue_orders": """
            SELECT o_orderkey, o_totalprice,
                   CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents
            FROM orders WHERE o_totalprice > 400000
            ORDER BY o_orderkey""",
        "join_orders_customer_segment": """
            SELECT c_mktsegment,
                   CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        "join_lineitem_part_type": """
            SELECT p_type, SUM(l_quantity) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_type ORDER BY p_type""",
        "join_orders_lineitem_priority": """
            SELECT o_orderpriority,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS BIGINT)
                       AS revenue,
                   COUNT(*) AS n_items
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "events_hot_users": """
            WITH h AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
            t AS (SELECT SUM(cnt) AS total FROM h)
            SELECT user_id, cnt FROM h, t WHERE cnt * 130.0 > total
            ORDER BY cnt DESC, user_id""",
        "topk_orders_by_price": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "distinct_event_types": """
            SELECT DISTINCT event_type FROM events ORDER BY event_type""",
        "events_hourly_windows": """
            SELECT date_trunc('hour', ts) AS hour,
                   CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS value_sum,
                   COUNT(*) AS n
            FROM events GROUP BY 1 ORDER BY 1""",
        "events_sliding_windows": """
            WITH e AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, value
                       FROM events),
            x AS (SELECT (t // 1800) * 1800 AS window_start, value FROM e
                  UNION ALL
                  SELECT (t // 1800) * 1800 - 1800 AS window_start, value FROM e)
            SELECT window_start,
                   CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS value_sum,
                   COUNT(*) AS n
            FROM x GROUP BY window_start ORDER BY window_start""",
        # watermark late-data: arrival simulates 10 interleaved source
        # shards (shard = props.k % 10, shifted 40 positions per shard);
        # wm at row r = max event time of strictly-earlier arrivals
        "events_late_data": """
            WITH k AS (
              SELECT ts,
                     (event_id + (CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
                                       AS BIGINT) % 10) * 40) * 1000000
                       + event_id AS arrival
              FROM events),
            w AS (SELECT ts, MAX(ts) OVER (ORDER BY arrival
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
                  FROM k)
            SELECT date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n_total,
                   CAST(SUM(CASE WHEN wm IS NOT NULL
                                  AND ts < wm - INTERVAL 24 HOUR
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_late
            FROM w GROUP BY 1 ORDER BY 1""",
        "events_sessionize": """
            WITH d AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
              FROM events)
            SELECT user_id, CAST(SUM(new_s) + 1 AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM d GROUP BY user_id ORDER BY user_id""",
        "events_session_windows": """
            WITH d AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
              FROM events),
            s AS (SELECT user_id, ts,
                         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS sid
                  FROM d)
            SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
                   MIN(ts) AS start, MAX(ts) AS "end", COUNT(*) AS n_events
            FROM s GROUP BY user_id, sid
            ORDER BY user_id, session_idx""",
        # full outer: negative-balance customers vs per-customer counts of
        # >150k orders; unmatched sides null-fill (n_big coalesced to 0,
        # acctbal stays NULL for customers outside the filter)
        "join_customer_orders_full": """
            WITH c AS (SELECT c_custkey AS custkey,
                              ROUND(c_acctbal, 2) AS acctbal
                       FROM customer WHERE c_acctbal < 0),
            b AS (SELECT o_custkey AS custkey,
                         CAST(COUNT(*) AS BIGINT) AS n_big
                  FROM orders WHERE o_totalprice > 150000
                  GROUP BY o_custkey)
            SELECT COALESCE(c.custkey, b.custkey) AS custkey,
                   c.acctbal AS acctbal,
                   COALESCE(b.n_big, 0) AS n_big
            FROM c FULL OUTER JOIN b ON c.custkey = b.custkey
            ORDER BY custkey""",
        "join_orders_customer_left": """
            SELECT c_mktsegment,
                   CAST(ROUND(SUM(COALESCE(o_totalprice, 0)), 0) AS BIGINT)
                       AS revenue,
                   CAST(SUM(CASE WHEN o_totalprice IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_orders,
                   COUNT(*) AS n_rows
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        "join_customer_orders_semi": """
            SELECT c_mktsegment, COUNT(*) AS n_customers,
                   CAST(MIN(c_custkey) AS BIGINT) AS min_custkey
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000.0)
            GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        # bloom-prefiltered selective join; result is the plain SQL join
        "join_urgent_lineitems": """
            SELECT l_returnflag, COUNT(*) AS n_items,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY l_returnflag ORDER BY l_returnflag""",
        # salted-join result == the plain SQL join (salting is pure layout)
        "join_events_orders_salted": """
            SELECT event_type, COUNT(*) AS n_pairs,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS price_cents
            FROM events JOIN orders ON user_id = o_custkey
            GROUP BY event_type ORDER BY event_type""",
        "join_customer_orders_anti": """
            SELECT c_mktsegment, COUNT(*) AS n_customers,
                   CAST(MIN(c_custkey) AS BIGINT) AS min_custkey
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 400000.0)
            GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        # DuckDB has native ASOF JOIN (backward-inclusive, same semantics
        # as stages/join.py:asof_join); the tolerance is mirrored with an
        # exact integer-microsecond lag test so float seconds can't cause
        # a boundary mismatch.
        "join_events_orders_asof": """
            WITH r AS (
                SELECT o_custkey AS user_id, o_orderdate AS ts,
                       MAX(o_totalprice) AS last_price
                FROM orders WHERE o_custkey % 3 = 0 GROUP BY 1, 2)
            SELECT e.event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CASE WHEN r.last_price IS NOT NULL
                                  AND epoch_us(e.ts) - epoch_us(r.ts)
                                      <= 725000000000000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
                   CAST(ROUND(SUM(CASE WHEN r.last_price IS NOT NULL
                                        AND epoch_us(e.ts) - epoch_us(r.ts)
                                            <= 725000000000000
                                       THEN r.last_price ELSE 0 END), 0)
                        AS BIGINT) AS matched_rev
            FROM events e ASOF LEFT JOIN r
              ON e.user_id = r.user_id AND e.ts >= r.ts
            GROUP BY e.event_type ORDER BY e.event_type""",
        "join_events_orders_range": """
            SELECT e.event_type,
                   COUNT(*) AS n_pairs,
                   CAST(SUM(CAST(ROUND(o.o_totalprice, 0) AS BIGINT))
                        AS BIGINT) AS rev,
                   MIN(epoch_us(o.o_orderdate)) AS ts_min_us,
                   MAX(epoch_us(o.o_orderdate)) AS ts_max_us
            FROM events e JOIN orders o ON o.o_custkey = e.user_id
              AND epoch_us(o.o_orderdate)
                  BETWEEN epoch_us(e.ts) - 725000000000000
                      AND epoch_us(e.ts) - 700000000000000
            GROUP BY e.event_type ORDER BY e.event_type""",
        "topn_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(rn - 1 AS BIGINT) AS rank
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                         row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
                  FROM orders)
            WHERE rn <= 3 ORDER BY o_custkey, rank""",
        "orders_running_revenue": """
            SELECT o_custkey, o_orderkey,
                   CAST(row_number() OVER w - 1 AS BIGINT) AS row_idx,
                   SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                       OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey
                             ROWS UNBOUNDED PRECEDING) AS running_sum
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, row_idx""",
        # floor-scaled cents: double multiply + FLOOR is bit-identical in
        # numpy and DuckDB; quantile_disc index = ceil(q*n) on both sides
        "events_value_quantiles": """
            WITH v AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS c
                       FROM events)
            SELECT CAST(q AS DOUBLE) AS q, value FROM (
            SELECT 0.05 AS q, CAST(quantile_disc(c, 0.05) / 100.0 AS DOUBLE) AS value FROM v
            UNION ALL SELECT 0.25 AS q, CAST(quantile_disc(c, 0.25) / 100.0 AS DOUBLE) AS value FROM v
            UNION ALL SELECT 0.5 AS q, CAST(quantile_disc(c, 0.5) / 100.0 AS DOUBLE) AS value FROM v
            UNION ALL SELECT 0.75 AS q, CAST(quantile_disc(c, 0.75) / 100.0 AS DOUBLE) AS value FROM v
            UNION ALL SELECT 0.9 AS q, CAST(quantile_disc(c, 0.9) / 100.0 AS DOUBLE) AS value FROM v
            UNION ALL SELECT 0.99 AS q, CAST(quantile_disc(c, 0.99) / 100.0 AS DOUBLE) AS value FROM v) ORDER BY q""",
        # grouped quantile_disc over floor-scaled cents, same index rule
        "events_type_quantiles": """
            WITH v AS (SELECT event_type,
                              CAST(FLOOR(value * 100) AS BIGINT) AS c
                       FROM events)
            SELECT event_type, CAST(q AS DOUBLE) AS q, value FROM (
              SELECT event_type, 0.25 AS q,
                     CAST(quantile_disc(c, 0.25) / 100.0 AS DOUBLE) AS value
              FROM v GROUP BY event_type
              UNION ALL
              SELECT event_type, 0.5 AS q,
                     CAST(quantile_disc(c, 0.5) / 100.0 AS DOUBLE) AS value
              FROM v GROUP BY event_type
              UNION ALL
              SELECT event_type, 0.9 AS q,
                     CAST(quantile_disc(c, 0.9) / 100.0 AS DOUBLE) AS value
              FROM v GROUP BY event_type)
            ORDER BY event_type, q""",
        "events_type_pivot": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS event_type_click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS event_type_error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS event_type_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                        AS BIGINT) AS event_type_signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS event_type_view
            FROM events GROUP BY user_id ORDER BY user_id""",
        "lineitem_price_bands": """
            SELECT b.band,
                   CAST(ROUND(SUM(l_extendedprice), 0) AS BIGINT) AS revenue,
                   COUNT(*) AS n
            FROM lineitem l
            JOIN (VALUES ('low', 0.0, 20000.0),
                         ('mid', 20000.0, 50000.0),
                         ('high', 50000.0, 1e12)) b(band, lo, hi)
              ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
            GROUP BY b.band ORDER BY b.band""",
        "events_csv_roundtrip": """
            SELECT event_type,
                   CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS value_sum,
                   COUNT(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type""",
        "doc_token_stats": """
            SELECT lang,
                   CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 0
                        ELSE length(text) - length(replace(text, ' ', '')) + 1
                       END) AS BIGINT) AS sum_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY lang ORDER BY lang""",
        "doc_token_stats_bpe": r"""
            SELECT lang,
                   CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 0
                        ELSE length(text) - length(replace(text, ' ', '')) + 1
                       END) AS BIGINT) AS sum_ws_tokens,
                   CAST(SUM(len(regexp_extract_all(COALESCE(text, ''),
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]'))) AS BIGINT)
                       AS sum_bpe_tokens,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY lang ORDER BY lang""",
        # integer-weight linear model: w = (-1, +6, +10) bias -30
        "doc_model_gate": f"""
            WITH {_QFEAT_CTE}
            SELECT doc_id,
                   CAST(-n_chars + 6 * n_tokens + 10 * stop_hits - 30
                        AS BIGINT) AS score,
                   CASE WHEN -n_chars + 6 * n_tokens + 10 * stop_hits - 30
                             >= 0
                        THEN 'keep' ELSE 'drop' END AS verdict
            FROM f ORDER BY doc_id""",
        # float64 IEEE in the same op order as numpy -> bit-exact floor
        "embed_quantize": """
            WITH x AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v
                       FROM embeddings),
            m AS (SELECT vec_id, MAX(ABS(v)) AS ma FROM x GROUP BY vec_id),
            q AS (SELECT x.vec_id, m.ma,
                         CAST(FLOOR((127.0 * x.v) /
                                    (CASE WHEN m.ma = 0 THEN 1 ELSE m.ma END)
                                    + 0.5) AS BIGINT) AS qv
                  FROM x JOIN m ON x.vec_id = m.vec_id)
            SELECT vec_id,
                   CAST(FLOOR(MAX(ma) * 1000000) AS BIGINT) AS scale_u,
                   CAST(SUM(qv) AS BIGINT) AS q_sum,
                   MIN(qv) AS q_min, MAX(qv) AS q_max
            FROM q GROUP BY vec_id ORDER BY vec_id""",
        "doc_quality": """
            SELECT doc_id,
                   length(COALESCE(text, '')) AS n_chars_m,
                   length(replace(COALESCE(text, ''), ' ', '')) AS chars_nospace,
                   CASE WHEN text IS NULL OR length(text) = 0 THEN 0
                        ELSE length(text) - length(replace(text, ' ', '')) + 1
                   END AS n_tokens,
                   CAST(
                     (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' the ', ''))) / 5
                   + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' a ', ''))) / 3
                   + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' and ', ''))) / 5
                   + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' of ', ''))) / 4
                   + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' to ', ''))) / 4
                   + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' in ', ''))) / 4
                   + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' is ', ''))) / 4
                   + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' it ', ''))) / 4
                   AS BIGINT) AS stop_hits
            FROM documents ORDER BY doc_id""",
        "events_value_stats": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS value_sum_cents,
                   CAST(ROUND(AVG(value) * 100, 0) AS BIGINT) AS avg_value_cents
            FROM events GROUP BY event_type ORDER BY event_type""",
        # the sample predicate mirrors stages/sampling.hash_sample in md5
        # mode: first 8 md5 bytes as UBIGINT, keep h % 100 < 5
        # md5-u64 rank == engine sort order; round-robin shard deal
        "doc_shuffle_shards": """
            WITH h AS (SELECT doc_id,
                              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                              1, 16))::UBIGINT AS hh
                       FROM documents),
            r AS (SELECT doc_id,
                         row_number() OVER (ORDER BY hh) - 1 AS rnk
                  FROM h)
            SELECT doc_id, CAST(rnk % 8 AS BIGINT) AS shard,
                   CAST(rnk // 8 AS BIGINT) AS pos
            FROM r ORDER BY doc_id""",
        "events_sample_hash": """
            SELECT event_type,
                   CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS value_sum,
                   COUNT(*) AS n
            FROM events
            WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 16))
                      ::UBIGINT % 100 < 5
            GROUP BY event_type ORDER BY event_type""",
        "events_stratified_sample": """
            WITH h AS (SELECT event_id, event_type,
                              ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                              1, 16))::UBIGINT AS hh
                       FROM events),
            r AS (SELECT event_id, event_type,
                         row_number() OVER (PARTITION BY event_type
                                            ORDER BY hh, event_id) AS rn
                  FROM h)
            SELECT event_id, event_type, CAST(rn - 1 AS BIGINT) AS rank
            FROM r WHERE rn <= 20 ORDER BY event_type, rank""",
        # weighted mixture: even-numbered sources at 80%, odd at 30%
        "corpus_mixture": """
            SELECT doc_id, source FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)
                  )::UBIGINT % 100
                  < CASE WHEN CAST(substr(source, 4, 10) AS INTEGER) % 2 = 0
                         THEN 80 ELSE 30 END
            ORDER BY doc_id""",
        "orders_range_shards": """
            WITH r AS (SELECT o_orderkey,
                              row_number() OVER (ORDER BY o_orderkey) - 1
                                  AS rank
                       FROM orders)
            SELECT o_orderkey, CAST(rank AS BIGINT) AS rank,
                   CAST((rank * 16) // (SELECT COUNT(*) FROM orders)
                        AS BIGINT) AS shard
            FROM r ORDER BY o_orderkey""",
        # RE2 on both engines: nested regexp_replace chain, counts taken
        # on the state each pattern saw (email scrub first, then digits)
        "events_redact_pii": """
            WITH l AS (SELECT event_id,
                              'u' || CAST(user_id AS VARCHAR)
                                  || '@example.com ' || props AS line
                       FROM events),
            s AS (SELECT event_id, line,
                         regexp_replace(line,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS after_email
                  FROM l)
            SELECT event_id,
                   regexp_replace(after_email, '[0-9]+', '<NUM>', 'g')
                       AS redacted,
                   len(regexp_extract_all(line,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                       AS n_email,
                   len(regexp_extract_all(after_email, '[0-9]+')) AS n_num
            FROM s ORDER BY event_id""",
        "events_props_extract": """
            WITH x AS (SELECT event_type,
                              CASE WHEN regexp_matches(props, '"k": ([0-9]+)')
                                   THEN CAST(regexp_extract(props,
                                             '"k": ([0-9]+)', 1) AS BIGINT)
                              END AS k
                       FROM events)
            SELECT event_type, COUNT(k) AS n,
                   CAST(SUM(k) AS BIGINT) AS k_sum,
                   MIN(k) AS k_min, MAX(k) AS k_max
            FROM x GROUP BY event_type ORDER BY event_type""",
        # bit-exact HyperLogLog mirror (p=10, m=1024): same md5-derived
        # 64-bit hash, same registers (rho from bin()-length), same
        # exact-HUGEINT inverse-power sum, same single float divide +
        # floor — see functions/sketch.py hll_estimate_portable
        # Count-Min: rebuild the (4 x 256) registers with the same md5 row
        # hashes, estimate = min over rows — collisions inflate both sides
        # identically, so even the approximate values compare bit-exact
        "events_user_cm_counts": """
            WITH r AS (SELECT unnest(range(4)) AS j),
            h AS (SELECT j,
                         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
                                             CAST(user_id AS VARCHAR)), 1, 16)
                          )::UBIGINT % 256 AS b
                  FROM events CROSS JOIN r),
            regs AS (SELECT j, b, COUNT(*) AS c FROM h GROUP BY j, b),
            probes AS (SELECT DISTINCT user_id FROM events
                       WHERE user_id < 20)
            SELECT p.user_id, CAST(MIN(regs.c) AS BIGINT) AS cm_count
            FROM probes p CROSS JOIN r
            JOIN regs ON regs.j = r.j
             AND regs.b = ('0x' || substr(md5(CAST(r.j AS VARCHAR) || ':' ||
                                              CAST(p.user_id AS VARCHAR)),
                                          1, 16))::UBIGINT % 256
            GROUP BY p.user_id ORDER BY p.user_id""",
        "events_approx_distinct": """
            WITH v AS (SELECT DISTINCT CAST(event_id AS VARCHAR) AS s
                       FROM events WHERE event_id IS NOT NULL),
            h AS (SELECT ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h FROM v),
            r AS (SELECT h >> 54 AS idx, h % (1::UBIGINT << 54) AS rest FROM h),
            rho AS (SELECT idx, CASE WHEN rest = 0 THEN 55
                                     ELSE 55 - length(bin(rest)) END AS rho
                    FROM r),
            reg AS (SELECT idx, MAX(rho) AS reg FROM rho GROUP BY idx),
            agg AS (SELECT SUM(1::HUGEINT << (64 - reg)) AS nzsum,
                           COUNT(*) AS nz FROM reg),
            est AS (SELECT 0.7213::DOUBLE / (1 + 1.079::DOUBLE / 1024)
                             * 1024 * 1024
                             * CAST(1::HUGEINT << 64 AS DOUBLE)
                             / CAST(nzsum + (1024 - nz) * (1::HUGEINT << 64)
                                    AS DOUBLE) AS raw,
                           1024 - nz AS zeros FROM agg)
            SELECT CAST(FLOOR(CASE WHEN raw <= 2.5 * 1024 AND zeros > 0
                                   THEN 1024 * ln(1024 / CAST(zeros AS DOUBLE))
                                   ELSE raw END) AS BIGINT) AS approx_distinct,
                   (SELECT COUNT(event_id) FROM events) AS n_rows
            FROM est""",
        # grouped portable HLL: identical register/floor arithmetic per group
        "events_type_approx_users": """
            WITH v AS (SELECT DISTINCT event_type,
                              CAST(user_id AS VARCHAR) AS s
                       FROM events WHERE user_id IS NOT NULL),
            h AS (SELECT event_type,
                         ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h
                  FROM v),
            r AS (SELECT event_type, h >> 54 AS idx,
                         h % (1::UBIGINT << 54) AS rest FROM h),
            rho AS (SELECT event_type, idx,
                           CASE WHEN rest = 0 THEN 55
                                ELSE 55 - length(bin(rest)) END AS rho
                    FROM r),
            reg AS (SELECT event_type, idx, MAX(rho) AS reg FROM rho
                    GROUP BY 1, 2),
            agg AS (SELECT event_type,
                           SUM(1::HUGEINT << (64 - reg)) AS nzsum,
                           COUNT(*) AS nz FROM reg GROUP BY 1),
            est AS (SELECT event_type,
                           0.7213::DOUBLE / (1 + 1.079::DOUBLE / 1024)
                             * 1024 * 1024
                             * CAST(1::HUGEINT << 64 AS DOUBLE)
                             / CAST(nzsum + (1024 - nz) * (1::HUGEINT << 64)
                                    AS DOUBLE) AS raw,
                           1024 - nz AS zeros FROM agg),
            n AS (SELECT event_type, COUNT(user_id) AS n_rows FROM events
                  GROUP BY 1)
            SELECT e.event_type,
                   CAST(FLOOR(CASE WHEN raw <= 2.5 * 1024 AND zeros > 0
                              THEN 1024 * ln(1024 / CAST(zeros AS DOUBLE))
                              ELSE raw END) AS BIGINT) AS approx_distinct,
                   n.n_rows
            FROM est e JOIN n USING (event_type) ORDER BY event_type""",
        # exact phi-heavy hitters == HAVING cnt*den >= num*n
        "events_heavy_users": """
            SELECT user_id % 20 AS cohort, COUNT(*) AS cnt FROM events
            GROUP BY 1
            HAVING COUNT(*) * 20 >= (SELECT COUNT(user_id) FROM events)
            ORDER BY 1""",
        "doc_langid": _langid_oracle(),
        # sequence packing: window cumsum == the engine's distributed
        # two-pass prefix scan; bin = exclusive token offset // 2048
        "doc_pack_bins": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR length(text) = 0 THEN 0
                          ELSE length(text) - length(replace(text, ' ', '')) + 1
                     END AS n_tokens
              FROM documents),
            o AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS off
              FROM d)
            SELECT CAST(off // 2048 AS BIGINT) AS bin,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   COUNT(*) AS n_docs,
                   CAST(MIN(doc_id) AS BIGINT) AS first_doc
            FROM o GROUP BY 1 ORDER BY 1""",
        # shared tokenization contract (stages/curation.py word_lists):
        # lower → RE2 split on [^a-z0-9]+ → drop empties
        "doc_decontaminate": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 w -> w <> '') AS w
              FROM documents),
            expl AS (
              SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
              FROM words),
            grams AS (
              SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g FROM expl),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
            hits AS (SELECT doc_id, COUNT(DISTINCT g.g) AS n_hit
                     FROM grams g JOIN bench USING (g)
                     WHERE doc_id % 97 <> 0 GROUP BY doc_id)
            SELECT d.doc_id, COALESCE(h.n_hit, 0) AS n_hit,
                   COALESCE(h.n_hit, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id""",
        # inclusive DuckDB list slice w[a:b]; size=32 stride=24
        "doc_chunk_windows": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 w -> w <> '') AS w
              FROM documents),
            n AS (SELECT doc_id, w, len(w) AS wc,
                         CASE WHEN len(w) <= 32 THEN 1
                              ELSE 1 + CAST(CEIL((len(w) - 32) / 24.0) AS BIGINT)
                         END AS n_chunks
                  FROM words),
            expl AS (
              SELECT doc_id, w, wc,
                     unnest(generate_series(0, n_chunks - 1)) AS i
              FROM n)
            SELECT doc_id, i AS chunk_idx,
                   LEAST(i*24 + 32, wc) - i*24 AS n_tokens,
                   array_to_string(w[i*24 + 1 : LEAST(i*24 + 32, wc)], ' ')
                       AS chunk_text
            FROM expl ORDER BY doc_id, chunk_idx""",
        "doc_term_freq": """
            WITH words AS (
              SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 w -> w <> '') AS w
              FROM documents),
            t AS (SELECT unnest(w) AS term FROM words)
            SELECT term, COUNT(*) AS n
            FROM t GROUP BY term
            ORDER BY n DESC, term LIMIT 50""",
        # n=2 word-gram repetition counts; gram identity on strings in
        # both engines (engine side never trusts hashes for the dup call)
        "doc_repetition": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(COALESCE(text, '')),
                                                    '[^a-z0-9]+'),
                                 w -> w <> '') AS w
              FROM documents),
            tok AS (SELECT doc_id, unnest(w) AS t FROM words),
            wstats AS (SELECT doc_id, COUNT(*) AS n_words,
                              COUNT(DISTINCT t) AS n_distinct
                       FROM tok GROUP BY doc_id),
            expl AS (SELECT doc_id, w,
                            unnest(generate_series(1, len(w) - 1)) AS i
                     FROM words WHERE len(w) >= 2),
            grams AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
                      FROM expl),
            gc AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2),
            gstats AS (SELECT doc_id,
                              SUM(c) FILTER (WHERE c >= 2) AS dup,
                              MAX(c) AS top
                       FROM gc GROUP BY doc_id)
            SELECT w.doc_id,
                   CAST(COALESCE(ws.n_words, 0) AS BIGINT) AS n_words,
                   CAST(COALESCE(ws.n_distinct, 0) AS BIGINT)
                       AS n_distinct_words,
                   CAST(GREATEST(len(w.w) - 1, 0) AS BIGINT) AS n_grams,
                   CAST(COALESCE(gs.dup, 0) AS BIGINT)
                       AS n_dup_gram_instances,
                   CAST(COALESCE(gs.top, 0) AS BIGINT) AS top_gram_count
            FROM words w
            LEFT JOIN wstats ws USING (doc_id)
            LEFT JOIN gstats gs USING (doc_id)
            ORDER BY w.doc_id""",
        # smoothed tf-idf, identical double arithmetic both sides:
        # ln((N+1)/(df+1))+1 then floor(tf*idf*1e6); rank on the SCALED int
        "doc_tfidf_top": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(COALESCE(text, '')),
                                                    '[^a-z0-9]+'),
                                 w -> w <> '') AS w
              FROM documents),
            tok AS (SELECT doc_id, unnest(w) AS t FROM words),
            tf AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
            df AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok
                   GROUP BY t),
            nd AS (SELECT COUNT(*) AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.t, tf.c, df.df,
                         CAST(FLOOR(tf.c * (ln((nd.n + 1.0) / (df.df + 1.0))
                                            + 1.0) * 1000000) AS BIGINT)
                             AS score_s
                  FROM tf JOIN df ON tf.t = df.t, nd),
            r AS (SELECT *, row_number() OVER (
                     PARTITION BY doc_id
                     ORDER BY score_s DESC, t) AS rn FROM s)
            SELECT doc_id, t AS top_term, CAST(c AS BIGINT) AS tf,
                   CAST(df AS BIGINT) AS df, score_s
            FROM r WHERE rn = 1 ORDER BY doc_id""",
        "doc_normalize": """
            WITH n AS (
              SELECT doc_id, text,
                     trim(regexp_replace(lower(nfc_normalize(text)),
                                         '\\s+', ' ', 'g')) AS norm_text
              FROM documents)
            SELECT doc_id, norm_text,
                   CAST(length(norm_text) AS BIGINT) AS n_chars_norm,
                   norm_text <> text AS changed
            FROM n ORDER BY doc_id""",
        # integer-scaled score (floor(score*1e6)) so the percentile-gate
        # membership is an integer compare; quantile_disc == the engine's
        # exact_quantiles (smallest value reaching ceil(q*n) cum count)
        "doc_quality_gate": """
            WITH f AS (
              SELECT doc_id, lang,
                     CASE WHEN text IS NULL OR length(text) = 0 THEN 0
                          ELSE length(text) - length(replace(text, ' ', '')) + 1
                     END AS n_tokens,
                     CAST(
                       (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' the ', ''))) / 5
                     + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' a ', ''))) / 3
                     + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' and ', ''))) / 5
                     + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' of ', ''))) / 4
                     + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' to ', ''))) / 4
                     + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' in ', ''))) / 4
                     + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' is ', ''))) / 4
                     + (length(' '||COALESCE(text, '')||' ') - length(replace(' '||COALESCE(text, '')||' ', ' it ', ''))) / 4
                     AS BIGINT) AS stop_hits
              FROM documents),
            s AS (SELECT lang,
                         CAST(FLOOR((LEAST(n_tokens / 100.0, 1.0) * 0.5
                              + LEAST(CAST(stop_hits AS DOUBLE)
                                      / GREATEST(n_tokens, 1), 0.5))
                              * 1000000) AS BIGINT) AS cs
                  FROM f),
            t AS (SELECT quantile_disc(cs, 0.25) AS th FROM s)
            SELECT lang, COUNT(*) AS n_kept, CAST(SUM(cs) AS BIGINT) AS sum_cs,
                   CAST(MIN(cs) AS BIGINT) AS min_cs,
                   CAST(MAX(th) AS BIGINT) AS thresh_cs
            FROM s, t WHERE cs >= th GROUP BY lang ORDER BY lang""",
        # the curation chain composed: normalize → decontaminate (8-gram
        # vs eval split) → 32/24 windows → 512-token pack prefix scan
        "training_prep": """
            WITH norm AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(nfc_normalize(text)),
                                         '\\s+', ' ', 'g')) AS text
              FROM documents),
            words AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 w -> w <> '') AS w
              FROM norm),
            expl AS (
              SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i
              FROM words),
            grams AS (
              SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g FROM expl),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
            dirty AS (SELECT DISTINCT doc_id FROM grams g JOIN bench USING (g)
                      WHERE doc_id % 97 <> 0),
            clean AS (SELECT doc_id, w FROM words
                      WHERE doc_id % 97 <> 0
                        AND doc_id NOT IN (SELECT doc_id FROM dirty)),
            n AS (SELECT doc_id, len(w) AS wc,
                         CASE WHEN len(w) <= 32 THEN 1
                              ELSE 1 + CAST(CEIL((len(w) - 32) / 24.0) AS BIGINT)
                         END AS n_chunks
                  FROM clean),
            ch AS (SELECT doc_id, wc,
                          unnest(generate_series(0, n_chunks - 1)) AS i
                   FROM n),
            tok AS (SELECT doc_id * 10000 + i AS ord,
                           LEAST(i*24 + 32, wc) - i*24 AS n_tokens
                    FROM ch),
            o AS (SELECT ord, n_tokens,
                         COALESCE(SUM(n_tokens) OVER (
                            ORDER BY ord
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS off
                  FROM tok)
            SELECT CAST(off // 512 AS BIGINT) AS bin,
                   COUNT(*) AS n_chunks,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(MIN(ord) AS BIGINT) AS first_ord
            FROM o GROUP BY 1 ORDER BY 1""",
        "embed_label_centroids": """
            SELECT CAST(label AS BIGINT) AS label, i - 1 AS dim,
                   ROUND(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 6)
                       AS mean_val
            FROM embeddings, LATERAL generate_series(1, 64) t(i)
            GROUP BY label, i ORDER BY label, dim""",
        "doc_fingerprints": """
            SELECT doc_id, md5(COALESCE(text, '')) AS fp FROM documents ORDER BY doc_id""",
        "doc_fingerprints_rolling": _rolling_fp_oracle(8),
        "doc_exact_dedup": """
            SELECT MIN(doc_id) AS doc_id, text
            FROM documents GROUP BY text ORDER BY doc_id""",
        # cross-corpus dedup: docs keep their id as uid, turns get
        # 10^12 + conv*200 + turn_idx (turn_idx < 200 by construction)
        "corpus_union_dedup": lww_winners + """
            , s AS (SELECT conv_id, turn_idx, text
                    FROM w WHERE rn = 1 AND op <> 'D'
                      AND text IS NOT NULL),
            u AS (
              SELECT CAST(doc_id AS BIGINT) AS uid, 'doc' AS origin, text
              FROM documents WHERE text IS NOT NULL
              UNION ALL
              SELECT 1000000000000
                       + CAST(substr(conv_id, 2, 10) AS BIGINT) * 200
                       + turn_idx,
                     'turn', text
              FROM s),
            k AS (SELECT origin, row_number() OVER (
                    PARTITION BY text ORDER BY uid) rn2 FROM u)
            SELECT origin, COUNT(*) AS n_kept
            FROM k WHERE rn2 = 1 GROUP BY origin ORDER BY origin""",
        # paragraph-grain dedup: 16-word spans, first (doc_id, span_idx)
        # occurrence of each distinct span wins, docs reassembled from
        # survivors (zipped unnest = WITH ORDINALITY, absent in this build)
        "doc_span_dedup": """
            WITH words AS (
              SELECT doc_id,
                     unnest(string_split(text, ' ')) AS word,
                     unnest(range(len(string_split(text, ' ')))) AS wi
              FROM documents),
            spans AS (
              SELECT doc_id, wi // 16 AS span_idx,
                     string_agg(word, ' ' ORDER BY wi) AS span
              FROM words GROUP BY doc_id, wi // 16),
            keep AS (
              SELECT *, row_number() OVER (
                 PARTITION BY span ORDER BY doc_id, span_idx) rn
              FROM spans)
            SELECT doc_id,
                   string_agg(span, ' ' ORDER BY span_idx) AS text_dedup,
                   CAST(COUNT(*) AS BIGINT) AS n_spans
            FROM keep WHERE rn = 1
            GROUP BY doc_id ORDER BY doc_id""",
        "embed_topk_bruteforce": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 2),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     ROUND(list_cosine_similarity(e.embedding, q.qe), 4) AS cos
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY cos DESC, vec_id) rn
              FROM scored)
            SELECT query_id, vec_id, cos FROM ranked WHERE rn <= 10
            ORDER BY query_id, cos DESC, vec_id""",
        "media_byte_stats": """
            SELECT doc_id AS media_id, 'image' AS media_type,
                   octet_length(encode(COALESCE(text, ''))) AS n_bytes
            FROM documents ORDER BY media_id""",
        # stub sampler slices 4 frames of exactly len//4 bytes each for
        # payloads >= 4 bytes (corpus min is 44)
        "media_frame_stats": """
            SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_idx,
                   octet_length(encode(COALESCE(text, ''))) // 4 AS n_bytes
            FROM documents CROSS JOIN range(0, 4) t(i)
            ORDER BY media_id, frame_idx""",
        # incremental dedup == full exact dedup restricted to the new
        # half: survivors are new texts unseen in the committed half,
        # min doc_id among equal new texts
        "doc_dedup_incremental": """
            WITH half AS (SELECT COUNT(*) // 2 AS h FROM documents),
            ex AS (SELECT DISTINCT COALESCE(text, '') AS t
                   FROM documents, half WHERE doc_id < h),
            newd AS (SELECT doc_id, COALESCE(text, '') AS t
                     FROM documents, half WHERE doc_id >= h),
            k AS (SELECT doc_id, t, row_number() OVER (
                    PARTITION BY t ORDER BY doc_id) rn FROM newd)
            SELECT doc_id FROM k
            WHERE rn = 1 AND t NOT IN (SELECT t FROM ex)
            ORDER BY doc_id""",
        # bigram typicality: familiarity = sum of corpus bigram counts
        # over the doc's bigrams (byte==char on the ASCII corpus) —
        # exact-integer, so the engine must match bit for bit
        "doc_bigram_typicality": """
            WITH nums AS (SELECT i FROM range(1, 2000) t(i)),
            d AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
            bg AS (SELECT doc_id, substr(t, i, 2) AS g FROM d JOIN nums
                     ON i <= length(t) - 1),
            model AS (SELECT g, COUNT(*) AS c FROM bg GROUP BY g)
            SELECT bg.doc_id,
                   CAST(SUM(c) AS BIGINT) AS familiarity,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams
            FROM bg JOIN model USING (g)
            GROUP BY bg.doc_id ORDER BY bg.doc_id""",
        # incremental near-dup probe == exact 5-gram-Jaccard pairs across
        # the committed/new cut (bimodal corpus: estimated-sim threshold
        # agrees with exact; banding recall pigeonhole-exact at 0.8)
        "doc_near_dup_probe": """
            WITH RECURSIVE nums AS (SELECT i FROM range(1, 2000) t(i)),
            half AS (SELECT COUNT(*) // 2 AS h FROM documents),
            sh AS (SELECT DISTINCT doc_id, substr(COALESCE(text,''), i, 5) s
                   FROM documents JOIN nums
                     ON i <= GREATEST(length(COALESCE(text,'')) - 4, 1)),
            sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id ai, b.doc_id bi, COUNT(*) c
                      FROM sh a JOIN sh b
                        ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
            SELECT ai AS a, bi AS b FROM inter
            JOIN sz x ON x.doc_id = ai JOIN sz y ON y.doc_id = bi, half
            WHERE c * 1.0 / (x.n + y.n - c) >= 0.8
              AND ai < h AND bi >= h
            ORDER BY a, b""",
        # cluster labels for every near-dup member: min-label components
        # over the exact-Jaccard pair set
        "doc_dup_clusters": """
            WITH RECURSIVE nums AS (SELECT i FROM range(1, 2000) t(i)),
            sh AS (SELECT DISTINCT doc_id, substr(COALESCE(text,''), i, 5) s
                   FROM documents JOIN nums
                     ON i <= GREATEST(length(COALESCE(text,'')) - 4, 1)),
            sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id ai, b.doc_id bi, COUNT(*) c
                      FROM sh a JOIN sh b
                        ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
            p AS (SELECT ai, bi FROM inter
                  JOIN sz x ON x.doc_id = ai JOIN sz y ON y.doc_id = bi
                  WHERE c * 1.0 / (x.n + y.n - c) >= 0.8),
            edges AS (SELECT ai a, bi b FROM p
                      UNION ALL SELECT bi, ai FROM p),
            cc(id, lbl) AS (
              SELECT a, a FROM edges
              UNION
              SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.id
            )
            SELECT id AS doc_id, MIN(lbl) AS cluster
            FROM cc GROUP BY id ORDER BY doc_id""",
        # keep the BEST-scoring member per cluster (model-gate score,
        # tie -> min id); everything else survives untouched
        "doc_dedup_by_quality": f"""
            WITH RECURSIVE nums AS (SELECT i FROM range(1, 2000) t(i)),
            sh AS (SELECT DISTINCT doc_id, substr(COALESCE(text,''), i, 5) s
                   FROM documents JOIN nums
                     ON i <= GREATEST(length(COALESCE(text,'')) - 4, 1)),
            sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id ai, b.doc_id bi, COUNT(*) c
                      FROM sh a JOIN sh b
                        ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
            p AS (SELECT ai, bi FROM inter
                  JOIN sz x ON x.doc_id = ai JOIN sz y ON y.doc_id = bi
                  WHERE c * 1.0 / (x.n + y.n - c) >= 0.8),
            edges AS (SELECT ai a, bi b FROM p
                      UNION ALL SELECT bi, ai FROM p),
            cc(id, lbl) AS (
              SELECT a, a FROM edges
              UNION
              SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.id
            ),
            m AS (SELECT id, MIN(lbl) AS cluster FROM cc GROUP BY id),
            {_QFEAT_CTE.lstrip()},
            sc AS (SELECT m.id, m.cluster,
                          -f.n_chars + 6 * f.n_tokens
                          + 10 * f.stop_hits - 30 AS score
                   FROM m JOIN f ON f.doc_id = m.id),
            w AS (SELECT id, row_number() OVER (
                    PARTITION BY cluster
                    ORDER BY score DESC, id) rn FROM sc)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT id FROM w WHERE rn > 1)
            ORDER BY doc_id""",
        # leakage matrix: exact-Jaccard pairs x md5 80/10/10 split; the
        # engine's LSH recall is margin-protected on this corpus (no pair
        # between 0.36 and 0.92), so the exact-pair oracle is fair
        "doc_split_leakage": """
            WITH nums AS (SELECT i FROM range(1, 2000) t(i)),
            sh AS (SELECT DISTINCT doc_id, substr(COALESCE(text,''), i, 5) s
                   FROM documents JOIN nums
                     ON i <= GREATEST(length(COALESCE(text,'')) - 4, 1)),
            sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY 1),
            inter AS (SELECT a.doc_id ai, b.doc_id bi, COUNT(*) c
                      FROM sh a JOIN sh b
                        ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
            p AS (SELECT ai, bi FROM inter
                  JOIN sz x ON x.doc_id = ai JOIN sz y ON y.doc_id = bi
                  WHERE c * 1.0 / (x.n + y.n - c) >= 0.8),
            lab AS (SELECT doc_id,
                      CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                1, 16))::UBIGINT % 10 < 8
                             THEN 'train'
                           WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                1, 16))::UBIGINT % 10 = 8
                             THEN 'val' ELSE 'test' END AS sp
                    FROM documents)
            SELECT LEAST(la.sp, lb.sp) AS split_lo,
                   GREATEST(la.sp, lb.sp) AS split_hi,
                   COUNT(*) AS n_pairs
            FROM p JOIN lab la ON la.doc_id = p.ai
                   JOIN lab lb ON lb.doc_id = p.bi
            GROUP BY 1, 2 ORDER BY 1, 2""",
        "doc_near_dedup_ngram": _jaccard_dedup_oracle(0.8),
        "doc_near_dedup_minhash": _jaccard_dedup_oracle(0.8),
        "doc_near_dedup_simhash": _simhash_dedup_oracle(3),
        "corpus_curation": _corpus_curation_oracle(25, 0.8),
        # exhaustive probe (n_probe = n_clusters) reads every IVF bucket,
        # so the persisted-index path must equal the brute-force top-k
        "embed_knn_ivf": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 2),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     ROUND(list_cosine_similarity(e.embedding, q.qe), 4) AS cos
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY cos DESC, vec_id) rn
              FROM scored)
            SELECT query_id, vec_id, cos FROM ranked WHERE rn <= 10
            ORDER BY query_id, cos DESC, vec_id""",
        # bucketed-HNSW full-width probe == the same brute-force top-k
        # (the search() exact-scan shortcut at beam >= bucket size makes
        # this provable, not probabilistic)
        "embed_knn_hnsw": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 2),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     ROUND(list_cosine_similarity(e.embedding, q.qe), 4) AS cos
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY cos DESC, vec_id) rn
              FROM scored)
            SELECT query_id, vec_id, cos FROM ranked WHERE rn <= 10
            ORDER BY query_id, cos DESC, vec_id""",
        # grown-index exhaustive probe == the same brute-force top-k
        "embed_knn_ivf_incremental": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 2),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     ROUND(list_cosine_similarity(e.embedding, q.qe), 4) AS cos
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY cos DESC, vec_id) rn
              FROM scored)
            SELECT query_id, vec_id, cos FROM ranked WHERE rn <= 10
            ORDER BY query_id, cos DESC, vec_id""",
        # bit-exact mirror of the sha256-derived stub decode digest:
        # 8 little-endian uint32 words of sha256(utf8(text)), each word →
        # float32(word)/2^32 (FLOAT cast = same IEEE round-to-nearest),
        # digest = Σ floor(f * 1000) — see queries.media_features
        "media_features": """
            WITH b0 AS (SELECT doc_id AS media_id, 'image' AS media_type,
                               octet_length(encode(COALESCE(text, ''))) AS n_bytes,
                               sha256(COALESCE(text, '')) AS hx
                        FROM documents),
            b AS (SELECT media_id, media_type, n_bytes, j, k,
                    (strpos('0123456789abcdef', substr(hx, (4*j+k)*2+1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(hx, (4*j+k)*2+2, 1)) - 1) AS byte
                  FROM b0, range(0, 8) s(j), range(0, 4) r(k)),
            w AS (SELECT media_id, media_type, n_bytes, j,
                         CAST(SUM(byte * (256 ** k)) AS BIGINT) AS word
                  FROM b GROUP BY media_id, media_type, n_bytes, j),
            f AS (SELECT media_id, media_type, n_bytes,
                         CAST(FLOOR(CAST(CAST(word AS FLOAT) AS DOUBLE)
                                    / 4294967296.0 * 1000.0) AS BIGINT) AS fd
                  FROM w)
            SELECT media_id, media_type, n_bytes,
                   CAST(SUM(fd) AS BIGINT) AS feature_digest
            FROM f GROUP BY media_id, media_type, n_bytes
            ORDER BY media_id""",
        "embed_near_dedup": """
            WITH aug AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 100000, embedding FROM embeddings
              WHERE vec_id % 10 = 0
            )
            SELECT a.vec_id FROM aug a
            WHERE NOT EXISTS (
              SELECT 1 FROM aug b WHERE b.vec_id < a.vec_id
                AND list_cosine_similarity(a.embedding, b.embedding) >= 0.995)
            ORDER BY a.vec_id""",
    }
    # the cell-kernel LAKE replay and the one-shot cell fold share their
    # semantics (functions/cells.py) — and therefore their oracle
    out["cdc_cell_replay"] = out["cdc_patch_merge"]
    # the distributed (join-path) twins compute the identical result, so
    # the broadcast queries' oracles apply verbatim
    out["doc_decontaminate_join"] = out["doc_decontaminate"]
    out["doc_tfidf_top_join"] = out["doc_tfidf_top"]
    # the co-partitioned (default) and generic-join changefeeds compute
    # the identical diff — one oracle serves both
    out["cdc_changefeed_join"] = out["cdc_changefeed"]
    return out
