"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline (real engine: Lake +
manifest + replay) over /root/testdata/sf0.001. ``queries()`` exposes
one callable per implemented operator family (SURVEY.md §2 + the
training-data ops); ``oracle_sql()`` holds the exact DuckDB mirrors.
Ray is initialised by the driver — nothing here calls ray.init().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from clever_canal_ray.pipelines import queries as q

STOPLIST_SQL = "['the','a','and','of','to','in','is']"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from clever_canal_ray.pipelines.flagship import run_flagship

    return run_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # CDC / engine family (SURVEY.md §2: O9, O7, A1-A4, D3, F1-F7, FlatMessage)
        "cdc_upsert_lake": q.cdc_upsert_lake,
        "cdc_multi_table": q.cdc_multi_table,
        "cdc_rekey": q.cdc_rekey,
        "cdc_consumer_drain": q.cdc_consumer_drain,
        "cdc_lww_state": q.cdc_lww_state,
        "cdc_live_rows": q.cdc_live_rows,
        "cdc_changelog_counts": q.cdc_changelog_counts,
        "cdc_position_bounds": q.cdc_position_bounds,
        "cdc_txn_summary": q.cdc_txn_summary,  # A3/A4 + F7 suppression merged
        "cdc_filter_regex": q.cdc_filter_regex,
        "cdc_mixed_types": q.cdc_mixed_types,
        "cdc_projection_flat": q.cdc_projection_flat,
        "cdc_dedup_positions": q.cdc_dedup_positions,
        "cdc_kway_merge": q.cdc_kway_merge,
        "cdc_xa": q.cdc_xa,  # XA branch commit/rollback framing
        # training-data ops (dedup / text / similarity)
        "dedup_exact_docs": q.dedup_exact_docs,
        "dedup_survivors": q.dedup_survivors,
        "text_token_counts": q.text_token_counts,  # ws + BPE-ish, one gate
        "text_quality": q.text_quality,  # quality heuristics + md5 fingerprint, merged
        "lang_id": q.lang_id,  # oracle: marker-overlap heuristic in SQL
        "minhash_pairs": q.minhash_pairs,  # rows-only (LSH banding)
        "minhash_verified": q.minhash_verified,  # oracle: exact all-pairs jaccard
        "minhash_clusters": q.minhash_clusters,  # oracle: recursive-CTE components
        "simhash_docs": q.simhash_docs,  # oracle: md5-based bit votes in SQL
        "ann_lsh_topk": q.ann_lsh_topk,  # rows-only (approximate by design)
        "ann_ivf_topk": q.ann_ivf_topk,  # rows-only (IVF scale path)
        "embedding_lsh_dups": q.embedding_lsh_dups,  # rows-only (bucketed scale path)
        "multimodal_features": q.multimodal_features,  # oracle: byte counts in SQL
        "ngram_jaccard_pairs": q.ngram_jaccard_pairs,
        "ann_topk": q.ann_topk,
        "embedding_dups": q.embedding_dups,
        "asof_latest_order": q.asof_latest_order,  # oracle: DuckDB ASOF JOIN + band join (merged temporal-join gate)
        "events_windowed": q.events_windowed,  # oracle: tumbling windows in SQL
        "events_hopping": q.events_hopping,  # oracle: generate_series window explode
        "events_sessionized": q.events_sessionized,  # oracle: lag/gap window functions
        # corpus-level stats / training-set assembly
        "text_repetition": q.text_repetition,  # Gopher repetition filters
        "corpus_decontaminate": q.corpus_decontaminate,  # eval-set n-gram overlap
        "corpus_samples": q.corpus_samples,  # hash + domain-mix sampling, merged
        "corpus_shard_assign": q.corpus_shard_assign,  # distributed row_number
        "corpus_span_dedup": q.corpus_span_dedup,  # C4-style span dedup
        "cdc_json_patch": q.cdc_json_patch,  # JSON column + partial-update patch events
        "cdc_mq_routing": q.cdc_mq_routing,  # pk-hash MQ partition routing
        "cdc_payload_mask": q.cdc_payload_mask,  # PII-style payload scrub
        "corpus_token_histogram": q.corpus_token_histogram,
        "corpus_topk_per_source": q.corpus_topk_per_source,
        "corpus_token_quantiles": q.corpus_token_quantiles,
        "corpus_pack_sequences": q.corpus_pack_sequences,
        # analytic parity (aggregate / sort-limit / joins)
        "q1_pricing": q.q1_pricing,
        "top_orders_by_revenue": q.top_orders_by_revenue,
        "analytic_dim_counts": q.analytic_dim_counts,  # broadcast join + distinct
    }


def oracle_sql() -> dict[str, str]:
    op_case = "CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END"
    return {
        "cdc_upsert_lake": f"""
            WITH ev AS (
              SELECT event_id, {op_case} AS op,
                     CASE WHEN event_type = 'signup'
                          THEN printf('doc%012d', 1000000 + event_id)
                          ELSE printf('doc%012d', (user_id*7919 + event_id*31) % (SELECT count(*) FROM documents))
                     END AS doc_id,
                     CAST(16 + event_id % 64 AS BIGINT) AS n_tok
              FROM events),
            w AS (SELECT doc_id, op, n_tok,
                         row_number() OVER (PARTITION BY doc_id ORDER BY event_id DESC) AS rn
                  FROM ev),
            winners AS (SELECT doc_id, op, n_tok FROM w WHERE rn = 1),
            base AS (SELECT printf('doc%012d', doc_id) AS doc_id,
                            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                            source
                     FROM documents)
            SELECT b.doc_id, b.n_tok, b.source
            FROM base b WHERE b.doc_id NOT IN (SELECT doc_id FROM winners)
            UNION ALL
            SELECT doc_id, n_tok, 'cdc' AS source FROM winners WHERE op <> 'D'
        """,
        "cdc_xa": f"""
            WITH ev AS (
              SELECT event_id, {op_case} AS op,
                     CASE WHEN event_type = 'signup'
                          THEN printf('doc%012d', 1000000 + event_id)
                          ELSE printf('doc%012d', (user_id*7919 + event_id*31) % (SELECT count(*) FROM documents))
                     END AS doc_id,
                     CAST(16 + event_id % 64 AS BIGINT) AS n_tok
              FROM events
              -- XA rule: events of rolled-back branches (xa_id %% 3 == 0,
              -- where xa_id = event_id // 256 for events with
              -- event_id %% 16 == 5) never apply
              WHERE NOT (event_id % 16 = 5 AND (event_id // 256) % 3 = 0)),
            w AS (SELECT doc_id, op, n_tok,
                         row_number() OVER (PARTITION BY doc_id ORDER BY event_id DESC) AS rn
                  FROM ev),
            winners AS (SELECT doc_id, op, n_tok FROM w WHERE rn = 1),
            base AS (SELECT printf('doc%012d', doc_id) AS doc_id,
                            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                            source
                     FROM documents)
            SELECT b.doc_id, b.n_tok, b.source
            FROM base b WHERE b.doc_id NOT IN (SELECT doc_id FROM winners)
            UNION ALL
            SELECT doc_id, n_tok, 'cdc' AS source FROM winners WHERE op <> 'D'
        """,
        "cdc_multi_table": f"""
            WITH ev AS (
              SELECT event_id, {op_case} AS op,
                     CASE WHEN event_type = 'signup'
                          THEN printf('doc%012d', 1000000 + event_id)
                          ELSE printf('doc%012d', (user_id*7919 + event_id*31) % (SELECT count(*) FROM documents))
                     END AS doc_id,
                     CAST(16 + event_id % 64 AS BIGINT) AS n_tok
              FROM events),
            w AS (SELECT doc_id, op, n_tok,
                         row_number() OVER (PARTITION BY doc_id ORDER BY event_id DESC) AS rn
                  FROM ev),
            winners AS (SELECT doc_id, op, n_tok FROM w WHERE rn = 1),
            base AS (SELECT printf('doc%012d', doc_id) AS doc_id,
                            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                            source
                     FROM documents),
            final AS (
              SELECT b.doc_id, b.n_tok, b.source
              FROM base b WHERE b.doc_id NOT IN (SELECT doc_id FROM winners)
              UNION ALL
              SELECT doc_id, n_tok, 'cdc' AS source FROM winners WHERE op <> 'D')
            SELECT doc_id, n_tok, source,
                   'lake.t' || CAST(CAST(substr(doc_id, 4) AS BIGINT) % 2 AS VARCHAR) AS tbl
            FROM final
        """,
        "cdc_rekey": f"""
            WITH ev AS (
              SELECT event_id, {op_case} AS op,
                     CASE WHEN event_type = 'signup'
                          THEN printf('doc%012d', 1000000 + event_id)
                          ELSE printf('doc%012d', (user_id*7919 + event_id*31) % (SELECT count(*) FROM documents))
                     END AS doc_id,
                     CAST(16 + event_id % 64 AS BIGINT) AS n_tok
              FROM events),
            exp AS (
              SELECT event_id,
                     CASE WHEN op = 'U' AND event_id % 10 = 3 THEN 'D' ELSE op END AS op,
                     doc_id, n_tok
              FROM ev
              UNION ALL
              SELECT event_id, 'U' AS op,
                     printf('doc%012d', 100000000 + event_id) AS doc_id, n_tok
              FROM ev WHERE op = 'U' AND event_id % 10 = 3),
            w AS (SELECT doc_id, op, n_tok,
                         row_number() OVER (PARTITION BY doc_id ORDER BY event_id DESC) AS rn
                  FROM exp),
            winners AS (SELECT doc_id, op, n_tok FROM w WHERE rn = 1),
            base AS (SELECT printf('doc%012d', doc_id) AS doc_id,
                            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                            source
                     FROM documents)
            SELECT b.doc_id, b.n_tok, b.source
            FROM base b WHERE b.doc_id NOT IN (SELECT doc_id FROM winners)
            UNION ALL
            SELECT doc_id, n_tok, 'cdc' AS source FROM winners WHERE op <> 'D'
        """,
        "cdc_consumer_drain": f"""
            SELECT event_id, {op_case} AS op, CAST(epoch_ms(ts) AS BIGINT) AS es
            FROM events
        """,
        "cdc_lww_state": f"""
            SELECT user_id, event_id AS last_pos, {op_case} AS op, value, event_type
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1
        """,
        "cdc_live_rows": f"""
            SELECT user_id, value
            FROM (SELECT *, {op_case} AS op,
                         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1 AND op <> 'D'
        """,
        "cdc_changelog_counts": f"""
            SELECT {op_case} AS op, count(*) AS n FROM events GROUP BY 1
        """,
        "cdc_position_bounds": """
            SELECT user_id, min(event_id) AS min_pos, max(event_id) AS max_pos,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "cdc_txn_summary": f"""
            WITH t AS (SELECT event_id, event_id // 16 AS txn_id, {op_case} AS op FROM events)
            SELECT txn_id, count(*) AS n_events, max(event_id) AS last_pos,
                   CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_row_events
            FROM t GROUP BY txn_id
            HAVING sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) > 0
        """,
        "cdc_filter_regex": """
            SELECT event_type, count(*) AS n FROM events
            WHERE regexp_full_match(event_type, '(click|view)')
            GROUP BY event_type
        """,
        "cdc_mixed_types": """
            WITH base AS (
              SELECT o_orderkey AS k,
                     CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS bal0,
                     CAST(epoch(o_orderdate) AS BIGINT) AS sec0,
                     o_orderstatus AS st, o_orderpriority AS pri
              FROM orders)
            SELECT 'ord' || k AS doc_id,
              CASE WHEN k % 7 = 0 THEN (CAST(bal0 AS HUGEINT) * 1000000000000 + 1)::VARCHAR
                   WHEN k % 5 = 0 THEN (bal0 + 7)::VARCHAR
                   ELSE bal0::VARCHAR END AS bal_str,
              CASE WHEN k % 7 = 0 THEN sec0*1000 + 123
                   WHEN k % 5 = 0 THEN (sec0+1)*1000
                   ELSE sec0*1000 END AS updated_ms,
              CASE WHEN k % 7 = 0 THEN 'big'
                   WHEN k % 5 = 0 THEN 'upd'
                   ELSE pri END AS tag,
              CASE WHEN k % 7 = 0 THEN hex(encode(pri || 'X'))
                   WHEN k % 5 = 0 THEN hex(encode(st || '0'))
                   ELSE hex(encode(st)) END AS payload_hex
            FROM base WHERE k % 11 <> 0
        """,
        "cdc_projection_flat": f"""
            SELECT 'testdata' AS database, 'events' AS "table", event_id AS pk,
                   {op_case} AS type, ts AS es, value AS data_value, props AS data_props
            FROM events
        """,
        "cdc_dedup_positions": """
            SELECT event_type, count(DISTINCT event_id) AS n_distinct
            FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
            GROUP BY event_type
        """,
        "cdc_kway_merge": """
            SELECT event_id, user_id, ts FROM events ORDER BY ts, event_id LIMIT 100
        """,
        "dedup_exact_docs": """
            SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM documents GROUP BY text
        """,
        "dedup_survivors": """
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
              FROM documents)
            WHERE rn = 1
        """,
        "text_token_counts": r"""
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok_ws,
                   CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tok_bpe
            FROM documents
        """,
        "text_quality": f"""
            WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                          FROM documents),
                 cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
                 tot AS (SELECT sum(c) AS t FROM cnt),
                 -- unigram-LM mean token NLL: ln(total) - avg(ln(count)),
                 -- x1e4 half-up (mirrors functions.text.lm_nll_batch)
                 lm AS (SELECT doc_id,
                               CAST(floor(1e4 * (ln(t) - avg(ln(c))) + 0.5) AS BIGINT)
                                   AS lm_nll_e4
                        FROM toks JOIN cnt USING (w), tot
                        GROUP BY doc_id, t)
            SELECT d.doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   round(CAST(len(list_filter(string_split(text, ' '),
                                              x -> list_contains({STOPLIST_SQL}, x))) AS DOUBLE)
                         / len(string_split(text, ' ')), 6) AS stop_ratio,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(text) >= 100 AND length(text) <= 2000
                        AND round(CAST(len(list_filter(string_split(text, ' '),
                                                       x -> list_contains({STOPLIST_SQL}, x))) AS DOUBLE)
                                  / len(string_split(text, ' ')), 6) > 0.02 AS INTEGER) AS is_quality,
                   md5(lower(text)) AS fp,
                   lm.lm_nll_e4
            FROM documents d JOIN lm USING (doc_id)
        """,
        "lang_id": r"""
            WITH d AS (SELECT doc_id, lower(substr(text,1,500)) AS head,
                              substr(text,1,200) AS head200 FROM documents),
            cjk AS (SELECT doc_id,
                           length(head200) - length(regexp_replace(head200, '[\x{4e00}-\x{9fff}]', '', 'g')) AS n_cjk
                    FROM d),
            words AS (SELECT doc_id, list_distinct(regexp_extract_all(head, '[a-z]+')) AS ws FROM d),
            scores AS (
              SELECT w.doc_id, l.lang, len(list_intersect(w.ws, l.markers)) AS score
              FROM words w CROSS JOIN (VALUES
                ('en', ['the','and','of','is','to','a','in','that']),
                ('de', ['der','die','das','und','ist','nicht','ein']),
                ('fr', ['le','la','les','et','est','une','pas']),
                ('es', ['el','la','los','y','es','una','no'])) AS l(lang, markers)),
            best AS (SELECT doc_id, lang, score,
                            row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
                     FROM scores)
            SELECT d.doc_id,
                   CASE WHEN c.n_cjk > 5 THEN 'zh'
                        WHEN b.score > 0 THEN b.lang
                        ELSE 'en' END AS pred_lang
            FROM d JOIN cjk c USING (doc_id) JOIN best b USING (doc_id)
            WHERE b.rn = 1
        """,
        "multimodal_features": r"""
            SELECT 'm' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS media_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   CAST(length(text) - length(regexp_replace(text, '[\x00-\x1f]', '', 'g')) AS BIGINT) AS f0_count
            FROM documents
        """,
        "simhash_docs": """
            WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
            h AS (SELECT doc_id, CAST(md5_number_upper(word) AS UBIGINT) AS h FROM w),
            v AS (SELECT doc_id, b, sum(CAST((h >> b) & 1 AS BIGINT)) AS ones, count(*) AS n
                  FROM h CROSS JOIN range(64) t(b) GROUP BY doc_id, b)
            SELECT doc_id,
                   lpad(lower(to_hex(CAST(sum(CASE WHEN ones*2 >= n
                                                   THEN (CAST(1 AS UBIGINT) << b)
                                                   ELSE CAST(0 AS UBIGINT) END) AS UBIGINT))),
                        16, '0') AS simhash_hex
            FROM v GROUP BY doc_id
        """,
        "minhash_verified": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
            sh AS (SELECT doc_id,
                     CASE WHEN len(s) < 3 THEN [array_to_string(s, ' ')]
                          ELSE list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
                                              for i in range(1, len(s)-1)])
                     END AS g
                   FROM t),
            pairs AS (SELECT a.doc_id AS a, b.doc_id AS b,
                             CAST(len(list_distinct(list_intersect(a.g, b.g))) AS DOUBLE)
                               / len(list_distinct(list_concat(a.g, b.g))) AS jac
                      FROM sh a, sh b WHERE a.doc_id < b.doc_id)
            SELECT a, b, CAST(floor(jac*1000000 + 0.5) AS BIGINT) AS jac_e6
            FROM pairs WHERE jac >= 0.4
        """,
        "minhash_clusters": """
            WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
            sh AS (SELECT doc_id,
                     CASE WHEN len(s) < 3 THEN [array_to_string(s, ' ')]
                          ELSE list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
                                              for i in range(1, len(s)-1)])
                     END AS g
                   FROM t),
            pairs AS (SELECT a.doc_id AS a, b.doc_id AS b
                      FROM sh a, sh b WHERE a.doc_id < b.doc_id
                        AND CAST(len(list_distinct(list_intersect(a.g, b.g))) AS DOUBLE)
                            / len(list_distinct(list_concat(a.g, b.g))) >= 0.4),
            edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
            walk(node, label) AS (
                SELECT u, u FROM (SELECT DISTINCT u FROM edges) t1(u)
                UNION
                SELECT e.v, w.label FROM walk w JOIN edges e ON w.node = e.u
            )
            SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster
            FROM walk GROUP BY node
        """,
        "ngram_jaccard_pairs": """
            SELECT a.doc_id AS a, b.doc_id AS b, round(jaccard(a.text, b.text), 4) AS jac
            FROM documents a, documents b
            WHERE a.doc_id < 60 AND b.doc_id < 60 AND a.doc_id < b.doc_id
              AND round(jaccard(a.text, b.text), 4) >= 0.5
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS qi, embedding::DOUBLE[] AS qe
                       FROM embeddings WHERE vec_id < 3)
            SELECT q.qi AS query_i, e.vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 4) AS cos_sim
            FROM embeddings e, q
            QUALIFY row_number() OVER (
                PARTITION BY q.qi
                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qe) DESC, e.vec_id) <= 10
        """,
        "embedding_dups": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos_sim
            FROM embeddings a, embeddings b
            WHERE a.vec_id < 300 AND b.vec_id < 300 AND a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
        """,
        "asof_latest_order": """
            WITH od AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                        FROM orders GROUP BY o_custkey, o_orderdate)
            SELECT 'asof' AS join_kind, e.event_id AS left_id, o.o_orderkey AS right_id
            FROM events e ASOF JOIN od o
              ON e.user_id = o.o_custkey AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)
            UNION ALL
            SELECT 'range' AS join_kind, b.event_id AS left_id, a.event_id AS right_id
            FROM events a JOIN events b ON a.user_id = b.user_id
              AND b.ts >= a.ts - INTERVAL 6 HOUR AND b.ts < a.ts
        """,
        "events_windowed": """
            SELECT (CAST(epoch_ms(ts) AS BIGINT) // 3600000) * 3600000 AS window_start,
                   event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_val_cents
            FROM events GROUP BY 1, 2
        """,
        "events_hopping": """
            WITH e AS (SELECT CAST(epoch_ms(ts) AS BIGINT) AS tms, event_type,
                              CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
                       FROM events),
            w AS (SELECT e.*, unnest(generate_series(
                      (tms // 900000) * 900000 - 2700000,
                      (tms // 900000) * 900000,
                      900000)) AS window_start
                  FROM e)
            SELECT window_start, event_type,
                   count(*) AS n_events,
                   CAST(sum(vc) AS BIGINT) AS sum_val_cents
            FROM w GROUP BY 1, 2
        """,
        "events_sessionized": """
            WITH x AS (
              SELECT user_id, ts,
                     CASE WHEN CAST(epoch_ms(ts) AS BIGINT)
                            - CAST(epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS BIGINT)
                          > 3600000 THEN 1 ELSE 0 END AS brk
              FROM events),
            s AS (SELECT user_id, ts,
                         sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS session_id
                  FROM x)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, session_id
        """,
        "text_repetition": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
            bg AS (SELECT doc_id, unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS g
                   FROM t WHERE len(s) >= 2),
            bc AS (SELECT doc_id, g, count(*) AS n FROM bg GROUP BY doc_id, g),
            b AS (SELECT doc_id,
                         CAST(floor(CAST(max(n) AS DOUBLE) / sum(n) * 1000000 + 0.5) AS BIGINT) AS top_bigram_e6
                  FROM bc GROUP BY doc_id),
            tg AS (SELECT doc_id, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
                                          for i in range(1, len(s)-1)]) AS g
                   FROM t WHERE len(s) >= 3),
            tr AS (SELECT doc_id,
                          CAST(floor((1 - CAST(count(DISTINCT g) AS DOUBLE) / count(*)) * 1000000 + 0.5) AS BIGINT) AS dup_trigram_e6
                   FROM tg GROUP BY doc_id)
            SELECT t.doc_id,
                   COALESCE(b.top_bigram_e6, 0) AS top_bigram_e6,
                   COALESCE(tr.dup_trigram_e6, 0) AS dup_trigram_e6
            FROM t LEFT JOIN b USING (doc_id) LEFT JOIN tr USING (doc_id)
        """,
        "corpus_decontaminate": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
            g AS (SELECT doc_id,
                         CASE WHEN len(s) < 5 THEN [array_to_string(s, ' ')]
                              ELSE list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
                                                  || ' ' || s[i+3] || ' ' || s[i+4]
                                                  for i in range(1, len(s)-3)])
                         END AS grams
                  FROM t),
            eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
            tg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0),
            h AS (SELECT doc_id, count(*) AS n_hits
                  FROM tg JOIN eg USING (gram) GROUP BY doc_id)
            SELECT g.doc_id,
                   CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(COALESCE(h.n_hits, 0) > 0 AS INTEGER) AS contaminated
            FROM g LEFT JOIN h USING (doc_id) WHERE g.doc_id % 97 <> 0
        """,
        "corpus_samples": """
            SELECT doc_id, source, 'hash' AS sampler FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 20 = 0
            UNION ALL
            SELECT doc_id, source, 'mix' AS sampler FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR) || ':' || source) % 1000
                  < 100 + (CAST(substr(source, 4) AS BIGINT) % 5) * 200
        """,
        "corpus_shard_assign": """
            WITH t AS (SELECT doc_id,
                              md5_number_lower(CAST(doc_id AS VARCHAR)) AS h
                       FROM documents)
            SELECT doc_id,
                   CAST(h % 16 AS BIGINT) AS shard,
                   CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) - 1
                        AS BIGINT) AS pos
            FROM t
        """,
        "cdc_json_patch": """
            SELECT 'u' || event_id AS doc_id,
              CASE WHEN event_id % 3 = 1 THEN 'upd' ELSE event_type END AS kind,
              CASE WHEN event_id % 3 = 0 THEN -1
                   WHEN event_id % 3 = 1 THEN (CASE WHEN event_id % 6 = 1 THEN 99 ELSE -1 END)
                   ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS meta_k,
              CASE WHEN event_id % 3 = 0 THEN event_id % 7 ELSE -1 END AS meta_q,
              CASE WHEN event_id % 3 = 1 THEN event_id % 5 ELSE -1 END AS meta_r
            FROM events WHERE event_id % 10 <> 7
        """,
        "corpus_span_dedup": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
            sp0 AS (SELECT doc_id,
                           unnest([{'i': i, 'sp': array_to_string(s[i*10+1 : i*10+10], ' ')}
                                   for i in range(0, CAST(ceil(len(s) / 10.0) AS BIGINT))]) AS u
                    FROM t),
            sp AS (SELECT doc_id, u.i AS span_idx, u.sp AS span FROM sp0)
            SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
                   CAST(CASE WHEN row_number() OVER (PARTITION BY span
                                                     ORDER BY doc_id, span_idx) = 1
                             THEN 1 ELSE 0 END AS INTEGER) AS kept
            FROM sp
        """,
        "cdc_payload_mask": """
            SELECT event_id,
                   regexp_replace(props, '[0-9]+', '#', 'g') AS props_masked,
                   CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_masked
            FROM events
        """,
        "cdc_mq_routing": """
            SELECT CAST(md5_number_lower(CAST(user_id AS VARCHAR)) % 8 AS BIGINT) AS mq_partition,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys
            FROM events GROUP BY 1
        """,
        "corpus_token_histogram": """
            WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
            c AS (SELECT word, count(*) AS n FROM w GROUP BY word)
            SELECT word, n FROM c ORDER BY n DESC, word LIMIT 100
        """,
        "corpus_topk_per_source": """
            SELECT doc_id, source, CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY source ORDER BY length(text) DESC, doc_id) <= 5
        """,
        "corpus_token_quantiles": """
            WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                       FROM documents)
            SELECT CAST(0.5 AS DOUBLE) AS q,
                   CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) AS value FROM t
            UNION ALL
            SELECT CAST(0.9 AS DOUBLE),
                   CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) FROM t
            UNION ALL
            SELECT CAST(0.99 AS DOUBLE),
                   CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n_tokens) AS BIGINT) FROM t
        """,
        "corpus_pack_sequences": """
            WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                       FROM documents),
            c AS (SELECT doc_id, n_tokens,
                         CAST(COALESCE(sum(n_tokens) OVER (
                             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                             0) AS BIGINT) AS tok_offset
                  FROM t)
            SELECT doc_id, n_tokens, tok_offset,
                   tok_offset // 2048 AS first_window,
                   (tok_offset + greatest(n_tokens, 1) - 1) // 2048 AS last_window
            FROM c
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
                   CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders_by_revenue": """
            SELECT l_orderkey,
                   CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
                   o_custkey
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            GROUP BY l_orderkey, o_custkey
            ORDER BY rev_cents DESC, l_orderkey LIMIT 10
        """,
        "analytic_dim_counts": """
            SELECT n_name, count(*) AS n_customers,
                   (SELECT count(DISTINCT p_type) FROM part) AS n_part_types
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
    }
