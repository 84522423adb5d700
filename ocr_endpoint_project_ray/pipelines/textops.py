"""Text-analysis / training-data queries over the ``documents`` and
``embeddings`` tables: dedup, fingerprinting, token counting, quality
scoring, CER scoring, source ranking, ANN — each Ray-Data-first with a DuckDB
oracle where SQL can express the semantics (the rest are registered as
rows-only checks in ``__ray_entry__``)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..functions.agg import Agg, grouped_agg
from ..functions.metrics import edit_distance
from ..functions.text import (
    count_tokens_ws,
    detect_language_batch,
    md5_hex_batch,
    normalize_text_array,
    quality_features,
    rolling_fingerprint,
)
from ..sources.tables import read_table
from ..stages.ann import ann_topk, ann_topk_lsh
from ..stages.dedup import exact_dedup_by_content, minhash_lsh_pairs, simhash_batch
from .reports import borda_rank, condorcet_wins, recommend_best

# ---------------------------------------------------------------------------
# SQL-oracled queries
# ---------------------------------------------------------------------------


def q14_doc_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact content dedup: keeper (min doc_id) + dup_count per distinct text."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup_by_content(ds, content_col="text", id_col="doc_id")


def q15_doc_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Content fingerprint (md5) per document."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _fp(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"), "fp": md5_hex_batch(b.column("text"))})

    return ds.map_batches(_fp, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def q16_token_counts(sf_dir: str) -> ray.data.Dataset:
    """Whitespace token count per doc (vectorized regex count)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _tok(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": pc.cast(count_tokens_ws(b.column("text")), pa.int64()),
            }
        )

    return ds.map_batches(_tok, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def q17_doc_quality(sf_dir: str) -> ray.data.Dataset:
    """Per-doc quality features (length + character-class ratios)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _q(b: pa.Table) -> pa.Table:
        f = quality_features(b.column("text"))
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars_calc": f["n_chars"],
                "alpha_ratio": f["alpha_ratio"],
                "digit_ratio": f["digit_ratio"],
                "space_ratio": f["space_ratio"],
            }
        )

    return ds.map_batches(_q, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def q18_lang_stats(sf_dir: str) -> ray.data.Dataset:
    ds = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    out = grouped_agg(
        ds,
        ["lang"],
        [Agg("n_docs", "n_chars", "count_rows"), Agg("avg_chars", "n_chars", "mean")],
        small_groups=True,
    )
    return out


def q19_cer_scores(sf_dir: str) -> ray.data.Dataset:
    """CER between the normalized doc prefix and a deterministic perturbation
    (e→3) — exercises the real Levenshtein DP (ocr_common.py:118-141
    semantics) against DuckDB's levenshtein()."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _cer(b: pa.Table) -> pa.Table:
        prefix = pc.utf8_slice_codeunits(b.column("text"), 0, 256)
        # ASCII normalization to mirror the SQL oracle's '[^a-z0-9_ ]'
        # exactly (the engine's general normalize_text_array keeps Unicode
        # letters, which ANSI SQL can't express portably — this query pins
        # the DP against DuckDB levenshtein, so both sides go ASCII)
        lowered = pc.utf8_lower(prefix)
        no_punct = pc.replace_substring_regex(lowered, r"[^a-z0-9_ ]", " ")
        collapsed = pc.replace_substring_regex(no_punct, r" +", " ")
        gt_arr = pc.utf8_trim(collapsed, " ")
        gts = gt_arr.to_pylist()
        # dist*100.0/len, in exactly this operation order — the SQL twin
        # computes levenshtein(gt,pred)*100.0/length(gt) and a different op
        # order differs by one ulp (enough to break an exact value-hash)
        scores = [
            (edit_distance(list(g), list(g.replace("e", "3"))) * 100.0 / len(g)) if g else 0.0
            for g in gts
        ]
        return pa.table(
            {"doc_id": b.column("doc_id"), "cer_pct": pa.array(scores, pa.float64())}
        )

    return ds.map_batches(_cer, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def _source_stats(sf_dir: str) -> pa.Table:
    """Per-source aggregate (distributed) collected to a tiny driver table."""
    ds = read_table(sf_dir, "documents", columns=["source", "n_chars"])
    agg = grouped_agg(
        ds,
        ["source"],
        [Agg("avg_chars", "n_chars", "mean"), Agg("n_docs", "n_chars", "count_rows")],
        small_groups=True,
    )
    return pa.Table.from_pylist(agg.take_all())


def q20_borda_sources(sf_dir: str) -> pa.Table:
    """Borda ranking of sources on (avg_chars, n_docs) — ≙ R1."""
    return borda_rank(
        _source_stats(sf_dir), "source", {"avg_chars": True, "n_docs": True}
    )


def q21_condorcet_sources(sf_dir: str) -> pa.Table:
    """Criterion-wins count — ≙ R2."""
    return condorcet_wins(_source_stats(sf_dir), "source", {"avg_chars": True, "n_docs": True})


def q22_recommend_source(sf_dir: str) -> pa.Table:
    """Multi-key sort → top-1 — ≙ R3/R4."""
    stats = _source_stats(sf_dir)
    best = recommend_best(
        stats,
        [("avg_chars", "descending"), ("n_docs", "descending")],
        tiebreak="source",
    )
    return pa.table(
        {
            "source": best.column("source"),
            "avg_chars": best.column("avg_chars"),
        }
    )


def q31_bpe_tokens(sf_dir: str) -> ray.data.Dataset:
    """BPE-style pre-tokenizer counts (letter runs / digit runs / single
    symbols) — the model-free proxy for token budgeting, vectorized."""
    from ..functions.text import count_tokens_bpe

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _tok(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_bpe_tokens": pc.cast(count_tokens_bpe(b.column("text")), pa.int64()),
            }
        )

    return ds.map_batches(_tok, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def q32_parse_error_categories(sf_dir: str) -> ray.data.Dataset:
    """Error-category counts over the structured-parse run log
    (≙ M15 categorize + A5 grouped counts)."""
    from ..functions.agg import Agg, grouped_agg
    from ..stages.validate import categorize_errors
    from .structured import structured_parse_pipeline

    parsed = structured_parse_pipeline(sf_dir)
    cats = parsed.map_batches(
        categorize_errors, batch_size=None, batch_format="pyarrow"
    ).select_columns(["error_category"])
    return grouped_agg(
        cats, ["error_category"], [Agg("n_docs", "error_category", "count_rows")],
        small_groups=True,
    )


def q46_top_terms(sf_dir: str) -> ray.data.Dataset:
    """Global heavy hitters: top-20 tokens by total occurrences — the
    vocabulary-building / heavy-hitter aggregation a tokenizer-training
    pipeline runs over the whole corpus.

    Scale shape: per-block vectorized tokenize + ``value_counts`` (the
    combiner — each block shrinks to its local vocabulary before any
    shuffle) → keyed repartition of (token, partial_count) → per-block final
    sum + local top-k → tiny global sort + limit. The only all-to-all moves
    vocabulary-sized data, never the corpus. Tokens are the repo-wide
    ``TOKEN_RE`` definition; ties break on token asc so the cut at rank 20
    is deterministic on both engines."""
    from ..context import default_num_partitions

    ds = read_table(sf_dir, "documents", columns=["text"])
    n = min(default_num_partitions(per_cpu=1), 8)
    K = 20

    def _partial(b: pa.Table) -> pa.Table:
        # the ONE tokenize+value_counts combiner (shared with q72/x_countmin
        # so the token split class can never drift between them)
        return _token_count_partial(b).rename_columns(["token", "n_occurrences"])

    def _final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "token" not in b.column_names:
            return pa.table(
                {"token": pa.array([], pa.string()), "n_occurrences": pa.array([], pa.int64())}
            )
        out = b.group_by(["token"], use_threads=False).aggregate([("n_occurrences", "sum")])
        out = out.rename_columns(
            ["n_occurrences" if c == "n_occurrences_sum" else c for c in out.column_names]
        )
        out = out.select(["token", "n_occurrences"])
        # local top-k: every token is fully aggregated in exactly one block
        # (keyed repartition), so the global top-k ⊆ union of block top-ks
        idx = pc.sort_indices(
            out, sort_keys=[("n_occurrences", "descending"), ("token", "ascending")]
        )
        return out.take(idx[:K])

    partial = ds.map_batches(_partial, batch_size=None, batch_format="pyarrow")
    co = partial.repartition(num_blocks=n, keys=["token"])
    tops = co.map_batches(_final, batch_size=None, batch_format="pyarrow")
    return tops.sort(["n_occurrences", "token"], descending=[True, False]).limit(K)


def q33_quality_filter(sf_dir: str) -> ray.data.Dataset:
    """Training-corpus quality filter (C4/CCNet-style rule stack): token
    bounds, alphabetic-density floor, word-diversity floor; emits keep +
    first-failing reason per doc (filtering as data, nothing silently
    dropped)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _filter(b: pa.Table) -> pa.Table:
        n_tok = pc.cast(count_tokens_ws(b.column("text")), pa.float64())
        feats = quality_features(b.column("text"))
        # distinct-word ratio with the SAME token definition as n_tokens and
        # the SQL oracle (RE2 \S+ ≡ TOKEN_RE; str.split() would disagree on
        # Unicode whitespace like NBSP)
        import re as _re

        from ..functions.text import TOKEN_RE

        tok_re = _re.compile(TOKEN_RE)
        texts = b.column("text").to_pylist()
        dwr = []
        for t in texts:
            words = tok_re.findall(t or "")
            dwr.append(len(set(words)) / len(words) if words else 0.0)
        dwr_arr = pa.array(dwr, pa.float64())

        reason = pa.array([None] * b.num_rows, pa.string())
        too_short = pc.less(n_tok, 10.0)
        low_alpha = pc.less(feats["alpha_ratio"], 0.5)
        low_diversity = pc.less(dwr_arr, 0.3)
        # precedence: too_short > low_alpha > low_diversity (CASE order)
        reason = pc.if_else(
            pc.and_(too_short, pc.is_null(reason)), pa.scalar("too_short"), reason
        )
        reason = pc.if_else(
            pc.and_(low_alpha, pc.is_null(reason)), pa.scalar("low_alpha"), reason
        )
        reason = pc.if_else(
            pc.and_(low_diversity, pc.is_null(reason)), pa.scalar("low_diversity"), reason
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tokens": pc.cast(n_tok, pa.int64()),
                "distinct_word_ratio": dwr_arr,
                "keep": pc.is_null(reason),
                "reject_reason": reason,
            }
        )

    return ds.map_batches(_filter, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def q29_hash_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic content-hash sampling (~1/16 of docs): the reproducible
    alternative to random sampling for training-data splits — the same doc
    always lands in the same split, on any cluster, any run."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def _sample(b: pa.Table) -> pa.Table:
        fps = md5_hex_batch(b.column("text"))
        mask = pc.equal(pc.utf8_slice_codeunits(fps, 0, 1), "0")
        return pa.table(
            {"doc_id": b.column("doc_id"), "lang": b.column("lang")}
        ).filter(mask)

    return ds.map_batches(_sample, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def q47_stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Stratified deterministic sample: exactly k=3 docs per language,
    ranked by content md5 — the "sample k per stratum" primitive for
    training-data inspection/eval splits, reproducible on any cluster.

    Scale shape: hash rank computed per block (vectorized md5 + doc_id
    tiebreak), per-block top-k per stratum (combiner — global top-k ⊆ union
    of block top-ks for fully-local ranks) → keyed repartition on the
    stratum → per-block final top-k. Only k×strata×blocks rows shuffle."""
    from ..context import default_num_partitions

    K = 3
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    n = min(default_num_partitions(per_cpu=1), 8)

    def _rank_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "lang" not in b.column_names:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "rk": pa.array([], pa.string()),
                }
            )
        if "rk" not in b.column_names:
            b = pa.table(
                {
                    "lang": b.column("lang"),
                    "doc_id": b.column("doc_id"),
                    "rk": md5_hex_batch(b.column("text")),
                }
            )
        b = b.take(
            pc.sort_indices(
                b,
                sort_keys=[("lang", "ascending"), ("rk", "ascending"), ("doc_id", "ascending")],
            )
        )
        import numpy as np

        langs = np.asarray(b.column("lang").to_pylist())
        new_grp = np.concatenate(([True], langs[1:] != langs[:-1]))
        grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(len(langs)), 0))
        keep = (np.arange(len(langs)) - grp_start) < K
        return b.filter(pa.array(keep))

    local = ds.map_batches(_rank_topk, batch_size=None, batch_format="pyarrow")
    co = local.repartition(num_blocks=n, keys=["lang"])
    final = co.map_batches(_rank_topk, batch_size=None, batch_format="pyarrow")
    return final.map_batches(
        lambda b: b.select(["lang", "doc_id"]) if "lang" in b.column_names else b,
        batch_size=None,
        batch_format="pyarrow",
    )


def q30_distinct_pairs(sf_dir: str) -> ray.data.Dataset:
    """Distinct (lang, source) pairs — dataset-level dedup via keyed
    first-of-run (no full sort)."""
    from ..stages.dedup import keyed_latest

    ds = read_table(sf_dir, "documents", columns=["lang", "source"])
    # lang × source is a bounded domain → coalesce the pre-deduped stream
    return keyed_latest(ds, ["lang", "source"], [], small_keys=True)


def q26_decision_scores(sf_dir: str) -> pa.Table:
    """Min-max-normalized weighted scorecard (≙ R5,
    generate_decision_report.py:70-76,158-200): per-source criteria scaled to
    [0,1] then weighted-summed. Operation order mirrors the SQL oracle so the
    doubles are bit-identical."""
    from .reports import minmax_normalize, weighted_score

    stats = _source_stats(sf_dir)
    normed = minmax_normalize(stats, ["avg_chars", "n_docs"])
    scored = weighted_score(
        normed, {"avg_chars_norm": 0.6, "n_docs_norm": 0.4}, out="decision_score"
    )
    return pa.table(
        {"source": scored.column("source"), "decision_score": scored.column("decision_score")}
    )


def q23_ann_topk(sf_dir: str) -> ray.data.Dataset:
    """Brute-force cosine top-5: queries = vec_id < 8, corpus = vec_id >= 8."""
    queries = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = queries.filter(pc.less(queries.column("vec_id"), 8))
    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _corpus_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("vec_id"), 8))

    corpus = corpus.map_batches(
        _corpus_only, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ann_topk(corpus, queries, k=5)
    return out.map_batches(
        lambda b: b.rename_columns(["query_id", "neighbor_id", "nn_rank"]),
        batch_size=None,
        batch_format="pyarrow",
    )


#: SQL char-class twin of the engine token rule (functions/text.py::TOKEN_RE =
#: RE2 ``\S+``; ASCII whitespace complement). GENERATED from Python's
#: whitespace set — never hand-typed — after r2 ADVICE caught a hand-copied
#: class that lost its ``\r`` to editor mangling. The escapes are literal
#: backslash sequences in the SQL, which DuckDB's RE2 interprets.
_WS_ESCAPES = {" ": " ", "\t": "\\t", "\n": "\\n", "\r": "\\r", "\f": "\\f", "\v": "\\v"}
assert set(_WS_ESCAPES) == set(__import__("string").whitespace), "token class drifted from \\s"
_SQL_TOKEN_PATTERN = "[^" + "".join(_WS_ESCAPES[c] for c in sorted(_WS_ESCAPES)) + "]+"

TEXT_ORACLES: dict[str, str] = {
    "q14_doc_dedup": """
        SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents GROUP BY text
    """,
    # Mirrors stages/dedup.py::simhash_batch exactly: \S+ tokens (every
    # occurrence votes), 64-bit md5-prefix token hash, per-bit sign-sum,
    # two's-complement via the j=63 term contributing -2^63.
    "q46_top_terms": f"""
        SELECT tok AS token, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM (SELECT unnest(regexp_extract_all(text, '{_SQL_TOKEN_PATTERN}')) AS tok
              FROM documents)
        GROUP BY tok
        ORDER BY n_occurrences DESC, token ASC
        LIMIT 20
    """,
    "q41_simhash": """
        WITH toks AS (
            SELECT doc_id, unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS w
            FROM documents),
        hs AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h FROM toks),
        bits AS (
            SELECT doc_id, j.j AS j,
                   sum(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM hs CROSS JOIN (SELECT unnest(range(64)) AS j) j
            GROUP BY doc_id, j.j),
        acc AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN v <= 0 THEN 0
                                 WHEN j = 63 THEN -9223372036854775808
                                 ELSE (1::BIGINT << CAST(j AS INTEGER)) END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(a.simhash, 0) AS simhash
        FROM documents d LEFT JOIN acc a USING (doc_id)
    """,
    # Mirrors functions/text.py::rolling_fingerprint: 16-codepoint windows
    # (full doc when shorter), h = sum(cp * base^(w-1-j) mod p) mod p with
    # p = 2^31-1, fingerprint = XOR over all window hashes. The pow table is
    # precomputed (base 1000003 mod p).
    "q42_rolling_fingerprint": """
        WITH p(e, v) AS (VALUES
            (0, 1), (1, 1000003), (2, 1426104154), (3, 1049561761),
            (4, 1604566856), (5, 1953433226), (6, 2061642598), (7, 57298384),
            (8, 1544709545), (9, 1274554124), (10, 633364108), (11, 66148026),
            (12, 1433149184), (13, 206851044), (14, 1744706798), (15, 1828017126)),
        d AS (SELECT doc_id, COALESCE(text, '') AS text,
                     length(COALESCE(text, '')) AS n
              FROM documents),
        starts AS (
            SELECT doc_id, text, n, LEAST(n, 16) AS w, t.s AS s
            FROM d, unnest(range(GREATEST(n - 15, CASE WHEN n = 0 THEN 0 ELSE 1 END))) AS t(s)),
        terms AS (
            SELECT st.doc_id, st.s,
                   (CAST(unicode(substr(st.text, CAST(st.s + j.j + 1 AS INTEGER), 1)) AS BIGINT)
                    * p.v) % 2147483647 AS t
            FROM starts st
            JOIN (SELECT unnest(range(16)) AS j) j ON j.j < st.w
            JOIN p ON p.e = st.w - 1 - j.j),
        wh AS (SELECT doc_id, s, CAST(sum(t) % 2147483647 AS BIGINT) AS h
               FROM terms GROUP BY doc_id, s),
        fp AS (SELECT doc_id, bit_xor(h) AS fp64 FROM wh GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(fp.fp64, 0) AS fp64
        FROM d LEFT JOIN fp USING (doc_id)
    """,
    "q15_doc_fingerprint": """
        SELECT doc_id, md5(text) AS fp FROM documents
    """,
    "q16_token_counts": """
        SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens FROM documents
    """,
    "q17_doc_quality": """
        SELECT doc_id,
               length(text) AS n_chars_calc,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text) END
                   AS alpha_ratio,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) END
                   AS digit_ratio,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE (length(text) - length(replace(text, ' ', ''))) * 1.0 / length(text) END
                   AS space_ratio
        FROM documents
    """,
    "q18_lang_stats": """
        SELECT lang, count(*) AS n_docs, avg(n_chars) AS avg_chars
        FROM documents GROUP BY lang
    """,
    "q19_cer_scores": """
        WITH t AS (
            SELECT doc_id,
                   trim(regexp_replace(
                        regexp_replace(lower(substr(text, 1, 256)), '[^a-z0-9_ ]', ' ', 'g'),
                        ' +', ' ', 'g')) AS gt
            FROM documents)
        SELECT doc_id,
               CASE WHEN length(gt) = 0 THEN 0.0
                    ELSE levenshtein(gt, replace(gt, 'e', '3')) * 100.0 / length(gt) END
                   AS cer_pct
        FROM t
    """,
    "q20_borda_sources": """
        WITH s AS (SELECT source, avg(n_chars) AS ac, count(*) AS nd
                   FROM documents GROUP BY source),
             r1 AS (SELECT source, row_number() OVER (ORDER BY ac DESC, source ASC) AS rn1 FROM s),
             r2 AS (SELECT source, row_number() OVER (ORDER BY nd DESC, source ASC) AS rn2 FROM s),
             n AS (SELECT count(*) AS n FROM s)
        SELECT s.source, CAST((n.n - r1.rn1) + (n.n - r2.rn2) AS DOUBLE) AS borda_points
        FROM s CROSS JOIN n
        JOIN r1 ON s.source = r1.source
        JOIN r2 ON s.source = r2.source
    """,
    "q21_condorcet_sources": """
        WITH s AS (SELECT source, avg(n_chars) AS ac, count(*) AS nd
                   FROM documents GROUP BY source),
             m AS (SELECT max(ac) AS mac, max(nd) AS mnd FROM s)
        SELECT source, CAST((CASE WHEN ac = mac THEN 1 ELSE 0 END) +
                            (CASE WHEN nd = mnd THEN 1 ELSE 0 END) AS BIGINT) AS wins
        FROM s CROSS JOIN m
    """,
    "q22_recommend_source": """
        WITH s AS (SELECT source, avg(n_chars) AS ac, count(*) AS nd
                   FROM documents GROUP BY source)
        SELECT source, ac AS avg_chars FROM s
        ORDER BY ac DESC, nd DESC, source ASC LIMIT 1
    """,
    "q31_bpe_tokens": """
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]'))
                   AS n_bpe_tokens
        FROM documents
    """,
    "q32_parse_error_categories": """
        SELECT CASE WHEN doc_id % 4 = 3 THEN 'invalid_json' ELSE 'none' END
                   AS error_category,
               count(*) AS n_docs
        FROM documents GROUP BY 1
    """,
    "q33_quality_filter": """
        WITH f AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+')) AS n_tokens,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                             / length(text) END AS alpha_ratio,
                   CASE WHEN len(regexp_extract_all(text, '\\S+')) = 0 THEN 0.0
                        ELSE len(list_distinct(regexp_extract_all(text, '\\S+'))) * 1.0
                             / len(regexp_extract_all(text, '\\S+')) END
                       AS distinct_word_ratio
            FROM documents)
        SELECT doc_id, n_tokens, distinct_word_ratio,
               (n_tokens >= 10 AND alpha_ratio >= 0.5 AND distinct_word_ratio >= 0.3) AS keep,
               CASE WHEN n_tokens < 10 THEN 'too_short'
                    WHEN alpha_ratio < 0.5 THEN 'low_alpha'
                    WHEN distinct_word_ratio < 0.3 THEN 'low_diversity'
                    ELSE NULL END AS reject_reason
        FROM f
    """,
    "q29_hash_sample": """
        SELECT doc_id, lang FROM documents WHERE substr(md5(text), 1, 1) = '0'
    """,
    "q49_frame_sample": """
        WITH m AS (
            SELECT printf('doc%010d', doc_id) AS doc_str,
                   'media://' || printf('doc%010d', doc_id) || '/' || j.j AS media_ref
            FROM documents, unnest(range(2)) AS j(j)),
        t AS (
            SELECT doc_str, media_ref,
                   ('0x' || substr(md5(media_ref), 3, 2))::INT % 3 AS tsel,
                   ('0x' || substr(md5(media_ref), 5, 2))::INT % 5 AS nsel
            FROM m)
        SELECT doc_str AS doc_id, media_ref,
               CAST(f.f AS INTEGER) AS frame_no,
               media_ref || '#' || f.f AS frame_ref
        FROM t, unnest(range(nsel + 1)) AS f(f)
        WHERE tsel = 2
    """,
    "q47_stratified_sample": """
        SELECT lang, doc_id FROM (
            SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY md5(COALESCE(text, '')) ASC, doc_id ASC) AS rn
            FROM documents)
        WHERE rn <= 3
    """,
    "q30_distinct_pairs": """
        SELECT DISTINCT lang, source FROM documents
    """,
    "q26_decision_scores": """
        WITH s AS (SELECT source, avg(n_chars) AS ac, count(*) AS nd
                   FROM documents GROUP BY source),
             m AS (SELECT min(ac) AS mna, max(ac) AS mxa,
                          min(nd) AS mnn, max(nd) AS mxn FROM s)
        SELECT source,
               0.6 * (CASE WHEN mxa = mna THEN 1.0
                           ELSE (ac - mna) / (mxa - mna) END)
             + 0.4 * (CASE WHEN mxn = mnn THEN 1.0
                           ELSE (nd - mnn) * 1.0 / (mxn - mnn) END)
                   AS decision_score
        FROM s CROSS JOIN m
    """,
    "q23_ann_topk": """
        WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < 8),
             c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ce
                   FROM embeddings WHERE vec_id >= 8),
             s AS (SELECT qid, nid, list_cosine_similarity(qe, ce) AS sim
                   FROM q CROSS JOIN c)
        SELECT qid AS query_id, nid AS neighbor_id, nn_rank FROM (
            SELECT qid, nid,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS nn_rank
            FROM s) WHERE nn_rank <= 5
    """,
}

# ---------------------------------------------------------------------------
# Rows-only queries (semantics SQL can't express — driver records row checks)
# ---------------------------------------------------------------------------


def q45_langid(sf_dir: str) -> ray.data.Dataset:
    """Stopword-heuristic language ID per doc — SQL-oracled: the heuristic
    (distinct first-512 normalized words ∩ per-language stopword sets,
    argmax with lexicographic tiebreak) is mirrored exactly in DuckDB from
    the same ``_STOPWORDS`` constant (ASCII corpus, verified)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _lid(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": b.column("doc_id"), "pred_lang": detect_language_batch(b.column("text"))}
        )

    return ds.map_batches(_lid, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def q41_simhash(sf_dir: str) -> ray.data.Dataset:
    """SimHash per doc, SQL-oracled bit-for-bit (md5 token hashes +
    DuckDB bit arithmetic reproduce the signed-int64 value)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def q42_rolling_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Rolling mod-p codepoint-polynomial fingerprint per doc, SQL-oracled
    (unicode()/bit_xor in DuckDB mirror the exact arithmetic)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _fp(b: pa.Table) -> pa.Table:
        fps = [rolling_fingerprint(t or "") for t in b.column("text").to_pylist()]
        return pa.table({"doc_id": b.column("doc_id"), "fp64": pa.array(fps, pa.int64())})

    return ds.map_batches(_fp, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


#: Text tables under this many bytes on disk broadcast for Jaccard verify;
#: larger corpora use the sharded (join-by-doc_id) verify path.
_BROADCAST_VERIFY_BYTES = 1 << 30


def x_minhash_pairs(sf_dir: str) -> ray.data.Dataset:
    """MinHash+LSH near-dup candidate pairs, Jaccard-verified ≥ 0.5.

    Verification is size-dispatched: while the text table fits a worker
    heap it broadcasts once (ray.put) — two extra all-to-all shuffles of the
    corpus would cost far more; past ``_BROADCAST_VERIFY_BYTES`` the sharded
    path joins text shards by doc_id so no node holds the corpus. A pytest
    asserts the two paths agree pair-for-pair."""
    import os

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    if os.path.getsize(f"{sf_dir}/documents.parquet") <= _BROADCAST_VERIFY_BYTES:
        texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        return minhash_lsh_pairs(docs, threshold=0.5, verify_texts=texts)
    verify = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_lsh_pairs(docs, threshold=0.5, verify_docs=verify)


def x_ann_lsh(sf_dir: str) -> ray.data.Dataset:
    """LSH-bucketed approximate ANN (scale path of q23)."""
    queries = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = queries.filter(pc.less(queries.column("vec_id"), 8))
    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _corpus_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("vec_id"), 8))

    corpus = corpus.map_batches(
        _corpus_only, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return ann_topk_lsh(corpus, queries, k=5)


def x_embed_dupes(sf_dir: str) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs via hyperplane-LSH buckets."""
    from ..stages.ann import embedding_dupe_pairs

    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_dupe_pairs(corpus, threshold=0.9)


def x_ann_ivf(sf_dir: str) -> ray.data.Dataset:
    """IVF-bucketed approximate ANN (kmeans coarse quantizer, n_probe clusters)."""
    from ..stages.ann import ann_topk_ivf

    queries = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = queries.filter(pc.less(queries.column("vec_id"), 8))
    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _corpus_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("vec_id"), 8))

    corpus = corpus.map_batches(
        _corpus_only, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return ann_topk_ivf(corpus, queries, k=5)


def x_minhash_groups(sf_dir: str) -> ray.data.Dataset:
    """Near-dup clusters: MinHash+LSH candidate pairs → Jaccard verify →
    connected components (doc_id, cluster). Size-dispatched: bounded pair
    sets use driver union-find, large ones the distributed min-label
    propagation (``dup_groups_distributed``); a pytest asserts the two paths
    label identically."""
    from ..stages.dedup import dup_groups_auto

    pairs_ds = x_minhash_pairs(sf_dir)
    return dup_groups_auto(pairs_ds, num_partitions=8)


def x_approx_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """HLL approximate distinct user_id per event_type (mergeable-sketch
    aggregation — fixed-size registers shuffle instead of values)."""
    from ..functions.sketch import approx_distinct

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_distinct(ds, ["event_type"], "user_id")


def q50_approx_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """HLL approximate COUNT(DISTINCT) — SQL-ORACLED. The full sketch
    pipeline (hash → register route → rank → max-merge → estimate) runs
    distributed, and DuckDB reproduces it bit-for-bit because (a) the hash is
    the md5-prefix uint64 both engines compute identically, (b) the register
    ranks are integer bit arithmetic, and (c) the estimate carries
    S = Σ2^-reg as an exact integer S_num so each side performs exactly ONE
    IEEE division by the shared constant (functions/sketch.py::
    exact_arith_constant). p=4 keeps the oracle's register grid small; the
    production path (x_approx_distinct_users) uses blake2b at p=12."""
    from ..functions.sketch import approx_distinct

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_distinct(
        ds, ["event_type"], "user_id", p=4, out="approx_users", hasher="md5", arith="exact"
    )


def q72_approx_top_terms(sf_dir: str) -> ray.data.Dataset:
    """CountMin approximate heavy hitters — SQL-ORACLED. q46 computes the
    exact top-20 tokens by shuffling vocabulary-sized (token, count)
    partials; this is its bounded-memory sketch twin: each block emits ONE
    4x64 integer grid plus its count-free distinct-token set, grids merge
    by element-wise sum (CountMin is linear), and candidates take the top-20
    by the sketch's min-over-rows estimate. Every cell and estimate is
    integer arithmetic on the md5-prefix hash
    (functions/sketch.py::CountMinSketch), so DuckDB reproduces the result
    bit-for-bit — the q50 exact-arithmetic pattern with no division at all.
    w=64 forces real collisions at sf0.01 vocabulary size: the oracle
    certifies the OVERESTIMATES too, not just the happy path."""
    from ..functions.sketch import countmin_topk

    ds = read_table(sf_dir, "documents", columns=["text"])
    partials = ds.map_batches(
        _token_count_partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return countmin_topk(
        partials, "token", weight_col="n_partial", k=20, d=4, w=64, hasher="md5"
    )


def _token_count_partial(b: pa.Table) -> pa.Table:
    """q46's combiner: tokenize + per-block value_counts, so the token
    stream never materializes between stages."""
    if b.num_rows == 0 or "text" not in b.column_names:
        return pa.table(
            {"token": pa.array([], pa.string()), "n_partial": pa.array([], pa.int64())}
        )
    toks = pc.split_pattern_regex(pc.coalesce(b.column("text"), ""), "[ \t\n\r\f\v]+")
    flat = pc.list_flatten(toks)
    flat = flat.filter(pc.not_equal(flat, ""))
    vc = flat.value_counts()
    return pa.table(
        {
            "token": vc.field("values"),
            "n_partial": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


def x_countmin_heavy(sf_dir: str) -> ray.data.Dataset:
    """Production CountMin configuration — the web-vocabulary shape q72
    certifies the arithmetic for: blake2b hashing (no SQL-twin constraint),
    a 4x4096 grid (collision rate sized for real vocabularies), and the
    per-block top-m candidate stream (``candidate_topm``) so the candidate
    shuffle is O(m x n_blocks) instead of corpus-vocabulary-sized.
    Rows-only by nature: the candidate set depends on block boundaries
    (recall bounded by pytest — tests/test_sketch.py::TestCountMin)."""
    from ..functions.sketch import countmin_topk

    ds = read_table(sf_dir, "documents", columns=["text"])
    partials = ds.map_batches(
        _token_count_partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return countmin_topk(
        partials,
        "token",
        weight_col="n_partial",
        k=20,
        d=4,
        w=4096,
        hasher="blake2b",
        candidate_topm=2000,
    )


def x_approx_quantiles(sf_dir: str) -> ray.data.Dataset:
    """t-digest approximate per-group quantiles — the bounded-memory default
    for UNBOUNDED groups (q34/q40's exact kernel co-locates whole groups and
    is kept for bounded cardinalities only; a group 1000× the worker heap
    costs this path the same ~delta centroids). Rank-error bound pytest:
    tests/test_sketch.py."""
    from ..functions.sketch import approx_quantiles

    ds = read_table(sf_dir, "events", columns=["event_type", "value"])
    return approx_quantiles(ds, ["event_type"], "value", {"p50": 0.5, "p95": 0.95})


def q49_frame_sample(sf_dir: str) -> ray.data.Dataset:
    """Temporal-media explode: synthesized media rows → video subset →
    actor-pool frame sampling (1→N, order carried in frame_no). The stub
    sampler's frame set is a pure function of the media_ref, so the SQL
    oracle reproduces (doc_id, media_ref, frame_no, frame_ref) exactly."""
    from ..sources.corpus import doc_id_str
    from ..stages.media import sample_frames, synth_media_batch

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def _refs(b: pa.Table) -> pa.Table:
        ids, refs = [], []
        for i in b.column("doc_id").to_pylist():
            d = doc_id_str(i)
            for j in range(2):
                ids.append(d)
                refs.append(f"media://{d}/{j}")
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()), "media_ref": pa.array(refs, pa.string())}
        )

    media = docs.map_batches(_refs, batch_size=None, batch_format="pyarrow").map_batches(
        synth_media_batch, batch_size=None, batch_format="pyarrow"
    )
    frames = sample_frames(media, concurrency=(1, 4), batch_size=128)
    return frames.map_batches(
        lambda b: b.select(["doc_id", "media_ref", "frame_no", "frame_ref"]),
        batch_size=None,
        batch_format="pyarrow",
    )


def x_media_features(sf_dir: str) -> ray.data.Dataset:
    """Multimodal plumbing: synthesize media refs → fake payloads →
    actor-pool decode/feature stage (stubbed decode, real Ray plumbing)."""
    from ..sources.corpus import doc_id_str
    from ..stages.media import media_features, synth_media_batch

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def _refs(b: pa.Table) -> pa.Table:
        ids, refs = [], []
        for i in b.column("doc_id").to_pylist():
            d = doc_id_str(i)
            for j in range(2):
                ids.append(d)
                refs.append(f"media://{d}/{j}")
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()), "media_ref": pa.array(refs, pa.string())}
        )

    media = docs.map_batches(_refs, batch_size=None, batch_format="pyarrow").map_batches(
        synth_media_batch, batch_size=None, batch_format="pyarrow"
    )
    return media_features(media, concurrency=(1, 4), batch_size=128)


def _langid_oracle_sql() -> str:
    """Build the q45 oracle from the engine's own _STOPWORDS constant, so
    the two sides can never drift."""
    from ..functions.text import _STOPWORDS

    rows = ",\n            ".join(
        f"('{lang}', '{w}')" for lang in sorted(_STOPWORDS) for w in sorted(_STOPWORDS[lang])
    )
    return f"""
        WITH sw(lang, word) AS (VALUES
            {rows}),
        w0 AS (
            SELECT doc_id,
                   regexp_extract_all(
                       regexp_replace(lower(text), '[^a-z0-9_ ]', ' ', 'g'),
                       '[^ ]+') AS toks
            FROM documents),
        w AS (
            SELECT DISTINCT doc_id, toks[CAST(t.i + 1 AS INTEGER)] AS word
            FROM w0, unnest(range(LEAST(len(toks), 512))) AS t(i)),
        hits AS (
            SELECT w.doc_id, sw.lang, count(*) AS n
            FROM w JOIN sw ON w.word = sw.word GROUP BY w.doc_id, sw.lang),
        best AS (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang ASC) AS rn
            FROM hits)
        SELECT d.doc_id, COALESCE(b.lang, 'und') AS pred_lang
        FROM documents d
        LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
    """


TEXT_ORACLES["q45_langid"] = _langid_oracle_sql()


def _q50_oracle_sql() -> str:
    """SQL twin of the md5/exact-arith HLL (q50): mirrors sketch.py register
    routing (idx = h>>60, rank = 61 − bitlen(low 60 bits), max per register),
    the integer S_num = Σ 2^(61−reg) over all 16 registers (missing → 0),
    the single division by the engine's own constant (repr round-trips the
    exact double), and the small-range CASE. Groups whose values are all
    NULL keep zeroed registers on both sides (the grid CTE)."""
    from ..functions.sketch import exact_arith_constant

    c = exact_arith_constant(4)
    return f"""
        WITH vals AS (
            SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL),
        h AS (
            SELECT event_type,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS hv
            FROM vals),
        ranks AS (
            SELECT event_type, CAST(hv >> 60 AS INTEGER) AS idx,
                   CASE WHEN hv % 1152921504606846976 = 0 THEN 61
                        ELSE 61 - length(bin(hv % 1152921504606846976)) END AS rank
            FROM h),
        regs AS (
            SELECT event_type, idx, max(rank) AS reg
            FROM ranks GROUP BY event_type, idx),
        grid AS (
            SELECT et.event_type, CAST(j.j AS INTEGER) AS idx
            FROM (SELECT DISTINCT event_type FROM events) et, unnest(range(16)) AS j(j)),
        full_regs AS (
            -- NULL-safe group match: a NULL event_type group must find its
            -- own registers (the engine groups with dropna=False), not fall
            -- to all-zero via NULL != NULL
            SELECT g.event_type, COALESCE(r.reg, 0) AS reg
            FROM grid g LEFT JOIN regs r
              ON g.event_type IS NOT DISTINCT FROM r.event_type AND g.idx = r.idx),
        snum AS (
            SELECT event_type,
                   sum(CAST(2305843009213693952 AS BIGINT) >> CAST(reg AS INTEGER)) AS s_num,
                   sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS zeros
            FROM full_regs GROUP BY event_type),
        est AS (
            SELECT event_type,
                   CAST({c!r} AS DOUBLE) / CAST(s_num AS DOUBLE) AS raw, zeros
            FROM snum)
        SELECT event_type,
               CAST(floor(CASE WHEN raw <= 40.0 AND zeros > 0
                               THEN 16.0 * ln(16.0 / zeros) ELSE raw END) AS BIGINT)
                   AS approx_users
        FROM est
    """


TEXT_ORACLES["q50_approx_distinct_users"] = _q50_oracle_sql()

# SQL twin of the md5 CountMin (q72): mirrors sketch.py bucket routing
# (b_r(t) = md5-prefix-uint64(r || ':' || t) % w), the per-cell integer sums,
# the min-over-rows estimate, and the deterministic (estimate DESC, token
# ASC) cut at k=20 — pure integer arithmetic end to end.
TEXT_ORACLES["q72_approx_top_terms"] = f"""
    WITH counts AS (
        SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(regexp_extract_all(text, '{_SQL_TOKEN_PATTERN}')) AS tok
              FROM documents)
        GROUP BY tok),
    bucketed AS (
        SELECT c.token, rs.r,
               ('0x' || substr(md5(CAST(rs.r AS VARCHAR) || ':' || c.token), 1, 16))
                   ::UBIGINT % 64 AS b,
               c.cnt
        FROM counts c CROSS JOIN (SELECT unnest(range(4)) AS r) rs),
    grid AS (SELECT r, b, sum(cnt) AS cell FROM bucketed GROUP BY r, b),
    est AS (
        SELECT bu.token, CAST(min(g.cell) AS BIGINT) AS approx_count
        FROM bucketed bu JOIN grid g ON bu.r = g.r AND bu.b = g.b
        GROUP BY bu.token)
    SELECT token, approx_count FROM est
    ORDER BY approx_count DESC, token ASC
    LIMIT 20
"""


TEXT_QUERIES = {
    "q14_doc_dedup": q14_doc_dedup,
    "q15_doc_fingerprint": q15_doc_fingerprint,
    "q16_token_counts": q16_token_counts,
    "q17_doc_quality": q17_doc_quality,
    "q18_lang_stats": q18_lang_stats,
    "q19_cer_scores": q19_cer_scores,
    "q20_borda_sources": q20_borda_sources,
    "q21_condorcet_sources": q21_condorcet_sources,
    "q22_recommend_source": q22_recommend_source,
    "q23_ann_topk": q23_ann_topk,
    "q26_decision_scores": q26_decision_scores,
    "q29_hash_sample": q29_hash_sample,
    "q31_bpe_tokens": q31_bpe_tokens,
    "q33_quality_filter": q33_quality_filter,
    "q32_parse_error_categories": q32_parse_error_categories,
    "q30_distinct_pairs": q30_distinct_pairs,
    "q45_langid": q45_langid,
    "q46_top_terms": q46_top_terms,
    "q47_stratified_sample": q47_stratified_sample,
    "q49_frame_sample": q49_frame_sample,
    "q41_simhash": q41_simhash,
    "q42_rolling_fingerprint": q42_rolling_fingerprint,
    "q50_approx_distinct_users": q50_approx_distinct_users,
    "q72_approx_top_terms": q72_approx_top_terms,
    "x_minhash_pairs": x_minhash_pairs,
    "x_ann_lsh": x_ann_lsh,
    "x_ann_ivf": x_ann_ivf,
    "x_media_features": x_media_features,
    "x_embed_dupes": x_embed_dupes,
    "x_minhash_groups": x_minhash_groups,
    "x_approx_distinct_users": x_approx_distinct_users,
    "x_approx_quantiles": x_approx_quantiles,
    "x_countmin_heavy": x_countmin_heavy,
}


# ---------------------------------------------------------------------------
# q51: exact n-gram Jaccard pairs (registered in __ray_entry__ AFTER the
# driver's 50-entry check window — new oracled queries append at the end of
# the oracled block so they can't displace driver-checked rows; see the
# ordering note in __ray_entry__.queries()).
# ---------------------------------------------------------------------------


def q51_jaccard_pairs(sf_dir: str) -> ray.data.Dataset:
    """EXACT word-3-gram Jaccard near-dup pairs over documents — the
    no-approximation counterpart of x_minhash_pairs (stages/dedup.py::
    jaccard_pairs_exact): inverted md5-shingle index, max_df=32 stop-shingle
    bound (part of the semantics, mirrored in SQL), jaccard >= 0.1."""
    from ..stages.dedup import jaccard_pairs_exact

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return jaccard_pairs_exact(ds, ngram=3, max_df=32, threshold=0.1)


#: SQL twin of q51 — md5-prefix shingle keys reproduce the engine's hashed
#: (collision-inclusive) shingle identity; jaccard is one int/int double
#: division on both sides, so the hash check is exact with no rounding.
Q51_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]), 1, 16))::UBIGINT AS s
  FROM tok, unnest(range(1, len(ts) - 1)) AS t(i)
),
keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 32),
shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard
FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
             JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.1
"""


# ---------------------------------------------------------------------------
# q52: embedding-cosine near-pair detection, SQL-oracled end-to-end
# ---------------------------------------------------------------------------


#: q52's bucket-truncation bound — ONE constant shared by the engine call
#: and the generated oracle's QUALIFY clause, so the guard itself is part
#: of the oracled semantics (r3 review: the oracle previously enumerated
#: ALL intra-bucket pairs and would diverge the day a bucket passed the
#: engine's cap).
_Q52_MAX_BUCKET = 256


def q52_embed_pairs(sf_dir: str) -> ray.data.Dataset:
    """Embedding-similarity pairs through the REAL LSH path — bucket by
    hyperplane signs, exact float64 cosine within buckets, vec_a < vec_b
    (stages/ann.py::embedding_dupe_pairs). The similarity threshold (0.35)
    is tuned to the synthetic embeddings table, which has no true near-dups
    (max pairwise cosine ≈ 0.6): the point is oracling the operator, and a
    0-row answer would prove nothing. The oracle reproduces bucketing,
    cosine, AND the max_bucket truncation guard in SQL from the engine's
    own constants, so the check covers the approximation exactly (pairs
    straddling a hyperplane, and pairs dropped by a degenerate-bucket cap,
    are absent on BOTH sides). Pairs-only output: cosine values agree only
    to summation-order ulps across engines, but pair membership is stable
    (clearance between every pair's cosine and the threshold is ≥1e-5 at
    every sf — asserted in tests/test_ann.py)."""
    from ..stages.ann import embedding_dupe_pairs

    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = embedding_dupe_pairs(
        corpus, threshold=0.35, dim=64, n_planes=6, max_bucket=_Q52_MAX_BUCKET
    )
    return pairs.map_batches(
        lambda b: b.select(["vec_a", "vec_b"]),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _q52_oracle_sql() -> str:
    """SQL twin of q52, generated from HyperplaneSigner's OWN constants
    (the q45 pattern: the oracle can't drift from the engine). Plane
    coordinates inline via repr() (17 significant digits — exact float64
    round-trip); embeddings CAST to DOUBLE[] so DuckDB's dots/cosines run
    in float64 like numpy's, keeping sign decisions and threshold
    comparisons inside the measured clearances (min |dot| ≈ 1e-7 vs
    summation noise ≈ 1e-13). The QUALIFY clause mirrors the engine's
    degenerate-bucket guard: only the first ``_Q52_MAX_BUCKET`` members of
    a bucket (by vec_id ascending — the engine's pre-truncation sort)
    participate in pair emission."""
    from ..stages.ann import HyperplaneSigner

    planes = HyperplaneSigner(64, 6)._planes  # (dim, n_planes), seed-fixed
    terms = []
    for j in range(planes.shape[1]):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket_expr = " + ".join(terms)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
b AS (
  SELECT vec_id, v, {bucket_expr} AS bucket FROM e
),
bk AS (
  SELECT vec_id, v, bucket FROM b
  QUALIFY row_number() OVER (PARTITION BY bucket ORDER BY vec_id) <= {_Q52_MAX_BUCKET}
)
SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b
FROM bk a JOIN bk b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
WHERE list_cosine_similarity(a.v, b2.v) >= 0.35
"""


Q52_ORACLE = _q52_oracle_sql()


# ---------------------------------------------------------------------------
# q53: MinHash+LSH near-dup pairs, SQL-oracled end-to-end
# ---------------------------------------------------------------------------


def q53_minhash_pairs(sf_dir: str) -> ray.data.Dataset:
    """MinHash+LSH near-dup pairs through a FULLY SQL-replayable pipeline
    (stages/dedup.py::minhash_pairs_md5): md5-seeded permutation signatures
    (16 perms, 4 bands x 4 rows), md5 band keys, over-full-bucket drop rule,
    exact md5-shingle Jaccard verify under the q51 stop-shingle bound.
    Candidate generation AND verification are mirrored in the oracle, so the
    check certifies the LSH approximation itself (pairs missed by banding
    are absent on BOTH sides), not just the verify arithmetic. x_minhash_
    pairs remains the fast production path (vectorized blake2b signatures);
    this is its auditable twin."""
    from ..stages.dedup import minhash_pairs_md5

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_pairs_md5(
        ds, ngram=3, num_perm=16, bands=4, max_bucket=64, max_df=32, threshold=0.1
    )


#: SQL twin of q53. Stage by stage: sh = distinct word-3-gram shingle
#: strings; hp = per-(doc, permutation) min of u64(md5(p||':'||shingle)) —
#: the md5-seeded permutation family; bandstr/bk = md5-64 of the
#: '|'-joined decimal signature slice (band index prefixed), matching the
#: engine's band key including hash-collision behavior; ok = buckets with
#: 2..64 members (the drop rule); cand = distinct intra-bucket pairs;
#: verify = exact Jaccard over md5-shingle sets under the max_df=32
#: stop-shingle rule (identical to Q51_ORACLE's index semantics). The
#: jaccard is one int/int double division on both sides — hash-exact.
Q53_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
  FROM tok, unnest(range(1, len(ts) - 1)) AS t(i)
),
hp AS (
  SELECT doc_id, p.p AS p,
         min(('0x' || substr(md5(CAST(p.p AS VARCHAR) || ':' || s), 1, 16))::UBIGINT) AS sig
  FROM sh, unnest(range(16)) AS p(p)
  GROUP BY doc_id, p.p
),
bandstr AS (
  SELECT doc_id, p // 4 AS band,
         CAST(p // 4 AS VARCHAR) || '#' ||
         string_agg(CAST(sig AS VARCHAR), '|' ORDER BY p) AS bs
  FROM hp GROUP BY doc_id, p // 4
),
bk AS (
  SELECT doc_id, ('0x' || substr(md5(bs), 1, 16))::UBIGINT AS bkv FROM bandstr
),
ok AS (SELECT bkv FROM bk GROUP BY bkv HAVING count(*) BETWEEN 2 AND 64),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bk a
  JOIN bk b ON a.bkv = b.bkv AND a.doc_id < b.doc_id
  JOIN ok ON ok.bkv = a.bkv
),
shh AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h FROM sh
),
keep AS (SELECT h FROM shh GROUP BY h HAVING count(*) <= 32),
shf AS (SELECT shh.doc_id, shh.h FROM shh JOIN keep USING (h)),
sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN shf a ON a.doc_id = c.doc_a
  JOIN shf b ON b.doc_id = c.doc_b AND b.h = a.h
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard
FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
             JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.1
"""


# ---------------------------------------------------------------------------
# q61: IVF ANN at full probe, SQL-oracled (exact-recovery certificate)
# ---------------------------------------------------------------------------


def q61_ann_ivf_fullprobe(sf_dir: str) -> ray.data.Dataset:
    """IVF ANN (stages/ann.py::ann_topk_ivf — kmeans coarse quantizer,
    centroid-routed scoring, per-query top-k merge) run at FULL probe
    (n_probe = n_centroids), where IVF is exact by construction. The oracle
    is q23's brute-force cosine ranking, so the driver certifies the whole
    IVF machinery — deterministic centroid training, assignment, probe
    routing, per-centroid matmul, distributed top-k merge — recovers the
    exact answer. The approximation itself (n_probe < n_centroids) is
    kmeans-dependent and not SQL-expressible; x_ann_ivf keeps that path as
    a rows-only check, and the recall-vs-probe tradeoff is pytest-bounded
    in tests/test_ann.py."""
    from ..stages.ann import ann_topk_ivf

    queries = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = queries.filter(pc.less(queries.column("vec_id"), 8))
    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _corpus_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("vec_id"), 8))

    corpus = corpus.map_batches(
        _corpus_only, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ann_topk_ivf(corpus, queries, k=5, n_centroids=16, n_probe=16)
    return out.map_batches(
        lambda b: b.rename_columns(["query_id", "neighbor_id", "nn_rank"]),
        batch_size=None,
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# q60: near-dup clustering, SQL-oracled end-to-end
# ---------------------------------------------------------------------------


def q60_dup_groups(sf_dir: str) -> ray.data.Dataset:
    """Near-dup CLUSTERING with a full SQL oracle: connected components
    (size-dispatched driver union-find / distributed min-label propagation,
    stages/dedup.py::dup_groups_auto) over the SQL-replayable MinHash+LSH
    pair set (q53's minhash_pairs_md5). The oracle rebuilds the identical
    pair set and closes it with a recursive-CTE reachability walk, so the
    check certifies candidate generation, verification, AND the clustering
    fixpoint — upgrading the capability x_minhash_groups covers rows-only
    (its blake2b pair set is deliberately not SQL-replayable; this is the
    auditable twin). Output: (doc_id, cluster = min doc_id in component),
    docs appearing in at least one verified pair."""
    from ..stages.dedup import dup_groups_auto, minhash_pairs_md5

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_pairs_md5(
        ds, ngram=3, num_perm=16, bands=4, max_bucket=64, max_df=32, threshold=0.1
    )
    return dup_groups_auto(pairs)


def _q60_oracle_sql() -> str:
    """SQL twin of q60, BUILT FROM Q53_ORACLE's own text (the q45/q52
    pattern — the pair set cannot drift from q53's): q53's CTE chain is
    reused verbatim, its final SELECT becomes the ``pairs`` CTE, and a
    recursive walk enumerates (node, reachable-label) pairs — UNION dedups,
    so the closure terminates; min(label) per node is the component's min
    doc_id, exactly ``dup_groups_from_pairs``'s labeling."""
    ctes, final_select = Q53_ORACLE.rsplit("SELECT i.doc_a", 1)
    return (
        ctes.rstrip().replace("WITH tok", "WITH RECURSIVE tok", 1)
        + ",\npairs AS (\nSELECT i.doc_a"
        + final_select.rstrip()
        + "\n),\n"
        + """nodes AS (SELECT doc_a AS d FROM pairs UNION SELECT doc_b FROM pairs),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk AS (
  SELECT d, d AS lbl FROM nodes
  UNION
  SELECT e.b AS d, w.lbl AS lbl FROM walk w JOIN edges e ON e.a = w.d
)
SELECT d AS doc_id, min(lbl) AS cluster FROM walk GROUP BY d
"""
    )


Q60_ORACLE = _q60_oracle_sql()


# ---------------------------------------------------------------------------
# q54: benchmark decontamination (cross-set substring containment)
# ---------------------------------------------------------------------------


def _bench_phrases(docs: ray.data.Dataset) -> list[str]:
    """The deterministic benchmark phrase set shared by q54 and q63: words
    4..8 (0-based [3:8]) of every doc with doc_id%100==7, doc_id<1000 — a
    bounded ≤10-phrase set at every sf, rebuildable by the SQL oracles."""

    def _phrases(b: pa.Table) -> pa.Table:
        import re

        from ..functions.text import TOKEN_RE

        tok = re.compile(TOKEN_RE)
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = []
        for i, t in zip(ids, texts):
            if i % 100 != 7 or i >= 1000:
                continue
            ws = tok.findall(t or "")
            if len(ws) >= 8:
                out.append(" ".join(ws[3:8]))
        return pa.table({"phrase": pa.array(out, pa.string())})

    return sorted(
        {r["phrase"] for r in docs.map_batches(_phrases, batch_size=None, batch_format="pyarrow").take_all()}
    )


def q54_decontaminate(sf_dir: str) -> ray.data.Dataset:
    """Benchmark decontamination: flag every document whose text contains a
    phrase from the benchmark set, reporting how many phrases hit.

    The benchmark side of a decontamination pass is naturally tiny (an eval
    suite), so the scale shape is broadcast-side containment: the phrase
    set ships to every task ONCE and each batch is scanned with vectorized
    Arrow ``match_substring`` (RE2-free plain bytes), one pass per phrase —
    no shuffle at all, the corpus streams through untouched. A MB-scale
    phrase set would move to ``ray.put`` + the per-process ref cache
    (functions/join.py pattern); the semantics don't change.

    Here the benchmark set is derived deterministically from the corpus
    itself (words 4..8 of docs with doc_id%100==7, doc_id<1000 — a bounded
    ≤10-phrase set at every sf), so the oracle can rebuild it: the source
    docs self-flag by construction and their near-dup families flag with
    them, giving a non-trivial answer at every scale.

    Reference analogue: none — training-data extension (the dedup family's
    cross-set counterpart: containment against a fixed benchmark, not
    pairwise similarity). At benchmark-suite scale (10⁵–10⁶ phrases) the
    per-phrase column scans here are the wrong shape — use
    :func:`decontaminate_hashed` (q63), which replaces them with one hashed
    n-gram membership pass."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    phrases = _bench_phrases(docs)

    def _flag(b: pa.Table) -> pa.Table:
        import numpy as np

        n = b.num_rows
        hits = np.zeros(n, dtype=np.int64)
        # Null text scores 0 hits (excluded), matching the oracle's
        # NULL-excluding `contains(d.text, …)` join; without the fill a
        # null poisons the boolean→int64 conversion below.
        col = pc.fill_null(b.column("text"), "")
        for p in phrases:
            m = pc.match_substring(col, pattern=p)
            hits += np.asarray(m.combine_chunks(), dtype=np.int64)
        keep = hits > 0
        return pa.table(
            {
                "doc_id": b.column("doc_id").filter(pa.array(keep)),
                "n_hits": pa.array(hits[keep], pa.int64()),
            }
        )

    return docs.map_batches(_flag, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


#: SQL twin of q54 — the benchmark set rebuilt from the same deterministic
#: rule (1-based inclusive list slice ts[4:8] = the engine's words[3:8]),
#: DISTINCT because near-dup source docs can share a phrase; containment is
#: plain substring on both sides (contains() vs Arrow match_substring).
Q54_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}') AS ts
  FROM documents
),
bench AS (
  SELECT DISTINCT array_to_string(ts[4:8], ' ') AS phrase
  FROM tok
  WHERE doc_id % 100 = 7 AND doc_id < 1000 AND len(ts) >= 8
)
SELECT d.doc_id, count(*) AS n_hits
FROM documents d JOIN bench b ON contains(d.text, b.phrase)
GROUP BY d.doc_id
"""


# ---------------------------------------------------------------------------
# q63: hashed decontamination (the scale path of q54)
# ---------------------------------------------------------------------------


def _hash_phrases_by_len(phrases: list[str]) -> dict[int, "np.ndarray"]:
    """Canonicalize each phrase to its TOKEN_RE tokens and md5-hash the
    space-joined form, grouped by token count L. Empty/whitespace-only
    phrases are dropped (they can't be a token n-gram of anything)."""
    import re

    import numpy as np

    from ..functions.text import TOKEN_RE
    from ..stages.dedup import _md5_hash64

    tok = re.compile(TOKEN_RE)
    by_len: dict[int, set[int]] = {}
    for p in phrases:
        ws = tok.findall(p or "")
        if ws:
            by_len.setdefault(len(ws), set()).add(_md5_hash64(" ".join(ws)))
    return {
        L: np.sort(np.fromiter(s, dtype=np.uint64, count=len(s)))
        for L, s in by_len.items()
    }


def _decontaminate_broadcast(
    docs: ray.data.Dataset, phrases: list[str], *, id_col: str, text_col: str
) -> ray.data.Dataset:
    import numpy as np

    sets_ref = ray.put(_hash_phrases_by_len(phrases))

    def _count(batch: pa.Table) -> pa.Table:
        import re

        from ..functions.text import TOKEN_RE
        from ..stages.dedup import _md5_hash64

        by_len: dict[int, np.ndarray] = ray.get(sets_ref)  # zero-copy plasma read
        tokre = re.compile(TOKEN_RE)
        texts = batch.column(text_col).to_pylist()
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        # cross-doc shingle-hash cache, BOUNDED (the _md5_sig_rows pattern):
        # a whole-block cache of every distinct L-gram string scales with
        # total block text × L and can reach GBs on large blocks. Once full
        # it stops ADMITTING new entries but keeps serving the hot ones —
        # wholesale clear() thrashed to zero hit-rate whenever a block
        # hovered around the bound (ADVICE r4).
        cache: dict[str, int] = {}
        for row, t in enumerate(texts):
            ws = tokre.findall(t or "")
            n = 0
            for L, ph in by_len.items():
                if len(ws) < L:
                    continue
                seen: set[int] = set()
                for j in range(len(ws) - L + 1):
                    s = " ".join(ws[j : j + L])
                    h = cache.get(s)
                    if h is None:
                        h = _md5_hash64(s)
                        if len(cache) < 500_000:  # bound worker memory
                            cache[s] = h
                    seen.add(h)
                arr = np.fromiter(seen, dtype=np.uint64, count=len(seen))
                # membership against the sorted phrase-hash array
                idx = np.searchsorted(ph, arr)
                in_range = idx < len(ph)
                n += int(np.count_nonzero(ph[np.minimum(idx, len(ph) - 1)][in_range] == arr[in_range]))
            hits[row] = n
        keep = pa.array(hits > 0)
        return pa.table(
            {
                # int64 pins the output type to the distributed branch's
                # sentinel-protocol schema, so both dispatch paths return
                # identically-typed results for any accepted id type
                # (ADVICE r4: an int32-id corpus used to come back int32
                # here, int64 there)
                "doc_id": pc.cast(batch.column(id_col).filter(keep), pa.int64()),
                "n_hits": pa.array(hits[hits > 0], pa.int64()),
            }
        )

    return docs.map_batches(
        _count, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def _phrase_mark_rows_all(b: pa.Table) -> pa.Table:
    """Phrase side of the distributed membership: one ``(sh, doc=-1)``
    sentinel row per tokenizable phrase, ALL lengths in one pass (the
    ``_shingle_index_block`` sentinel convention — doc ids are asserted
    non-negative int64 on the doc side). Merging lengths into one hash
    space is sound: TOKEN_RE tokens contain no spaces, so a space-joined
    n-gram string uniquely determines its token count — an L1 phrase can
    only match an L2≠L1 doc n-gram via an md5-64 collision, which both the
    per-length design and the SQL oracle already tolerate identically (the
    q51 argument)."""
    import re

    import numpy as np

    from ..functions.text import TOKEN_RE
    from ..stages.dedup import _md5_hash64

    tok = re.compile(TOKEN_RE)
    hs = []
    for p in b.column("phrase").to_pylist():
        ws = tok.findall(p or "")
        if ws:
            hs.append(int(np.uint64(_md5_hash64(" ".join(ws))).astype(np.int64)))
    return pa.table(
        {"sh": pa.array(hs, pa.int64()), "doc": pa.array([-1] * len(hs), pa.int64())}
    )


def _multi_len_shingle_rows(
    b: pa.Table, *, text_col: str, id_col: str, lengths: list[int]
) -> pa.Table:
    """Doc side of the distributed membership: distinct whole-token n-gram
    md5-64 rows for EVERY needed length in ONE tokenize pass per doc
    (ADVICE r4: the per-length design re-executed the full docs scan —
    tokenize + shingle — once per distinct phrase length). Same hash, same
    dedup-per-doc, same ``(sh, doc)`` output as ``_shingle_md5_rows``; the
    id-type/sign guards mirror its sentinel-protocol contract."""
    import re

    import numpy as np

    from ..functions.text import TOKEN_RE
    from ..stages.dedup import _md5_hash64

    id_type = b.schema.field(id_col).type
    if not pa.types.is_integer(id_type):
        raise TypeError(
            f"decontaminate_hashed requires integer doc ids ({id_col!r} is {id_type}): "
            "the inverted-index sentinel protocol reserves doc=-1"
        )
    if b.num_rows and pc.min(b.column(id_col)).as_py() is not None and (
        pc.min(b.column(id_col)).as_py() < 0
    ):
        raise ValueError(
            f"decontaminate_hashed requires non-negative doc ids ({id_col!r} has "
            "negatives): doc=-1 is the inverted-index sentinel"
        )
    tok = re.compile(TOKEN_RE)
    ids = b.column(id_col).to_pylist()
    texts = b.column(text_col).to_pylist()
    out_sh: list[int] = []
    out_doc: list[int] = []
    cache: dict[str, int] = {}
    for doc, t in zip(ids, texts):
        words = tok.findall(t or "")
        seen: set[int] = set()
        for L in lengths:
            if len(words) < L:
                continue
            for i in range(len(words) - L + 1):
                s = " ".join(words[i : i + L])
                h = cache.get(s)
                if h is None:
                    h = _md5_hash64(s)
                    # same admission bound as the broadcast branch's cache:
                    # an unbounded whole-block multi-length n-gram dict can
                    # reach GBs on exactly the large blocks this distributed
                    # path is dispatched for; once full, stop inserting
                    # (per-doc repeats still dedup via ``seen``)
                    if len(cache) < 500_000:
                        cache[s] = h
                seen.add(h)
        out_sh.extend(seen)
        out_doc.extend([doc] * len(seen))
    sh = np.asarray(out_sh, dtype=np.uint64).astype(np.int64)  # two's-complement view
    return pa.table(
        {"sh": pa.array(sh, pa.int64()), "doc": pa.array(out_doc, pa.int64())}
    )


def _mark_hits_block(b: pa.Table) -> pa.Table:
    """Per block (post keyed repartition on ``sh`` — every row of a hash is
    here): emit one ``(doc,)`` row per doc sharing a hash with a phrase
    sentinel. Doc-side rows are distinct ``(sh, doc)`` by construction and
    the sentinel (-1) sorts first in its run, so duplicate phrase rows
    dedupe for free. Fully vectorized run detection (the
    ``_bucket_pairs_dropover`` numpy pattern)."""
    import numpy as np

    if b.num_rows == 0:
        return pa.table({"doc": pa.array([], pa.int64())})
    b = b.take(pc.sort_indices(b, sort_keys=[("sh", "ascending"), ("doc", "ascending")]))
    sh = np.asarray(b.column("sh").combine_chunks())
    doc = np.asarray(b.column("doc").combine_chunks())
    starts = np.flatnonzero(np.concatenate(([True], sh[1:] != sh[:-1])))
    run_id = np.cumsum(np.concatenate(([0], (sh[1:] != sh[:-1]).astype(np.int64))))
    has_phrase = doc[starts] == -1
    keep = has_phrase[run_id] & (doc != -1)
    return pa.table({"doc": pa.array(doc[keep], pa.int64())})


def _decontaminate_distributed(
    docs: ray.data.Dataset,
    phrases: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str,
    num_partitions: int | None,
) -> ray.data.Dataset:
    from ..context import default_keyed_partitions

    def _phrase_len_rows(b: pa.Table) -> pa.Table:
        import re

        from ..functions.text import TOKEN_RE

        tok = re.compile(TOKEN_RE)
        ls = {len(tok.findall(p or "")) for p in b.column("phrase").to_pylist()}
        return pa.table({"L": pa.array(sorted(x for x in ls if x > 0), pa.int64())})

    n = num_partitions or default_keyed_partitions()
    # phrase sets are n-grams of a handful of distinct lengths (an eval
    # suite has fixed-shape prompts) — per-block distinct + driver union
    # (Dataset.unique would spawn the 200-partition default aggregator pool;
    # see the CLAUDE.md keyed-ops rule)
    lengths = sorted(
        {
            r["L"]
            for r in phrases.map_batches(
                _phrase_len_rows, batch_size=None, batch_format="pyarrow"
            ).take_all()
        }
    )
    if not lengths:
        # no tokenizable phrase → nothing is contaminated (the broadcast
        # branch's behavior for the same degenerate input); int64 id for
        # path-parity with every other branch
        return docs.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pc.cast(b.column(id_col).slice(0, 0), pa.int64()),
                    "n_hits": pa.array([], pa.int64()),
                }
            ),
            batch_size=None,
            batch_format="pyarrow",
        )
    # ONE docs pass shingles every needed length (ADVICE r4: the per-length
    # loop re-executed the whole docs DAG |lengths| times), one phrases pass
    # emits every sentinel row, and ONE keyed shuffle co-locates every row
    # of a hash; membership is a vectorized sentinel-run scan (the q51
    # inverted-index pattern) — no Dataset.join, and duplicate phrase rows
    # dedupe in-block. The phrases pipeline still executes twice in total
    # (bounded length-discovery projection above + the sentinel pass).
    doc_sh = docs.map_batches(
        _multi_len_shingle_rows,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"text_col": text_col, "id_col": id_col, "lengths": [int(L) for L in lengths]},
    )
    marks = phrases.map_batches(
        _phrase_mark_rows_all, batch_size=None, batch_format="pyarrow"
    )
    hits = (
        doc_sh.union(marks)
        .repartition(num_blocks=n, keys=["sh"])
        .map_batches(_mark_hits_block, batch_size=None, batch_format="pyarrow")
    )
    out = grouped_agg(
        hits,
        ["doc"],
        [Agg(out="n_hits", col=None, kind="count_rows")],
        num_partitions=num_partitions,
    )
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "n_hits"]),
        batch_size=None,
        batch_format="pyarrow",
    )


def decontaminate_hashed(
    docs: ray.data.Dataset,
    phrases: list[str] | ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_broadcast_phrases: int = 2_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Benchmark decontamination at eval-suite scale — the hashed twin of
    :func:`q54_decontaminate`'s substring scan (r3 verdict "What's wrong
    #2": per-phrase ``match_substring`` passes are O(|phrases|) column
    scans per batch; MMLU/GSM8K-scale suites have 10⁵–10⁶ phrases).

    Semantics: a phrase is canonicalized to its TOKEN_RE token sequence;
    ``n_hits`` counts the DISTINCT phrases (by md5-64 of the space-joined
    tokens) appearing as a whole-token n-gram of the document. Identical to
    the substring scan whenever phrases are whole-token n-grams whose text
    occurrences fall on token boundaries (parity-pytested on the q54
    benchmark set); hash collisions are mirrored in the SQL oracle, not a
    parity risk (the q51 argument).

    Size-dispatched like ``anti_join_auto``:

    - ≤ ``max_broadcast_phrases``: the per-length sorted hash arrays ship
      once via ``ray.put`` (~16 MB per 2M phrases) and each batch does ONE
      tokenize + hash pass with vectorized searchsorted membership — no
      shuffle, cost independent of |phrases|;
    - above: hashed doc n-gram rows for EVERY needed length in one docs
      pass (``_multi_len_shingle_rows`` — one tokenize per doc) union one
      pass of phrase sentinel rows, co-located by hash in ONE keyed
      shuffle; membership is a vectorized sentinel-run scan per block (the
      q51 inverted-index pattern — no join operator), then a
      combiner-backed grouped count. Bounded per-partition memory at any
      scale; duplicate phrase rows dedupe in-block; the phrases pipeline
      executes exactly twice (bounded length discovery + sentinels),
      independent of how many distinct lengths the suite has.

    Docs with 0 hits are omitted (same contract as q54). Reference
    analogue: none — training-data extension."""
    if isinstance(phrases, ray.data.Dataset):
        # ONE LIMIT-bounded collection decides the dispatch AND feeds the
        # broadcast branch: the probe rows ARE the broadcast payload (the
        # hash arrays built from them live on the driver regardless), so
        # the common ≤threshold case executes the phrase pipeline exactly
        # once. A separate count-then-read would re-execute the pipeline on
        # every broadcast dispatch; this shape instead pays one discarded
        # bounded partial scan only on the rare >threshold branch — the
        # same documented toll as anti_join_auto's probe.
        probe_rows: list[str] = []
        over = False
        for b in phrases.limit(max_broadcast_phrases + 1).iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            probe_rows.extend(b.column("phrase").to_pylist())
            if len(probe_rows) > max_broadcast_phrases:
                over = True
                break
        if over:
            return _decontaminate_distributed(
                docs, phrases, id_col=id_col, text_col=text_col, num_partitions=num_partitions
            )
        plist = [p for p in probe_rows if p]
        if not plist:
            # empty phrase set → nothing is contaminated (int64 id for
            # path-parity)
            return docs.map_batches(
                lambda b: pa.table(
                    {
                        "doc_id": pc.cast(b.column(id_col).slice(0, 0), pa.int64()),
                        "n_hits": pa.array([], pa.int64()),
                    }
                ),
                batch_size=None,
                batch_format="pyarrow",
            )
        return _decontaminate_broadcast(docs, plist, id_col=id_col, text_col=text_col)
    if len(phrases) <= max_broadcast_phrases:
        return _decontaminate_broadcast(docs, list(phrases), id_col=id_col, text_col=text_col)
    return _decontaminate_distributed(
        docs,
        ray.data.from_arrow(pa.table({"phrase": pa.array(list(phrases), pa.string())})),
        id_col=id_col,
        text_col=text_col,
        num_partitions=num_partitions,
    )


def q63_decontaminate_hashed(sf_dir: str) -> ray.data.Dataset:
    """q54's benchmark decontamination through the SCALE path: hashed
    whole-token n-gram membership instead of per-phrase substring scans
    (r3 verdict item 3). Same deterministic benchmark set; the oracle
    replays the md5 n-gram join exactly, so the hashed semantics (not the
    substring semantics) are what's certified."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return decontaminate_hashed(docs, _bench_phrases(docs))


def q64_decontaminate_distributed(sf_dir: str) -> ray.data.Dataset:
    """q63 through the DISTRIBUTED path (``max_broadcast_phrases=0``):
    hashed doc n-grams union phrase sentinel rows into ONE keyed shuffle, a
    vectorized sentinel-run membership scan per block, then a
    combiner-backed grouped count. Answer-identical to q63 by contract
    (path-parity pytest), so it shares q63's oracle verbatim — this row
    driver-certifies the above-threshold dispatch branch end-to-end (the
    q62 pattern: size/skew-dispatched twins each get their own driver
    row)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return decontaminate_hashed(
        docs, _bench_phrases(docs), max_broadcast_phrases=0, num_partitions=8
    )


def q65_remove_contaminated(sf_dir: str) -> ray.data.Dataset:
    """The training-corpus decontamination FILTER: q63's hashed hit set →
    size-dispatched anti join → the CLEAN docs (what a real pipeline feeds
    downstream; q63/q64 report the hits, this removes them). Composition of
    two already-oracled operators, itself oracled end-to-end. The documents
    source is consumed by both the phrase/hit derivation and the anti-join
    left side — a cheap re-scan of a stored table, the priced lazy-DAG
    trade (CLAUDE.md salted-reassembly note)."""
    from ..functions.join import anti_join_auto

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    hits = decontaminate_hashed(docs, _bench_phrases(docs))
    clean = anti_join_auto(docs, hits, on="doc_id")
    return clean.map_batches(
        lambda b: b.select(["doc_id"]), batch_size=None, batch_format="pyarrow"
    )


#: SQL twin of q63 — the benchmark set rebuilt from the q54 rule, then both
#: sides md5-hashed exactly as the engine does: phrase hash = md5-64 of the
#: space-joined tokens; doc side = DISTINCT md5-64 over every whole-token
#: 5-gram (the bench phrases are 5 tokens, ts[4:8] inclusive = 5). The join
#: IS the membership test, so collisions are mirrored (q51 argument).
Q63_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}') AS ts
  FROM documents
),
bench AS (
  SELECT DISTINCT
         ('0x' || substr(md5(array_to_string(ts[4:8], ' ')), 1, 16))::UBIGINT AS ph
  FROM tok
  WHERE doc_id % 100 = 7 AND doc_id < 1000 AND len(ts) >= 8
),
gr AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
                             || ts[i+3] || ' ' || ts[i+4]), 1, 16))::UBIGINT AS g
  FROM tok, unnest(range(1, len(ts) - 3)) AS t(i)
)
SELECT doc_id, count(*) AS n_hits
FROM gr JOIN bench ON g = ph
GROUP BY doc_id
"""


#: SQL twin of q65 — q63's hit set anti-joined away (NOT EXISTS = SQL anti
#: join semantics: null keys on the left are kept, mirrored by
#: anti_join_auto).
Q65_ORACLE = f"""
WITH hits AS ({Q63_ORACLE})
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = d.doc_id)
"""


# ---------------------------------------------------------------------------
# q55: LSH-bucketed approximate ANN, SQL-oracled end-to-end
# ---------------------------------------------------------------------------


def q55_ann_lsh(sf_dir: str) -> ray.data.Dataset:
    """LSH-bucketed approximate ANN top-5 (stages/ann.py::ann_topk_lsh, the
    scale path of q23) with its approximation CERTIFIED by SQL: the oracle
    rebuilds the hyperplane buckets from the engine's own plane constants
    (the q52 pattern) and ranks candidates only within matching buckets, so
    neighbors the bucketing misses are absent on BOTH sides. Rank-only
    output (sim used for ordering, not emitted): numpy's normalize-then-dot
    and DuckDB's cosine agree to summation-order ulps, and rank boundaries
    have measured clearance ≫ that (asserted in tests/test_ann.py)."""
    queries = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    queries = queries.filter(pc.less(queries.column("vec_id"), 8))
    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _corpus_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("vec_id"), 8))

    corpus = corpus.map_batches(
        _corpus_only, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    out = ann_topk_lsh(corpus, queries, k=5)
    return out.map_batches(
        lambda b: b.rename_columns(["query_id", "neighbor_id", "nn_rank"]),
        batch_size=None,
        batch_format="pyarrow",
    )


def _q55_oracle_sql() -> str:
    """SQL twin of q55, generated from HyperplaneSigner(64, 8)'s own plane
    constants (the q52/q45 pattern — the oracle cannot drift from the
    engine). Sign decisions use the raw DOUBLE vectors: the engine signs
    the l2-normalized matrix, but normalization is a positive scaling and
    cannot flip a dot's sign, so raw-vector sign tests are equivalent."""
    from ..stages.ann import HyperplaneSigner

    planes = HyperplaneSigner(64, 8)._planes  # (dim, n_planes), seed-fixed
    terms = []
    for j in range(planes.shape[1]):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket_expr = " + ".join(terms)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
b AS (
  SELECT vec_id, v, {bucket_expr} AS bucket FROM e
),
q AS (SELECT vec_id AS qid, v AS qe, bucket FROM b WHERE vec_id < 8),
c AS (SELECT vec_id AS nid, v AS ce, bucket FROM b WHERE vec_id >= 8),
s AS (
  SELECT qid, nid, list_cosine_similarity(qe, ce) AS sim
  FROM q JOIN c USING (bucket)
)
SELECT qid AS query_id, nid AS neighbor_id, nn_rank FROM (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS nn_rank
  FROM s) WHERE nn_rank <= 5
"""


Q55_ORACLE = _q55_oracle_sql()


# ---------------------------------------------------------------------------
# q68: embedding GENERATION → ANN, end-to-end from text
# ---------------------------------------------------------------------------


def q68_embed_ann(sf_dir: str) -> ray.data.Dataset:
    """The full similarity-search pipeline FROM TEXT (r4 verdict item 2):
    documents → actor-pool embedding stage (stages/embed.py::EmbedStage —
    hashing-trick bag-of-tokens stub, real encoder import-gated) →
    brute-force cosine top-5 (stages/ann.py::ann_topk). Queries are docs
    0-3, encoded driver-side with the identical arithmetic and broadcast;
    corpus is everything else, embedded distributed. Rank-only output,
    ranked by ``round(sim, 9)`` on BOTH sides: integer count vectors give
    TRUE cosine ties (proportional short docs — observed at sf0.001) that
    raw-float ranking would order by ~1-ulp noise; rounding collapses them
    onto one canonical value per side and the neighbor_id tie-break orders
    them identically. Parity then rests only on "no sim within ~1e-12 of a
    9-decimal rounding boundary", asserted in tests/test_embed.py."""
    from ..stages.embed import embed_documents, encode_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    q_docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    queries = encode_table(q_docs.filter(pc.less(q_docs.column("doc_id"), 4)))

    def _corpus_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("doc_id"), 4))

    corpus = embed_documents(
        docs.map_batches(
            _corpus_only, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        ),
        concurrency=(1, 4),
    )
    out = ann_topk(corpus, queries, k=5, round_sims=9)
    return out.map_batches(
        lambda b: b.rename_columns(["query_id", "neighbor_id", "nn_rank"]),
        batch_size=None,
        batch_format="pyarrow",
    )


#: SQL twin of q68 — the stub encoder replayed exactly: token bucket =
#: md5-64(token) % 16 (the repo-wide md5-64: first 16 hex chars as UBIGINT),
#: embedding = dense 16-dim token-bucket count vector, similarity = cosine
#: rounded to 9 decimals before ranking (tie-robust mode — see the q68
#: docstring; boundary clearance asserted in tests/test_embed.py).
Q68_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}')) AS w
  FROM documents
),
feat AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 16))::UBIGINT % 16 AS BIGINT) AS j,
         CAST(count(*) AS DOUBLE) AS c
  FROM tok GROUP BY doc_id, j
),
vecs AS (
  SELECT dd.doc_id, list(COALESCE(f.c, 0.0) ORDER BY r.j) AS v
  FROM (SELECT DISTINCT doc_id FROM documents) dd
  CROSS JOIN range(16) r(j)
  LEFT JOIN feat f ON f.doc_id = dd.doc_id AND f.j = r.j
  GROUP BY dd.doc_id
),
q AS (SELECT doc_id AS qid, v AS qe FROM vecs WHERE doc_id < 4),
c AS (SELECT doc_id AS nid, v AS ce FROM vecs WHERE doc_id >= 4),
-- cosine written out with the engine's zero-norm guard (_l2norm maps a
-- zero norm to 1, scoring a zero vector at sim 0.0; DuckDB's
-- list_cosine_similarity returns -1.0 there, which would rank an
-- empty-text doc strictly below orthogonal neighbors)
s AS (SELECT qid, nid,
             round(list_dot_product(qe, ce) /
                   (CASE WHEN sqrt(list_dot_product(qe, qe)) = 0 THEN 1
                         ELSE sqrt(list_dot_product(qe, qe)) END *
                    CASE WHEN sqrt(list_dot_product(ce, ce)) = 0 THEN 1
                         ELSE sqrt(list_dot_product(ce, ce)) END), 9) AS sim
      FROM q CROSS JOIN c)
SELECT qid AS query_id, nid AS neighbor_id, nn_rank FROM (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS nn_rank
  FROM s) WHERE nn_rank <= 5
"""


# ---------------------------------------------------------------------------
# q73: Bloom-prefilter decontamination (the sketch face of q54/q63)
# ---------------------------------------------------------------------------

#: Deliberately UNDERSIZED sketch geometry so false positives occur at every
#: sf and the oracle proves it reproduces them (the q72 CountMin argument).
#: Production sizing note in the q73 docstring.
_BLOOM_DECON_M = 1 << 10
_BLOOM_DECON_K = 2


def q73_bloom_decontaminate(sf_dir: str) -> ray.data.Dataset:
    """Bloom-prefilter decontamination: per document, count the 5-token
    n-gram occurrences whose space-joined canonical form tests positive
    against a Bloom filter built from the benchmark phrase set (q54's
    deterministic phrases — each exactly 5 tokens by construction).

    The sketch face of the q54→q63 decontamination family: membership is
    APPROXIMATE (no false negatives ever — every true q63 containment hit
    bloom-hits here, the Bloom guarantee — but false-positive n-grams
    count too). The filter is deliberately undersized (m=1024 bits, k=2)
    so FPs actually occur at every sf, and the SQL oracle reproduces them
    bit-exactly by recomputing the same md5-half double-hash positions
    (functions/sketch.py::_hash_pair_md5) — the approximation itself is
    what's certified.

    Scale shape: the phrase side is an eval suite (small, broadcast); the
    m/8-byte bitset ships via ray.put ONCE — a fixed-size carrier no
    matter how many phrases went in, unlike q54's per-phrase column scans
    or q63's sorted hash arrays — and the corpus streams through one
    vectorized map pass, zero shuffle. At 10⁹ phrases the same code holds
    with m scaled to keep FP bounded (~1.2 GiB at 1 %, one zero-copy
    plasma object); survivors then confirm against the exact hashed path
    (decontaminate_hashed): sketch prefilter, exact verify.

    Reference analogue: none — training-data extension."""
    import re

    from ..functions.sketch import BloomFilter
    from ..functions.text import TOKEN_RE

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    phrases = _bench_phrases(docs)
    bf = BloomFilter(m=_BLOOM_DECON_M, k=_BLOOM_DECON_K, hasher="md5")
    bf.add_many(phrases)  # already canonical: TOKEN_RE tokens joined by ' '
    bits_ref = ray.put(bf.serialize())
    m, k = _BLOOM_DECON_M, _BLOOM_DECON_K

    def _scan(batch: pa.Table) -> pa.Table:
        import numpy as np

        tokre = re.compile(TOKEN_RE)
        # zero-copy read-only wrap of the plasma buffer — no per-batch
        # allocation at any m (the BloomFilter broadcast-read contract)
        flt = BloomFilter.view(ray.get(bits_ref), m, k, "md5")
        grams: list[str] = []
        rows: list[int] = []
        for row, t in enumerate(batch.column("text").to_pylist()):
            ws = tokre.findall(t or "")
            for j in range(len(ws) - 4):
                grams.append(" ".join(ws[j : j + 5]))
                rows.append(row)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if grams:
            hit = flt.contains_many(grams)
            np.add.at(hits, np.asarray(rows, dtype=np.int64)[hit], 1)
        keep = pa.array(hits > 0)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id").filter(keep), pa.int64()),
                "bloom_hits": pa.array(hits[hits > 0], pa.int64()),
            }
        )

    return docs.map_batches(
        _scan, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


#: SQL twin of q73 — rebuilds the benchmark phrases (the Q54 rule), sets
#: their k=2 double-hash bit positions (md5 halves, the
#: _hash_pair_md5/BloomFilter contract: position_i = (h1 + i·h2) mod m,
#: legal in modular pieces because m=2^10 divides 2^64 — see the
#: BloomFilter docstring), then counts, per doc, every 5-gram occurrence
#: whose BOTH positions are set. False positives reproduce exactly.
Q73_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}') AS ts
  FROM documents
),
bench AS (
  SELECT DISTINCT array_to_string(ts[4:8], ' ') AS phrase
  FROM tok WHERE doc_id % 100 = 7 AND doc_id < 1000 AND len(ts) >= 8
),
bbits AS (
  SELECT DISTINCT ((('0x'||substr(md5(phrase),1,16))::UBIGINT % {_BLOOM_DECON_M})::BIGINT
        + i.i * ((('0x'||substr(md5(phrase),17,16))::UBIGINT % {_BLOOM_DECON_M})::BIGINT))
        % {_BLOOM_DECON_M} AS pos
  FROM bench CROSS JOIN (SELECT unnest(range({_BLOOM_DECON_K})) AS i) i
),
grams AS (
  SELECT doc_id,
         array_to_string(ts[CAST(j.j + 1 AS INTEGER):CAST(j.j + 5 AS INTEGER)], ' ') AS g
  FROM tok, unnest(range(len(ts) - 4)) AS j(j)
  WHERE len(ts) >= 5
),
gpos AS (
  SELECT doc_id,
         (('0x'||substr(md5(g),1,16))::UBIGINT % {_BLOOM_DECON_M})::BIGINT AS p1,
         (('0x'||substr(md5(g),17,16))::UBIGINT % {_BLOOM_DECON_M})::BIGINT AS p2
  FROM grams
)
SELECT doc_id, count(*) AS bloom_hits
FROM gpos
WHERE p1 IN (SELECT pos FROM bbits)
  AND (p1 + p2) % {_BLOOM_DECON_M} IN (SELECT pos FROM bbits)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q74: BM25 ranked search (lexical retrieval over the corpus)
# ---------------------------------------------------------------------------

#: Fixed search query for the oracled retrieval demo — literal terms (a
#: search query is user input by nature); all four are stable members of
#: the synthetic corpus vocabulary at every sf.
_BM25_TERMS = ("hash", "join", "window", "spark")


def q74_bm25_search(sf_dir: str) -> ray.data.Dataset:
    """Okapi BM25 top-20 documents for a fixed 4-term query — the lexical
    retrieval counterpart of q23's vector top-k (stages/search.py, which
    documents the two-pass shape, the per-block candidate cut, and the
    q68-protocol float parity: mirrored operation order + round-to-9 on
    both sides + boundary-clearance pytest in tests/test_search.py).

    SQL-oracled end to end: document frequencies, avgdl, idf, the per-term
    score sum IN TERM ORDER, the rounded ranking, and the (score DESC,
    doc_id ASC) tie cut all reproduce in DuckDB — the oracle certifies the
    distributed two-pass statistics, not just the final ordering.

    Reference analogue: none — training-data extension."""
    from ..stages.search import bm25_topk

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_topk(docs, _BM25_TERMS, topk=20, round_scores=9)


#: SQL twin of q74 — every float expression is written in the ENGINE's
#: operation order (stages/search.py::bm25_topk scoring loop): per-term
#: contribution idf_j * (tf_j * (1.2 + 1.0)) / (tf_j + 1.2 * (1.0 - 0.75
#: + 0.75 * (dl / avgdl))), summed left-to-right in term order, rounded to
#: 9 decimals before ranking. ln() and IEEE arithmetic resolve to the same
#: platform libm on both engines; clearance from rounding boundaries is
#: pytest-certified (tests/test_search.py).
Q74_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}') AS ts
  FROM documents
),
tf AS (
  SELECT doc_id, len(ts) AS dl,
         len(list_filter(ts, x -> x = 'hash'))   AS tf0,
         len(list_filter(ts, x -> x = 'join'))   AS tf1,
         len(list_filter(ts, x -> x = 'window')) AS tf2,
         len(list_filter(ts, x -> x = 'spark'))  AS tf3
  FROM tok
),
stats AS (
  SELECT count(*) AS n, sum(dl) AS sum_dl,
         count(*) FILTER (WHERE tf0 > 0) AS df0,
         count(*) FILTER (WHERE tf1 > 0) AS df1,
         count(*) FILTER (WHERE tf2 > 0) AS df2,
         count(*) FILTER (WHERE tf3 > 0) AS df3
  FROM tf
),
consts AS (
  SELECT CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl,
         ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) AS idf0,
         ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) AS idf1,
         ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) AS idf2,
         ln((n - df3 + 0.5) / (df3 + 0.5) + 1.0) AS idf3
  FROM stats
),
scored AS (
  SELECT f.doc_id, f.dl,
         CAST((f.tf0 > 0)::INT + (f.tf1 > 0)::INT
            + (f.tf2 > 0)::INT + (f.tf3 > 0)::INT AS BIGINT) AS n_matched,
         round(
           c.idf0 * (f.tf0 * (1.2 + 1.0)) / (f.tf0 + 1.2 * (1.0 - 0.75 + 0.75 * (f.dl / c.avgdl)))
         + c.idf1 * (f.tf1 * (1.2 + 1.0)) / (f.tf1 + 1.2 * (1.0 - 0.75 + 0.75 * (f.dl / c.avgdl)))
         + c.idf2 * (f.tf2 * (1.2 + 1.0)) / (f.tf2 + 1.2 * (1.0 - 0.75 + 0.75 * (f.dl / c.avgdl)))
         + c.idf3 * (f.tf3 * (1.2 + 1.0)) / (f.tf3 + 1.2 * (1.0 - 0.75 + 0.75 * (f.dl / c.avgdl))), 9)
         AS score
  FROM tf f CROSS JOIN consts c
)
SELECT doc_id, score, dl, n_matched,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS bm25_rank
FROM scored
WHERE n_matched > 0
QUALIFY bm25_rank <= 20
"""


def q75_posting_lists(sf_dir: str) -> ray.data.Dataset:
    """Positional inverted-index rows for the fixed q74 query vocabulary:
    one row per (term, matching document) carrying the occurrence count
    and the first token position — the ROWS representation of a posting
    list. Scale-honest by construction: a common term's postings are
    corpus-sized, so they exist only as a streamed dataset keyed by term
    (repartition by term co-locates a posting list when a consumer needs
    one contiguous; never as one array value on any single node). Phrase /
    proximity ranking consumes (first_pos, n_occurrences) directly; q74
    consumes the same statistics aggregated. Map-only — zero shuffle.

    Reference analogue: none — training-data extension (the index-build
    counterpart of q74's ranking)."""
    import re

    from ..functions.text import TOKEN_RE

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    terms = _BM25_TERMS

    def _rows(batch: pa.Table) -> pa.Table:
        import numpy as np

        tokre = re.compile(TOKEN_RE)
        col_of = {t: j for j, t in enumerate(terms)}
        ids = batch.column("doc_id").to_pylist()
        out_term: list[str] = []
        out_doc: list[int] = []
        out_n: list[int] = []
        out_first: list[int] = []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            counts = [0] * len(terms)
            first = [-1] * len(terms)
            for pos, w in enumerate(tokre.findall(t or "")):
                j = col_of.get(w)
                if j is not None:
                    counts[j] += 1
                    if first[j] < 0:
                        first[j] = pos
            for j, term in enumerate(terms):
                if counts[j]:
                    out_term.append(term)
                    out_doc.append(i)
                    out_n.append(counts[j])
                    out_first.append(first[j])
        return pa.table(
            {
                "term": pa.array(out_term, pa.string()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "n_occurrences": pa.array(out_n, pa.int64()),
                "first_pos": pa.array(out_first, pa.int64()),
            }
        )

    return docs.map_batches(
        _rows, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


#: SQL twin of q75 — list_position is 1-based (engine first_pos is the
#: 0-based token offset, hence the -1); the VALUES vocabulary is the same
#: fixed query-term tuple q74 scores.
Q75_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}') AS ts
  FROM documents
),
t(term) AS (VALUES ('hash'), ('join'), ('window'), ('spark'))
SELECT t.term, k.doc_id,
       len(list_filter(k.ts, x -> x = t.term)) AS n_occurrences,
       CAST(list_position(k.ts, t.term) - 1 AS BIGINT) AS first_pos
FROM tok k CROSS JOIN t
WHERE list_contains(k.ts, t.term)
"""


def q76_train_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic train/val/test split assignment (~80/10/10) by content
    md5 — the reproducible split primitive for training corpora: the same
    document lands in the same split on any cluster, any run, any shard
    order, and re-ingesting a grown corpus never reassigns an old doc
    (unlike random or row-number-modulo splits). The first hex byte of
    md5(text) buckets into [0, 255]: < 0xcc (204) → train, < 0xe6 (230) →
    val, else test. The compare runs on the fixed-width lowercase hex
    prefix, where lexicographic order IS numeric order, so the SQL twin is
    a plain string CASE. Map-only over a column-pruned read — zero shuffle
    at any scale.

    Reference analogue: none — training-data extension (the split-assign
    face of q29's content-hash sampling family)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def _assign(b: pa.Table) -> pa.Table:
        b2 = pc.utf8_slice_codeunits(md5_hex_batch(b.column("text")), 0, 2)
        split = pc.if_else(
            pc.less(b2, pa.scalar("cc")),
            pa.scalar("train"),
            pc.if_else(pc.less(b2, pa.scalar("e6")), pa.scalar("val"), pa.scalar("test")),
        )
        return pa.table(
            {"doc_id": b.column("doc_id"), "lang": b.column("lang"), "split": split}
        )

    return ds.map_batches(
        _assign, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


#: SQL twin of q76 — COALESCE mirrors the engine's null→"" hashing; the
#: boundary literals are the hex spellings of 204 (0.8·256) and 230
#: (0.9·256), compared as strings exactly like the engine.
Q76_ORACLE = """
SELECT doc_id, lang,
       CASE WHEN substr(md5(COALESCE(text, '')), 1, 2) < 'cc' THEN 'train'
            WHEN substr(md5(COALESCE(text, '')), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q79_collapse_repeats(sf_dir: str) -> ray.data.Dataset:
    """Adjacent-duplicate token collapse ("stutter" de-repetition) — the
    cleaning face of q58's repetition SIGNAL: where q58 measures top-2-gram
    mass, q79 rewrites the document, collapsing each run of identical
    consecutive whitespace-split tokens to one occurrence (the classic OCR
    double-read / boilerplate-echo scrub). Fully vectorized despite the
    sequential look: one ``split_pattern`` per batch, one shifted
    ``pc.equal`` over the flat token stream of ALL docs at once, doc
    starts forced kept via the list offsets, and the survivors re-join
    with ``binary_join`` over cumsum-rebuilt offsets — no per-token or
    per-doc Python. Map-only, zero shuffle at any scale. Emits the
    repetition census (n_tokens, n_kept) plus the cleaned text.

    Reference analogue: none — training-data extension (the rewrite member
    of the quality family: q17 scores, q33 filters, q79 cleans)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        _collapse_repeats_batch,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _collapse_repeats_batch(b: pa.Table) -> pa.Table:
    """q79's per-batch kernel (module-level so the property test can drive
    it with arbitrary corpora): one shifted equal over the flat token
    stream, doc starts forced kept, offsets rebuilt by cumsum."""
    import numpy as np

    text = pc.coalesce(b.column("text"), pa.scalar(""))
    toks = pc.split_pattern(text, pattern=" ").combine_chunks()
    vals = toks.values
    off = toks.offsets.to_numpy()
    n = len(vals)
    keep_np = np.ones(n, dtype=bool)
    if n > 1:
        eq = pc.equal(vals.slice(1), vals.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        keep_np[1:] = ~eq
    keep_np[off[:-1]] = True  # a run never crosses a doc boundary
    # cum[off] rebuilds per-doc offsets exactly, including empty docs
    cum = np.concatenate(([0], np.cumsum(keep_np)))
    new_off = cum[off]
    kept_vals = vals.filter(pa.array(keep_np))
    if pa.types.is_large_list(toks.type):
        kept_lists = pa.LargeListArray.from_arrays(
            pa.array(new_off, pa.int64()), kept_vals
        )
    else:
        kept_lists = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), kept_vals
        )
    return pa.table(
        {
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(np.diff(off), pa.int64()),
            "n_kept": pa.array(np.diff(new_off), pa.int64()),
            "clean_text": pc.binary_join(kept_lists, " "),
        }
    )


#: SQL twin of q79 — DuckDB's indexed list lambda is the shifted-equal keep
#: mask (i = 1 keeps each doc's first token, a run never crosses a doc);
#: array_to_string rebuilds the cleaned text in token order. An empty/null
#: doc splits to [''], whose single token always survives — matching the
#: engine's one-empty-token census, so clean_text is never NULL.
Q79_ORACLE = """
WITH l AS (
    SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS lst
    FROM documents
), f AS (
    SELECT doc_id, lst,
           list_filter(lst, (x, i) -> i = 1 OR x != lst[i-1]) AS kept
    FROM l
)
SELECT doc_id,
       CAST(len(lst) AS BIGINT) AS n_tokens,
       CAST(len(kept) AS BIGINT) AS n_kept,
       array_to_string(kept, ' ') AS clean_text
FROM f
"""
