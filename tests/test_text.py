"""Exact semantics of the text/scalar expression layer (SURVEY §2.7),
including the reference's weird boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from social_media_data_pipeline_recession_political_sentiment_spark.functions.text import (
    clean_comment,
    hate_flag,
    normalize_text,
    sentiment_bucket,
    strip_html,
    strip_urls,
)


def one(spark, text, expr):
    return spark.createDataFrame([(text,)], "t string").select(expr.alias("out")).collect()[0].out


def test_strip_urls(spark):
    assert one(spark, "go https://x.io/a?b=1 now http://y.z end", strip_urls(F.col("t"))) == (
        "go  now  end"
    )


def test_normalize_text(spark):
    assert one(spark, "Hello, World! 42_x", normalize_text(F.col("t"))) == "hello world 42x"


def test_clean_comment_composite(spark):
    assert (
        one(spark, "See https://spam.ex/1 BUY NOW!!!", clean_comment(F.col("t"))) == "see  buy now"
    )


def test_strip_html_tags_entities_quotes(spark):
    got = one(
        spark,
        '<p class="x">&gt;&gt;123 hello &amp; <b>world</b></p>',
        strip_html(F.col("t")),
    )
    assert got == "hello & world"


def test_sentiment_bucket_boundaries_inclusive(spark):
    """>= 0.05 and <= -0.05 are inclusive (Reddit_4chan_Analysis.py:152-158)."""
    df = spark.createDataFrame(
        [(0.05,), (0.049999,), (-0.05,), (-0.049999,), (0.0,)], "c double"
    )
    got = [r.b for r in df.select(sentiment_bucket(F.col("c")).alias("b")).collect()]
    assert got == ["positive", "neutral", "negative", "neutral", "neutral"]


def test_hate_flag_strictly_above_threshold(spark):
    """conf > 0.9 strict: exactly 0.9 is NOT flagged (Reddit_4chan_Analysis.py:19,42)."""
    df = spark.createDataFrame(
        [("flag", 0.9), ("flag", 0.9000001), ("ok", 0.99), ("flag", None)],
        "c string, conf double",
    )
    got = [r.f for r in df.select(hate_flag(F.col("c"), F.col("conf")).alias("f")).collect()]
    assert got == [False, True, False, None]


def test_corpus_curation_monotone(spark):
    """Curation output only shrinks the corpus: per-lang kept docs
    never exceed raw docs, and every kept doc passed quality."""
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.conftest import SF_SMOKE

    out = {r.lang: r.n_docs for r in queries()["ext_corpus_curation"](spark, SF_SMOKE).collect()}
    raw = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("lang")
        .count()
        .collect()
    )
    raw = {r.lang: r["count"] for r in raw}
    assert out and all(out[lang] <= raw.get(lang, 0) for lang in out)


def test_quality_gate_only_shrinks_and_bounds_hold(spark):
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.conftest import SF_SMOKE

    rows = queries()["ext_quality_gate"](spark, SF_SMOKE).collect()
    total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert 0 < len(rows) <= total
    for r in rows:
        assert 5 <= r.n_words <= 1000
        assert r.stop_hits >= 1
        assert 2.0 <= r.mean_wlen <= 12.0


def test_tfidf_topterms_df_bounded_by_corpus(spark):
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.conftest import SF_SMOKE

    rows = queries()["ext_tfidf_topterms"](spark, SF_SMOKE).collect()
    total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == 20
    dfs = [r.df for r in rows]
    assert dfs == sorted(dfs, reverse=True)  # ranked by document frequency
    assert all(0 < r.df <= total for r in rows)
    assert all(r.idf >= 0.0 for r in rows)  # df <= N -> ln(N/df) >= 0


def test_url_domains_partitions_corpus(spark):
    """Every doc lands in exactly one of the 20 synthetic domains."""
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.conftest import SF_SMOKE

    rows = queries()["ext_url_domains"](spark, SF_SMOKE).collect()
    total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == 20
    assert sum(r.n_docs for r in rows) == total
    assert all(r.domain.startswith("mirror") and r.domain.endswith(".example.org")
               for r in rows)


def test_unicode_nfc_collapses_combining_marks(spark):
    """Decomposed e+COMBINING ACUTE collapses to precomposed; rows in
    the fixture are decorated so none is already normal."""
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.conftest import SF_SMOKE

    rows = queries()["fn_unicode_nfc"](spark, SF_SMOKE).collect()
    assert rows and all(not r.was_normal for r in rows)  # 'café' is decomposed
    assert all("café é" in r.nfc for r in rows)  # precomposed form


def test_sample_per_group_quota_and_determinism(spark):
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.conftest import SF_SMOKE

    a = queries()["ext_sample_per_group"](spark, SF_SMOKE).collect()
    b = queries()["ext_sample_per_group"](spark, SF_SMOKE).collect()
    assert sorted((r.doc_id, r.rn) for r in a) == sorted((r.doc_id, r.rn) for r in b)
    per_lang = {}
    for r in a:
        per_lang.setdefault(r.lang, []).append(r.rn)
    for lang, rns in per_lang.items():
        assert len(rns) <= 50
        assert sorted(rns) == list(range(1, len(rns) + 1))  # dense quota ranks


def test_udaf_value_range_matches_builtin(spark):
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    got = {r.event_type: r.vrange
           for r in queries()["udaf_value_range"](spark, SF_SMOKE).collect()}
    exp = {r.event_type: r.vrange for r in
           spark.read.parquet(f"{SF_SMOKE}/events.parquet")
           .groupBy("event_type")
           .agg((F.max("value") - F.min("value")).alias("vrange")).collect()}
    assert got == exp  # bit-exact: max/min are order-independent


def test_shard_manifest_offsets_contiguous(spark):
    """Offsets tile the token stream exactly: sorted by offset, each
    doc starts where the previous ended, and shard ids are monotone."""
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import SHARD_TOKENS
    from tests.conftest import SF_SMOKE

    rows = sorted(
        queries()["ext_shard_manifest"](spark, SF_SMOKE).collect(),
        key=lambda r: r.tok_offset,
    )
    acc = 0
    for r in rows:
        assert r.tok_offset == acc
        assert r.shard_id == acc // SHARD_TOKENS
        acc += r.n_tokens
    total = sum(r.n_tokens for r in rows)
    assert acc == total


def test_lm_unigram_score_ranks_rare_token_docs_lower(spark):
    # doc 3 is made of corpus-rare tokens => lower avg logprob than the
    # docs built from the repeated common phrase
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.test_dedup import _docs_view

    common = "the cat sat on the mat " * 5
    rows = [
        (1, common.strip(), "en", "s", 1),
        (2, common.strip(), "en", "s", 1),
        (3, "zyx qwv jkl pqr stu", "en", "s", 1),
    ]
    tmp = _docs_view(spark, rows)
    out = {
        r.doc_id: r for r in queries()["ext_lm_unigram_score"](spark, tmp).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[3].avg_logprob_micro < out[1].avg_logprob_micro
    assert out[1].logprob_micro == out[2].logprob_micro  # identical docs
    assert out[3].n_tokens == 5


def test_pack_sequences_invariants(spark):
    # next-fit invariants at smoke SF: offsets start bins at 0, docs
    # within capacity never overflow a bin, packing is dense (a doc at
    # offset>0 would NOT have fit remaining space of the previous bin
    # ... which is implied by contiguity), and bin ids are contiguous
    # per lang
    from collections import defaultdict

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        PACK_CAPACITY,
    )
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.conftest import SF_SMOKE

    rows = queries()["ext_pack_sequences"](spark, SF_SMOKE).collect()
    by_bin = defaultdict(list)
    for r in rows:
        by_bin[(r.lang, r.bin_id)].append(r)
    for (lang, b), docs in by_bin.items():
        docs.sort(key=lambda r: r.bin_offset)
        assert docs[0].bin_offset == 0  # every bin starts at 0
        for prev, cur in zip(docs, docs[1:]):
            assert cur.bin_offset == prev.bin_offset + prev.n_tokens  # dense
        fill = docs[-1].bin_offset + docs[-1].n_tokens
        assert fill <= PACK_CAPACITY or len(docs) == 1  # overflow only solo
    # bin ids contiguous from 0 per lang
    langs = defaultdict(set)
    for r in rows:
        langs[r.lang].add(r.bin_id)
    for lang, bins in langs.items():
        assert bins == set(range(len(bins)))


def test_sample_mixture_rates_are_deterministic_and_bounded(spark):
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries
    from tests.conftest import SF_SMOKE

    a = {(r.source, r.weight_tenths, r.n_docs, r.n_kept)
         for r in queries()["ext_sample_mixture"](spark, SF_SMOKE).collect()}
    b = {(r.source, r.weight_tenths, r.n_docs, r.n_kept)
         for r in queries()["ext_sample_mixture"](spark, SF_SMOKE).collect()}
    assert a == b  # pure function of the data, stable across runs
    for source, wt, n_docs, n_kept in a:
        assert 1 <= wt <= 10
        assert 0 <= n_kept <= n_docs


def test_pack_sequences_null_lang_groups_with_empty_string(spark):
    """NULL lang must pack in the '' group (the coalesce device that
    keeps the Spark side aligned with the oracle's recursive join —
    NULL = NULL is never true in SQL)."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_pack_sequences,
    )

    rows = [
        (0, "a b c", None, "s", 1),
        (1, "d e", "", "s", 1),
        (2, "f g h i", None, "s", 1),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_pack_null_")
    d.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )
    out = sorted(ext_pack_sequences(spark, tmp).collect(), key=lambda r: r.doc_id)
    assert [r.lang for r in out] == ["", "", ""]
    # one shared '' domain => sequential next-fit over doc_id order
    assert [(r.bin_id, r.bin_offset) for r in out] == [(0, 0), (0, 3), (0, 5)]


def test_perplexity_buckets_are_an_exact_ntile_of_the_score_order(spark):
    """Two-phase global rank contract: ranks are a permutation of
    1..N consistent with (avg DESC, doc_id) order, buckets follow
    ((rank-1)*3) div N exactly, and the three buckets are equal-count
    up to the remainder rule."""
    from tests.conftest import SF_SMOKE

    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_lm_perplexity_buckets"](spark, SF_SMOKE).collect()
    n = len(rows)
    assert n > 0
    assert sorted(r.rank for r in rows) == list(range(1, n + 1))
    in_rank = sorted(rows, key=lambda r: r.rank)
    key = [(-r.avg_logprob_micro, r.doc_id) for r in in_rank]
    assert key == sorted(key)  # rank order == (avg DESC, doc_id) order
    for r in rows:
        expect_ix = (r.rank - 1) * 3 // n
        expect = ["head", "middle", "tail"][expect_ix]
        assert r.bucket == expect, (r.doc_id, r.rank)
    from collections import Counter

    sizes = Counter(r.bucket for r in rows)
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_datacard_totals_and_cross_checks(spark):
    """The dataset card must reconcile with the primitives it reports
    on: group totals sum to the corpus, dup counts equal
    ext_dedup_exact's non-canonical copies, gate counts equal
    ext_quality_gate's survivors, and rates recompute from counts."""
    from tests.conftest import SF_SMOKE

    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    import duckdb

    card = queries()["ext_corpus_datacard"](spark, SF_SMOKE).collect()
    n_corpus = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n_docs for r in card) == n_corpus
    dups = queries()["ext_dedup_exact"](spark, SF_SMOKE).collect()
    assert sum(r.n_dup_docs for r in card) == sum(r.n_copies - 1 for r in dups)
    gated = queries()["ext_quality_gate"](spark, SF_SMOKE).count()
    assert sum(r.n_pass_gate for r in card) == gated
    for r in card:
        assert r.dup_rate == r.n_dup_docs / r.n_docs
        assert r.gate_rate == r.n_pass_gate / r.n_docs
        assert 0 <= r.dup_rate <= 1 and 0 <= r.gate_rate <= 1


def test_length_histogram_buckets_are_powers_of_two(spark):
    """ext_length_histogram: buckets partition the corpus, and every
    bucket's min/max sit inside [2^(b-1), 2^b)."""
    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_length_histogram"](spark, SF_SMOKE).collect()
    assert rows
    total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        lo, hi = 2 ** (r.log2_bucket - 1), 2**r.log2_bucket
        assert lo <= r.min_chars <= r.max_chars < hi
        assert r.min_chars * r.n_docs <= r.total_chars <= r.max_chars * r.n_docs


def test_vocab_census_matches_python_recount(spark):
    """ext_vocab_census: recompute tokens/types/hapax per lang in
    python and require equality, including the exact TTR division."""
    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_vocab_census"](spark, SF_SMOKE).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    counts, ndocs = {}, {}
    for r in docs:
        lang = r.lang if r.lang is not None else "und"
        ndocs[lang] = ndocs.get(lang, 0) + 1
        lc = counts.setdefault(lang, {})
        for t in (r.text or "").split(" "):
            if t:
                lc[t] = lc.get(t, 0) + 1
    assert {r.lang for r in rows} == set(ndocs)
    for r in rows:
        lc = counts[r.lang]
        assert r.n_docs == ndocs[r.lang]
        assert r.n_types == len(lc)
        assert r.n_tokens == sum(lc.values())
        assert r.n_hapax == sum(1 for c in lc.values() if c == 1)
        assert r.ttr_micro == r.n_types * 1_000_000 // r.n_tokens
        assert r.n_hapax <= r.n_types <= r.n_tokens


def test_url_canonical_collapses_all_variant_forms(spark):
    """ext_url_canonical: every canonical URL is fully normalized (no
    case/www/params/fragment/trailing slash survives), references are
    conserved, and at least one URL consolidates multiple variants."""
    import re

    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_url_canonical"](spark, SF_SMOKE).collect()
    assert rows
    pat = re.compile(r"^https://mirror\d+\.example\.org/p/\d+$")
    for r in rows:
        assert pat.fullmatch(r.url), r.url
        assert 1 <= r.n_variants <= 3
        assert r.n_refs >= r.n_variants
    total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r.n_refs for r in rows) == total
    assert any(r.n_variants >= 2 for r in rows)


def test_topterms_per_lang_ranks_and_bounds(spark):
    """ext_topterms_per_lang: ranks are 1..K dense per lang, df is
    non-increasing along rank, and rank-1 df equals the lang's true
    max document frequency."""
    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        TOPTERMS_PER_LANG_K,
    )
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_topterms_per_lang"](spark, SF_SMOKE).collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    df_true = {}
    for d in docs:
        lang = d.lang if d.lang is not None else "und"
        for t in set((d.text or "").split(" ")) - {""}:
            key = df_true.setdefault(lang, {})
            key[t] = key.get(t, 0) + 1
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOPTERMS_PER_LANG_K
        assert all(a.df >= b.df for a, b in zip(rs, rs[1:]))
        assert rs[0].df == max(df_true[lang].values())


def test_lang_id_eval_reconciles_with_classifier(spark):
    """ext_lang_id_eval: the matrix cells reproduce a direct count
    over the classifier's output and cover the corpus exactly."""
    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_lang_id_eval"](spark, SF_SMOKE).collect()
    assert rows
    base = queries()["fn_lang_detect"](spark, SF_SMOKE).collect()
    expect = {}
    for r in base:
        key = (r.lang if r.lang is not None else "und", r.lang_guess)
        expect[key] = expect.get(key, 0) + 1
    assert {(r.true_lang, r.pred_lang): r.n for r in rows} == expect
    assert sum(r.n for r in rows) == len(base)


def test_tokenize_ids_roundtrips_python_vocab(spark):
    """ext_tokenize_ids: rebuild the top-K vocab in python and require
    every document's id sequence, token count, and OOV count to match
    exactly (order included)."""
    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        VOCAB_K,
    )
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_tokenize_ids"](spark, SF_SMOKE).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    freq = {}
    toks = {}
    for d in docs:
        ts = [t for t in (d.text or "").split(" ") if t]
        if ts:
            toks[d.doc_id] = ts
        for t in ts:
            freq[t] = freq.get(t, 0) + 1
    vocab = {
        t: i
        for i, (t, _) in enumerate(
            sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]
        )
    }
    assert len(rows) == len(toks)
    for r in rows:
        ts = toks[r.doc_id]
        ids = [vocab.get(t, VOCAB_K) for t in ts]
        # driver-canonicalizer-safe contract: ids is a space-joined
        # string, not an array (see ext_tokenize_ids docstring)
        assert r.ids == " ".join(str(i) for i in ids), r.doc_id
        assert r.n_tokens == len(ts)
        assert r.n_oov == sum(1 for t in ts if t not in vocab)
    # OOV occurs exactly when the corpus vocabulary exceeds K (the
    # smoke fixture's whole vocab can fit inside 256 ids)
    assert any(r.n_oov > 0 for r in rows) == (len(freq) > VOCAB_K)


def test_bigram_pmi_matches_python_recompute(spark):
    """ext_bigram_pmi: rebuild unigram/bigram counts in python and
    require the emitted PMI (6dp) and ranking to match."""
    import math

    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        PMI_MIN_COUNT,
        PMI_TOP_K,
    )
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_bigram_pmi"](spark, SF_SMOKE).collect()
    assert rows and len(rows) <= PMI_TOP_K
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    uni, bi = {}, {}
    m = 0
    for d in docs:
        w = (d.text or "").split(" ")
        for t in w:
            if t:
                uni[t] = uni.get(t, 0) + 1
        for a, b in zip(w, w[1:]):
            if a and b:
                bi[(a, b)] = bi.get((a, b), 0) + 1
                m += 1
    n = sum(uni.values())
    cand = []
    for (a, b), c in bi.items():
        if c >= PMI_MIN_COUNT:
            pmi = round(math.log(c * n * n / (m * uni[a] * uni[b])), 6)
            cand.append((f"{a} {b}", c, pmi))
    cand.sort(key=lambda x: (-x[2], x[0]))
    expect = cand[:PMI_TOP_K]
    got = [(r.bigram, r.n_pair, round(r.pmi, 6)) for r in rows]
    assert got == expect


def test_stratified_exact_total_and_hamilton_allocation(spark):
    """ext_sample_stratified_exact: the sample totals exactly S, each
    language's allocation matches a python largest-remainder
    recompute, and within-language picks follow the md5 rank."""
    import hashlib

    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        STRAT_SAMPLE,
    )
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_sample_stratified_exact"](spark, SF_SMOKE).collect()
    assert len(rows) == STRAT_SAMPLE
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    by_lang = {}
    for d in docs:
        by_lang.setdefault(d.lang if d.lang is not None else "und", []).append(d.doc_id)
    total = sum(len(v) for v in by_lang.values())
    base = {k: len(v) * STRAT_SAMPLE // total for k, v in by_lang.items()}
    rem = {k: (len(v) * STRAT_SAMPLE) % total for k, v in by_lang.items()}
    leftover = STRAT_SAMPLE - sum(base.values())
    for k in sorted(rem, key=lambda k: (-rem[k], k))[:leftover]:
        base[k] += 1
    got_alloc = {}
    for r in rows:
        got_alloc[r.lang] = got_alloc.get(r.lang, 0) + 1
        assert r.alloc == base[r.lang]
    assert got_alloc == {k: v for k, v in base.items() if v > 0}
    # within-lang selection = lowest md5(doc_id) ranks
    for lang, ids in by_lang.items():
        if base.get(lang, 0) == 0:
            continue
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        expect = set(ranked[: base[lang]])
        assert {r.doc_id for r in rows if r.lang == lang} == expect


def test_social_tags_census_counts(spark):
    """ext_social_tags: 7 hashtags + 13 mentions, each counting the
    docs whose id falls in its residue class."""
    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_social_tags"](spark, SF_SMOKE).collect()
    tags = {(r.tag, r.kind): r.n_docs for r in rows}
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    for k in range(7):
        assert tags[(f"#topic{k}", "hashtag")] == sum(1 for i in ids if i % 7 == k)
    for k in range(13):
        assert tags[(f"@user{k}", "mention")] == sum(1 for i in ids if i % 13 == k)
    assert len(tags) == 20


def test_curation_scorecard_reconciles_with_components(spark):
    """ext_curation_scorecard: one row per doc; gate_pass matches the
    quality gate's keep-set; keep implies the composed rule; the
    fixture exercises keeps and drops."""
    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        _SCORECARD_KEEP_DUP_MAX,
    )
    from social_media_data_pipeline_recession_political_sentiment_spark.registry import queries

    rows = queries()["ext_curation_scorecard"](spark, SF_SMOKE).collect()
    total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == total
    gate_ids = {r.doc_id for r in queries()["ext_quality_gate"](spark, SF_SMOKE).collect()}
    dup = {r.doc_id: r.dup_permille for r in queries()["ext_doc_dup_profile"](spark, SF_SMOKE).collect()}
    for r in rows:
        assert r.gate_pass == (r.doc_id in gate_ids)
        assert r.dup_permille == dup.get(r.doc_id)
        assert r.keep == (
            r.gate_pass and (r.dup_permille or 0) <= _SCORECARD_KEEP_DUP_MAX
        )
    keeps = {r.keep for r in rows}
    assert keeps == {True, False}


def test_lang_detect_model_seam_contract(spark):
    """detect_language: a real-model loader slots in behind the exact
    heuristic column contract (same schema, same row set), the model
    loads on the executor (never pickled through the closure), and a
    None loader falls back to the heuristic (VERDICT r5 item 5)."""
    import pandas as pd

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        detect_language,
        load_real_langid_model,
    )

    df = spark.createDataFrame(
        [(1, "the cat and the hat"), (2, "le chat et la botte"), (3, None)],
        "doc_id long, text string",
    ).repartition(3)

    class _Fake:
        def predict(self, texts: pd.Series) -> pd.Series:
            return texts.fillna("").map(
                lambda t: "fr" if ("le" in t.split() or "et" in t.split()) else "xx"
            )

    heur = detect_language(df)
    fake = detect_language(df, model_loader=lambda: _Fake())
    # the contract: identical names + types (nullability may differ —
    # a pandas UDF column is always nullable, the CASE literal isn't)
    assert [(f.name, f.dataType) for f in fake.schema.fields] == [
        (f.name, f.dataType) for f in heur.schema.fields
    ]
    got = {r.doc_id: r.lang_guess for r in fake.collect()}
    assert got == {1: "xx", 2: "fr", 3: "xx"}
    # hermetic default: loader returning None (and this container's
    # load_real_langid_model, which finds no model lib) == heuristic
    assert load_real_langid_model() is None
    viaNone = detect_language(df, model_loader=lambda: None)
    assert sorted(viaNone.collect()) == sorted(heur.collect())


def test_lang_detect_available_probe_short_circuits(spark):
    """detect_language consults a loader's cheap .available probe and
    never performs the (expensive) driver-side model load when the
    probe answers False; when the probe answers True the UDF path is
    taken and the loader runs only on executors."""
    import pandas as pd

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        detect_language,
    )

    df = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    calls = {"n": 0}

    def loader():
        calls["n"] += 1

        class _M:
            def predict(self, texts: pd.Series) -> pd.Series:
                return pd.Series(["zz"] * len(texts), index=texts.index)

        return _M()

    loader.available = lambda: False
    out = detect_language(df, model_loader=loader).collect()
    assert calls["n"] == 0  # probe said no: loader never invoked
    assert out[0].lang_guess == "en"  # heuristic fallback ran

    loader.available = lambda: True
    got = detect_language(df, model_loader=loader).collect()
    assert got[0].lang_guess == "zz"
    assert calls["n"] == 0  # driver still never loads; executors did


def test_dsir_weights_rank_target_like_docs_above_offtarget(spark):
    """DSIR contract: a doc built from target-only features scores a
    strictly higher importance ratio than one built from off-target
    features; n_feats counts unigrams + bigrams; and the weight of a
    doc is linear in its feature counts (2x the doc => 2x the
    micro-nats, exactly, because the contract is integer)."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_dsir_weights,
    )

    tgt = "apple orchard harvest " * 8
    off = "banane schiff wolke " * 8
    rows = [
        (1, tgt.strip(), "en", "s", 1),
        (2, tgt.strip(), "en", "s", 1),
        (3, off.strip(), "de", "s", 1),
        (4, off.strip(), "de", "s", 1),
        # probe docs: one of each flavor, marked off-target so the
        # models are driven by docs 1-4
        (5, tgt.strip(), "de", "s", 1),
        (6, off.strip(), "zh", "s", 1),
        (7, (off + off).strip(), "zh", "s", 1),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_dsir_")
    d.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )
    out = {r.doc_id: r for r in ext_dsir_weights(spark, tmp).collect()}
    # 24 unigrams + 23 bigrams
    assert out[5].n_feats == 47
    assert out[5].micro_logratio > out[6].micro_logratio
    # doubling the doc doubles counts; the extra stitch bigram at the
    # join point ("wolke banane") is itself an off-target feature
    assert out[7].n_feats == 95
    assert out[7].micro_logratio < 2 * out[6].micro_logratio


def test_mixture_schedule_plan_arithmetic(spark):
    """ext_mixture_schedule: natural shares sum to ~1, a scarce
    target-heavy language gets an upsampling rate > 1 with
    epochs = ceil(rate), and rates reproduce target_share x total /
    lang_tokens exactly."""
    import math
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_mixture_schedule,
    )

    rows = [
        # en: 1 doc x 4 tokens (scarce, target 0.40 => upsample)
        (1, "a b c d", "en", "s", 1),
        # de: 4 docs x 9 tokens (abundant, target 0.15 => downsample)
        *[(i, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "de", "s", 1) for i in range(2, 6)],
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_mix_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.lang: r for r in ext_mixture_schedule(spark, tmp).collect()}
    assert set(out) == {"en", "de"}
    total = 4 + 4 * 9
    assert out["en"].n_tokens == 4 and out["de"].n_tokens == 36
    assert abs(out["en"].natural_share + out["de"].natural_share - 1.0) < 1e-9
    assert out["en"].sampling_rate == round(0.4 * total / 4, 6)  # 4.0 => upsample
    assert out["en"].epochs == math.ceil(0.4 * total / 4)
    assert out["de"].sampling_rate < 1 and out["de"].epochs == 1


def test_gopher_repetition_flags_and_masses(spark):
    """ext_gopher_repetition: a doc dominated by one repeated bigram
    fails the top-2-gram rule; a doc with a repeated 5-gram block
    accrues dup5 char mass; diverse text passes both."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_gopher_repetition,
    )

    spam = "buy now " * 10  # one bigram owns the doc
    block = "one two three four five"
    dup5 = f"{block} {block} filler words tail"  # 5-gram repeats twice
    clean = "q w e r t y u i o p a s d f g h j k l z x c v b n m"
    rows = [
        (1, spam.strip(), "en", "s", 1),
        (2, dup5, "en", "s", 1),
        (3, clean, "en", "s", 1),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_gopher_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in ext_gopher_repetition(spark, tmp).collect()}
    assert out[1].top2_char_frac > 0.2 and not out[1].gopher_ok
    assert out[2].dup5_char_frac > 0.15
    # "one two three four five" occurs at 2 non-overlapping positions
    # plus the 4 bridge grams are unique: mass = 2 * 23 / len
    assert out[2].dup5_char_frac == round(2 * len(block) / len(dup5), 6)
    assert out[3].top2_char_frac < 0.2 and out[3].dup5_char_frac == 0.0
    assert out[3].gopher_ok


def test_source_overlap_matrix_counts_shared_vocab(spark):
    """ext_source_overlap_matrix: two sources sharing a 7-word
    sentence share exactly its three 5-grams; a disjoint source pairs
    with nobody."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_source_overlap_matrix,
    )

    shared = "alpha beta gamma delta epsilon zeta eta"  # 3 distinct 5-grams
    rows = [
        (1, shared + " srcone tail words", "en", "srcA", 1),
        (2, shared + " srctwo other words", "en", "srcB", 1),
        (3, "totally disjoint vocabulary nothing in common here", "en", "srcC", 1),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_ovl_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {(r.src_a, r.src_b): r for r in ext_source_overlap_matrix(spark, tmp).collect()}
    assert set(out) == {("srcA", "srcB")}
    assert out[("srcA", "srcB")].shared_grams == 3
    # each source has 6 distinct 5-grams (10 words), 3 shared
    assert out[("srcA", "srcB")].jaccard == round(3 / (6 + 6 - 3), 6)


def test_tokenizer_fertility_hand_arithmetic(spark):
    """ext_tokenizer_fertility: byte/word/token sums and both ratios
    reproduce hand arithmetic on a tiny bilingual corpus."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_tokenizer_fertility,
    )

    rows = [
        (1, "ab cd", "en", "s", 1),     # 5 bytes, 2 words, 2 bpe tokens
        (2, "x1 y2", "en", "s", 1),     # 5 bytes, 2 words, 4 bpe (letter+digit runs)
        (3, "hello", "de", "s", 1),     # 5 bytes, 1 word, 1 bpe
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_fert_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.lang: r for r in ext_tokenizer_fertility(spark, tmp).collect()}
    en = out["en"]
    assert (en.n_docs, en.n_bytes, en.ws_tokens, en.bpe_ish_tokens) == (2, 10, 4, 6)
    assert en.bytes_per_token == round(10 / 6, 6)
    assert en.tokens_per_word == round(6 / 4, 6)
    de = out["de"]
    assert (de.n_docs, de.n_bytes, de.ws_tokens, de.bpe_ish_tokens) == (1, 5, 1, 1)


def test_split_leakage_detects_planted_train_copy(spark):
    """ext_split_leakage: a test-split doc copied from a train-split
    doc reads leak_frac 1.0; a test doc with fresh vocabulary reads
    0.0; val-split docs (bucket 8) never appear in the output."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.functions.hashing import (
        doc_bucket,
    )
    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_split_leakage,
    )

    probe = (
        spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
        .select("doc_id", doc_bucket("doc_id").alias("b"))
        .collect()
    )
    train_ids = [r.doc_id for r in probe if r.b < 8]
    val_ids = [r.doc_id for r in probe if r.b == 8]
    test_ids = [r.doc_id for r in probe if r.b == 9]
    assert train_ids and val_ids and len(test_ids) >= 2
    leaked = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (train_ids[0], leaked, "en", "s", 1),
        (val_ids[0], "v1 v2 v3 v4 v5 v6", "en", "s", 1),
        (test_ids[0], leaked, "en", "s", 1),                      # full leak
        (test_ids[1], "f1 f2 f3 f4 f5 f6 f7", "en", "s", 1),      # fresh
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_leak_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in ext_split_leakage(spark, tmp).collect()}
    assert set(out) == {test_ids[0], test_ids[1]}
    assert out[test_ids[0]].leak_frac == 1.0
    assert out[test_ids[1]].leak_frac == 0.0 and out[test_ids[1]].n_grams == 3


def test_dsir_resample_matches_manual_formula_and_keeps_argmax(spark):
    """ext_dsir_resample: keep flags reproduce the exact manual
    formula (salted-md5 uniform vs exp(w - w_max)) computed in pure
    Python from the weight table, and the max-weight doc is always
    kept (p = 1 > u)."""
    import hashlib
    import math

    from tests.conftest import SF_SMOKE
    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_dsir_resample,
        ext_dsir_weights,
    )

    weights = {
        r.doc_id: r.micro_logratio for r in ext_dsir_weights(spark, SF_SMOKE).collect()
    }
    wmax = max(weights.values())
    out = {r.doc_id: r.keep for r in ext_dsir_resample(spark, SF_SMOKE).collect()}
    assert set(out) == set(weights)
    kept = 0
    for doc_id, w in weights.items():
        u = int(hashlib.md5(f"rs:{doc_id}".encode()).hexdigest()[:15], 16) / float(
            1 << 60
        )
        expect = u < math.exp((w - wmax) / 1e6)
        assert out[doc_id] == expect, doc_id
        kept += expect
    argmax_doc = max(weights, key=lambda k: weights[k])
    assert out[argmax_doc]
    assert 0 < kept < len(weights)  # a real subset, not all/none


def test_chunk_sliding_covers_doc_with_exact_overlap(spark):
    """ext_chunk_sliding: an 80-word doc cuts into 3 full chunks at
    starts 1/25/49 (the last right-aligned chunk covers through word
    80 — no degenerate subset tail); a short doc yields one full-doc
    chunk; a doc needing clamping (n=90) right-aligns its tail at
    n-W+1=59."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_chunk_sliding,
    )

    words = [f"w{i}" for i in range(1, 81)]
    rows = [
        (1, " ".join(words), "en", "s", 1),
        (2, "a b c", "en", "s", 1),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_chunk_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = sorted(
        (r for r in ext_chunk_sliding(spark, tmp).collect() if r.doc_id == 1),
        key=lambda r: r.chunk_idx,
    )
    assert [(r.start_pos, r.n_tokens) for r in out] == [
        (1, 32),
        (25, 32),
        (49, 32),
    ]
    # overlap check: chunk 1 starts at word 25, chunk 0 ends at 32
    import hashlib

    c1_words = words[24 : 24 + 32]
    assert out[1].chunk_hash == hashlib.md5(" ".join(c1_words).encode()).hexdigest()
    short = [r for r in ext_chunk_sliding(spark, tmp).collect() if r.doc_id == 2]
    assert len(short) == 1 and short[0].n_tokens == 3 and short[0].start_pos == 1
    # clamping case: 90 words -> starts 1, 25, 49, then 59 (=90-32+1)
    rows90 = [(3, " ".join(f"v{i}" for i in range(90)), "en", "s", 1)]
    d90 = spark.createDataFrame(
        rows90, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp90 = tempfile.mkdtemp(prefix="smdp_chunk90_")
    d90.coalesce(1).write.parquet(os.path.join(tmp90, "documents.parquet"))
    out90 = sorted(
        ext_chunk_sliding(spark, tmp90).collect(), key=lambda r: r.chunk_idx
    )
    assert [(r.start_pos, r.n_tokens) for r in out90] == [
        (1, 32),
        (25, 32),
        (49, 32),
        (59, 32),
    ]


def test_confusable_fold_normalizes_homoglyph_spam(spark):
    """fn_confusable_fold: Cyrillic homoglyph spam folds onto its
    Latin form (and collides with it under exact dedup's hash);
    clean ASCII passes through unchanged."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.scalar_fns import (
        fn_confusable_fold,
    )

    spam = "viаgra sеll"  # Cyrillic а and е
    rows = [
        (1, spam, "en", "s", 1),
        (2, "viagra sell", "en", "s", 1),
        (3, "ordinary text", "en", "s", 1),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_conf_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in fn_confusable_fold(spark, tmp).collect()}
    assert out[1].changed and out[1].folded == "viagra sell"
    assert out[1].folded == out[2].folded  # dedup collision restored
    assert not out[2].changed and not out[3].changed


def test_span_corruption_plan_matches_python_reference(spark):
    """ext_span_corruption_plan: flags replicated in Python (same
    salted md5 permille device) agree exactly on n_masked / n_spans /
    mask_rate, and the plan is a pure function of (doc_id, pos)."""
    import hashlib
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        SPAN_MASK_PERMILLE,
        ext_span_corruption_plan,
    )

    def flag(doc_id, i):
        h = hashlib.md5(f"msk:{doc_id}:{i}".encode()).hexdigest()[:15]
        return 1 if int(h, 16) % 1000 < SPAN_MASK_PERMILLE else 0

    texts = {7: " ".join(f"w{j}" for j in range(40)),
             8: " ".join(f"x{j}" for j in range(13)),
             9: "solo"}
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_span_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in ext_span_corruption_plan(spark, tmp).collect()}
    for doc_id, t in texts.items():
        n = len(t.split(" "))
        fl = [flag(doc_id, i) for i in range(1, n + 1)]
        spans = sum(
            f * (1 if i == 0 else 1 - fl[i - 1]) for i, f in enumerate(fl)
        )
        r = out[doc_id]
        assert (r.n_tokens, r.n_masked, r.n_spans) == (n, sum(fl), spans)
        assert r.mask_rate == round(sum(fl) / n, 6)


def test_bm25_rare_term_outranks_common(spark):
    """ext_bm25_topk: a doc carrying the rare query term beats docs
    with only common terms, repeated occurrences raise tf
    sub-linearly, and score_micros matches the closed form."""
    import math
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_bm25_topk,
    )

    # 10 docs of common filler; docs 0/1 add the rare term 'dup'
    filler = "spark " * 9
    texts = {0: (filler + "dup dup").strip(),
             1: (filler + "dup").strip()}
    for i in range(2, 10):
        texts[i] = filler.strip()
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_bm25_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in ext_bm25_topk(spark, tmp).collect()}
    ranks = {r.doc_id: r.rank for r in out.values()}
    assert ranks[0] == 1 and ranks[1] == 2  # rare term dominates
    assert out[0].n_terms_hit == 2 and out[2].n_terms_hit == 1

    def score(tf, df, dl, n_docs, avgdl):
        idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        return round(idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1e6)

    avgdl = (11 + 10 + 8 * 9) / 10.0
    exp0 = score(2, 2, 11, 10, avgdl) + score(9, 10, 11, 10, avgdl)
    assert out[0].score_micros == exp0


def test_tfidf_cosine_pairs_rare_term_blocking(spark):
    """ext_tfidf_cosine_pairs: only pairs sharing a rare term
    (df*10 <= N) become candidates; the cosine is re-scored over the
    FULL vocabulary and matches a Python reference with the same
    milli-rounded weights."""
    import math
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_tfidf_cosine_pairs,
    )

    n = 20
    texts = {i: "common words here" for i in range(n)}
    texts[0] = "common words here zebra"
    texts[1] = "common words here zebra zebra"
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_tfidfp_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = ext_tfidf_cosine_pairs(spark, tmp).collect()
    assert len(out) == 1  # docs 2..19 share only stop terms: blocked
    r = out[0]
    assert (r.doc_a, r.doc_b) == (0, 1)
    assert r.shared_terms == 4  # common, words, here, zebra

    def wm(tf, df):
        return round(tf * math.log(n / df) * 1000.0)

    wz = wm(1, 2), wm(2, 2)          # zebra weights in docs 0 / 1
    w_common = wm(1, n)              # ln(1) = 0 for df == N terms
    dot = 3 * w_common * w_common + wz[0] * wz[1]
    na = 3 * w_common**2 + wz[0] ** 2
    nb = 3 * w_common**2 + wz[1] ** 2
    assert r.cos == round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)


def test_length_bucket_batching_waste_math(spark):
    """ext_length_bucket_batching: bucket = smallest power-of-two
    edge >= n_tok, waste = n_docs*bucket - sum(n_tok), batches =
    ceil(n_docs/8)."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_length_bucket_batching,
    )

    # 9 docs of 10 tokens (bucket 16) + 1 doc of 20 tokens (bucket 32)
    rows = [(i, " ".join(f"w{j}" for j in range(10)), "en", "s", 1) for i in range(9)]
    rows.append((9, " ".join(f"w{j}" for j in range(20)), "en", "s", 1))
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_lenbuck_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.bucket: r for r in ext_length_bucket_batching(spark, tmp).collect()}
    assert set(out) == {16, 32}
    b16 = out[16]
    assert (b16.n_docs, b16.sum_tokens, b16.padded_tokens) == (9, 90, 144)
    assert b16.pad_waste == 54 and b16.n_batches == 2  # ceil(9/8)
    assert b16.waste_rate == round(54 / 144, 6)
    assert out[32].n_batches == 1 and out[32].pad_waste == 12


def test_epoch_shuffle_is_permutation_and_decorrelated(spark):
    """ext_epoch_shuffle_plan: per shard each epoch's positions form
    a bijection onto 0..n-1, epochs genuinely permute (some doc
    moves), and the plan is deterministic across invocations."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_epoch_shuffle_plan,
    )

    rows = [(i, f"text {i}", "en", "s", 6) for i in range(250)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_epoch_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = ext_epoch_shuffle_plan(spark, tmp).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2}  # 250 docs / width 100
    for shard, rs in by_shard.items():
        n = len(rs)
        assert sorted(r.pos_e0 for r in rs) == list(range(n))
        assert sorted(r.pos_e1 for r in rs) == list(range(n))
    assert any(r.moved for r in out)
    again = {r.doc_id: (r.pos_e0, r.pos_e1) for r in ext_epoch_shuffle_plan(spark, tmp).collect()}
    assert all(again[r.doc_id] == (r.pos_e0, r.pos_e1) for r in out)


def test_heavy_hitters_mg_exact_on_planted_skew(spark):
    """agg_heavy_hitters_mg: with one token at ~50% and a long tail
    of singletons, exactly the heavy token is returned with its
    exact count — the MG candidate pass must not lose it and the
    recount must discard tail candidates."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        agg_heavy_hitters_mg,
    )

    # 300 'hot' occurrences + 300 singletons => N=600, hot share 50%
    rows = []
    for i in range(30):
        rows.append((i, " ".join(["hot"] * 10), "en", "s", 1))
    for i in range(30, 60):
        rows.append((i, " ".join(f"tail{i}_{j}" for j in range(10)), "en", "s", 1))
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_mg_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = agg_heavy_hitters_mg(spark, tmp).collect()
    assert len(out) == 1
    assert out[0].term == "hot" and out[0].exact_count == 300
    assert out[0].share == 0.5


def test_feature_hashing_conserves_mass_and_matches_python(spark):
    """ext_feature_hashing: Σfeatures == n_tokens, identical texts
    hash to identical vectors, and bucket indices match a Python
    replication of the salted hash."""
    import hashlib
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        FH_DIM,
        ext_feature_hashing,
    )

    rows = [(1, "alpha beta alpha", "en", "s", 1),
            (2, "alpha beta alpha", "en", "s", 1),
            (3, "gamma", "en", "s", 1)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_fh_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in ext_feature_hashing(spark, tmp).collect()}

    def bucket(t):
        return int(hashlib.md5(f"fh:{t}".encode()).hexdigest()[:15], 16) % FH_DIM

    # driver-canonicalizer-safe contract: features is a space-joined
    # string of FH_DIM bucket counts (position == bucket index)
    vec = {k: [int(x) for x in r.features.split(" ")] for k, r in out.items()}
    for k, r in out.items():
        assert len(vec[k]) == FH_DIM
        assert sum(vec[k]) == r.n_tokens
    assert vec[1] == vec[2]
    assert vec[1][bucket("alpha")] == 2
    assert vec[1][bucket("beta")] == 1
    assert out[1].nnz == 2 and out[3].nnz == 1
    assert vec[3][bucket("gamma")] == 1


def test_vocab_coverage_curve_planted_frequencies(spark):
    """ext_vocab_coverage_curve: with planted token frequencies the
    top-K covered mass is exact at each cutoff, ties at the cutoff
    break by term text, and coverage is monotone reaching 1.0 once
    K >= n_types."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_vocab_coverage_curve,
    )

    # freq: t00 x12, t01..t04 x6 each, t05..t16 x1 => N=48, 17 types
    parts = ["t00"] * 12
    for i in range(1, 5):
        parts += [f"t{i:02d}"] * 6
    parts += [f"t{i:02d}" for i in range(5, 17)]
    d = spark.createDataFrame(
        [(1, " ".join(parts), "en", "s", len(parts))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp(prefix="smdp_cov_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.k: r for r in ext_vocab_coverage_curve(spark, tmp).collect()}
    assert set(out) == {5, 10, 20}
    assert all(r.n_types == 17 for r in out.values())
    assert out[5].covered_tokens == 36   # 12 + 4*6
    assert out[10].covered_tokens == 41  # + five tie-broken singletons
    assert out[20].covered_tokens == 48  # all types fit
    assert out[20].coverage == 1.0
    assert out[5].coverage < out[10].coverage < out[20].coverage


def test_char_entropy_planted_distributions(spark):
    """ext_char_entropy: H=0 for a one-symbol doc, ln2 for a 50/50
    doc, ln4 for uniform-4; buckets, doc counts, and round-6
    min/max follow."""
    import math
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_char_entropy,
    )

    rows = [(1, "aaaa", "en", "s", 4),
            (2, "abab", "en", "s", 4),
            (3, "abcd", "en", "s", 4)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_ent_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.bucket_x10: r for r in ext_char_entropy(spark, tmp).collect()}
    ln2 = round(math.log(2), 6)
    ln4 = round(math.log(4), 6)
    assert set(out) == {0, 6, 13}
    assert out[0].n_docs == 1 and out[0].min_entropy == 0.0
    assert out[6].min_entropy == ln2 and out[6].max_entropy == ln2
    assert out[13].min_entropy == ln4
    assert all(r.total_chars == 4 for r in out.values())


def test_hapax_audit_counts_and_order(spark):
    """ext_hapax_audit: corpus-frequency-1 tokens counted per doc,
    zero-hapax docs still reported, ordering by (n_hapax desc,
    doc_id)."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_hapax_audit,
    )

    rows = [(1, "x y common common", "en", "s", 1),
            (2, "common z", "en", "s", 1),
            (3, "common common", "en", "s", 1)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_hpx_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = ext_hapax_audit(spark, tmp).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]
    assert [r.n_hapax for r in out] == [2, 1, 0]
    assert out[0].n_tokens == 4 and out[0].hapax_share == 0.5
    assert out[1].hapax_share == 0.5 and out[2].hapax_share == 0.0


def test_zipf_fit_recovers_exact_line(spark):
    """ext_zipf_fit: a frequency-of-frequencies curve planted to be
    exactly linear in log-log (f(c) = 4/c for c in {1,2,4}) recovers
    slope -1, r2 = 1, and the milli-quantized intercept ln(4)."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_zipf_fit,
    )

    # counts: a,b,c,d x1; e,f x2; g x4  => ff points (1,4),(2,2),(4,1)
    text = "a b c d e e f f g g g g"
    d = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp(prefix="smdp_zipf_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    row = ext_zipf_fit(spark, tmp).collect()[0]
    assert row.n_points == 3
    assert row.slope == -1.0
    assert row.r2 == 1.0
    assert row.intercept == 1.386  # ln(4) at milli fixed-point


def test_prefix_templates_share_and_short_docs(spark):
    """ext_prefix_templates: three docs sharing an 8-token opening
    mine as one template with share 0.6; a short doc's prefix is its
    whole text; ties break on prefix text."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_prefix_templates,
    )

    head = "h1 h2 h3 h4 h5 h6 h7 h8"
    rows = [(1, head + " tail one", "en", "s", 1),
            (2, head + " other tail", "en", "s", 1),
            (3, head, "en", "s", 1),
            (4, "tiny doc", "en", "s", 1),
            (5, "a b c d e f g h i", "en", "s", 1)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_pfx_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = ext_prefix_templates(spark, tmp).collect()
    assert out[0].prefix == head and out[0].n_docs == 3 and out[0].share == 0.6
    assert {r.prefix for r in out[1:]} == {"tiny doc", "a b c d e f g h"}
    assert all(r.n_docs == 1 and r.share == 0.2 for r in out[1:])


def test_chunk_cdc_matches_python_replica_and_dedups_twins(spark):
    """ext_chunk_cdc: chunk boundaries and fingerprints match a full
    Python replication of the salted rolling hash; duplicate docs
    dedup at chunk level; short docs form one whole-doc chunk."""
    import hashlib
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        CDC_DIVISOR,
        CDC_GRAM,
        ext_chunk_cdc,
    )

    a = " ".join(f"w{i % 13}x{i % 7}" for i in range(60))
    b = "totally different content stream " + " ".join(f"z{i}" for i in range(40))
    docs = [a, a, b, "tiny doc"]
    rows = [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_cdc_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    row = ext_chunk_cdc(spark, tmp).collect()[0]

    def chunks(text):
        w = text.split(" ")
        starts = [1]
        for p in range(2, len(w) - CDC_GRAM + 2):
            gram = " ".join(w[p - 1 : p - 1 + CDC_GRAM])
            h = int(hashlib.md5(f"cdc:{gram}".encode()).hexdigest()[:15], 16)
            if h % CDC_DIVISOR == 0:
                starts.append(p)
        bounds = starts + [len(w) + 1]
        return [" ".join(w[s - 1 : e - 1]) for s, e in zip(bounds, bounds[1:])]

    all_chunks = [c for t in docs for c in chunks(t)]
    assert row.n_docs == 4
    assert row.total_chunks == len(all_chunks)
    assert row.distinct_chunks == len(set(all_chunks))
    assert row.dup_chunks == row.total_chunks - row.distinct_chunks
    assert row.dup_chunks >= len(chunks(a))  # the twin doc fully dedups
    assert len(chunks("tiny doc")) == 1
    total_tok = sum(len(t.split(" ")) for t in docs)
    assert row.mean_chunk_tokens_micro == total_tok * 1_000_000 // row.total_chunks


def test_quality_ablation_solo_vs_cumulative(spark):
    """ext_quality_ablation: planted docs that each fail exactly one
    rule produce the hand-computed solo and cumulative funnel
    counts."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_quality_ablation,
    )

    good = "the cat sat on a mat"           # passes all
    short = "the end"                        # fails words (2 < 5)
    nostop = "cats dogs birds fish mice"     # fails stopword rule
    longw = "the " + " ".join("x" * 30 for _ in range(5))  # fails wlen
    rows = [(i + 1, t, "en", "s", len(t)) for i, t in
            enumerate([good, short, nostop, longw])]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_qa_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.stage: r for r in ext_quality_ablation(spark, tmp).collect()}
    assert out["total"].solo_pass == 4 and out["total"].cum_pass == 4
    assert out["words_5_1000"].solo_pass == 3      # short fails
    assert out["stopword_ge1"].solo_pass == 3      # nostop fails
    assert out["mean_wlen_2_12"].solo_pass == 3    # longw fails
    assert out["words_5_1000"].cum_pass == 3
    assert out["stopword_ge1"].cum_pass == 2       # short + nostop gone
    assert out["mean_wlen_2_12"].cum_pass == 1     # only good survives
    assert out["stopword_ge1"].solo_reject == 1


def test_token_entropy_rate_deterministic_chain(spark):
    """ext_token_entropy_rate: an alternating a-b token stream has
    nonzero unigram entropy but ZERO conditional bigram entropy
    (next token fully determined by the current one)."""
    import math
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_token_entropy_rate,
    )

    d = spark.createDataFrame(
        [(1, "a b a b a", "en", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp(prefix="smdp_ter_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    row = ext_token_entropy_rate(spark, tmp).collect()[0]
    assert row.n_tokens == 5 and row.n_types == 2 and row.n_bigram_types == 2
    hu = (3 * math.log(5 / 3) + 2 * math.log(5 / 2)) / 5
    assert abs(row.unigram_entropy_nats - hu) < 1e-5
    assert row.cond_entropy_nats == 0.0


def test_lm_bigram_score_laplace_exact(spark):
    """ext_lm_bigram_score: hand-computed add-one-smoothed micro
    log-probs on a two-doc corpus, with the unseen-penalty visible
    in the denominator (c_a + V)."""
    import math
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        LM2_SCALE,
        ext_lm_bigram_score,
    )

    rows = [(1, "a b a b a", "en", "s", 9), (2, "a c", "en", "s", 3)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_lm2_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in ext_lm_bigram_score(spark, tmp).collect()}
    # V = 3 (a, b, c); contexts: c_a = 3 (ab x2, ac), c_b = 2 (ba x2)
    lp_ab = round(math.log((2 + 1) / (3 + 3)) * LM2_SCALE)
    lp_ba = round(math.log((2 + 1) / (2 + 3)) * LM2_SCALE)
    lp_ac = round(math.log((1 + 1) / (3 + 3)) * LM2_SCALE)
    assert out[1].n_bigrams == 4
    assert out[1].logprob_micro == 2 * lp_ab + 2 * lp_ba
    assert out[2].n_bigrams == 1 and out[2].logprob_micro == lp_ac
    assert out[2].avg_logprob_micro == lp_ac


def test_keywords_textrank_matches_integer_replica(spark):
    """ext_keywords_textrank: the exact integer PageRank recurrence
    replicated in Python reproduces every score bit-for-bit, and the
    planted hub term ranks first."""
    import os
    import tempfile
    from collections import defaultdict

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        TR_INIT_MICRO,
        TR_ITERS,
        ext_keywords_textrank,
    )

    text = "hub x1 hub x2 hub x3 hub x4 y1 y2"
    d = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp(prefix="smdp_tr_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = ext_keywords_textrank(spark, tmp).collect()

    w = text.split(" ")
    cab = defaultdict(int)
    for a, b in zip(w, w[1:]):
        cab[(a, b)] += 1
    edges = defaultdict(int)
    for (a, b), c in cab.items():
        edges[(a, b)] += c
        edges[(b, a)] += c
    strength = defaultdict(int)
    for (a, _b), c in edges.items():
        strength[a] += c
    score = {t: TR_INIT_MICRO for t in strength}
    for _ in range(TR_ITERS):
        m = defaultdict(int)
        for (a, b), c in edges.items():
            m[b] += (score[a] * c) // strength[a]
        score = {t: 150000 + (85 * m[t]) // 100 for t in m}
    exp = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(r.term, r.score) for r in out] == exp[: len(out)]
    assert out[0].term == "hub"


def test_bpe_learn_steps_exact_merge_sequence(spark):
    """ext_bpe_learn_steps: a planted vocabulary yields the
    hand-derived five-merge sequence with exact counts, the (a,b)
    tie-break, and boundary-safe application (the 'aa b' word is
    never corrupted by the ' a b ' merge and survives to supply the
    step-4 (aa,b) merge)."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_bpe_learn_steps,
    )

    text = "aaab aaab aaab aab aab cde cde fg"
    d = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp(prefix="smdp_bpe_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = [(r.step, r.pair, r.merged, r.pair_count)
           for r in sorted(ext_bpe_learn_steps(spark, tmp).collect())]
    assert out == [
        (1, "a a", "aa", 8),     # aaab x3 (2 each) + aab x2 (1 each)
        (2, "a b", "ab", 3),     # ties (aa,a)=3; 'a' < 'aa' wins
        (3, "aa ab", "aaab", 3),
        (4, "aa b", "aab", 2),   # ties (c,d)=2, (d,e)=2; 'aa' < 'c'
        (5, "c d", "cd", 2),
    ]


def test_bpe_apply_fertility_on_learned_merges(spark):
    """ext_bpe_apply: applying the learner's own merges reproduces
    the hand-derived piece counts (aaab/aab collapse to one piece,
    cde to two, fg stays two chars)."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_bpe_apply,
    )

    text = "aaab aaab aaab aab aab cde cde fg"
    d = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tmp = tempfile.mkdtemp(prefix="smdp_bpea_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    row = ext_bpe_apply(spark, tmp).collect()[0]
    # merges: (a a), (a b), (aa ab), (aa b), (c d)
    # aaab -> 'aaab' (1), aab -> 'aab' (1), cde -> 'cd e' (2), fg -> 'f g' (2)
    assert row.n_words == 8
    assert row.n_pieces == 3 * 1 + 2 * 1 + 2 * 2 + 1 * 2
    assert row.fertility_micro == row.n_pieces * 1_000_000 // 8


def test_pii_census_class_counts(spark):
    """ext_pii_census: the deterministic round-robin decoration puts
    each doc in exactly one PII class; per-source counts follow."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_pii_census,
    )

    rows = [(i, "clean text here", "en", "src", 15) for i in range(6)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_piic_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.pii_class: r for r in ext_pii_census(spark, tmp).collect()}
    assert set(out) == {"email", "phone", "ipv4"}
    for r in out.values():
        assert r.source == "src" and r.n_docs == 2 and r.n_matches == 2


def test_hybrid_rank_fusion_consensus_and_replica(spark):
    """ext_hybrid_rank_fusion: per-leg ranks land as planted (lexical
    leg misses the no-term doc; vector leg ranks by rescaled int8
    dot), rrf_micros equals the 1e6/(60+r) replica, and the fused
    order follows the summed contributions with NULL-legged docs
    contributing one term."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        RRF_K,
        ext_hybrid_rank_fusion,
    )

    docs = [
        (0, "probe doc", "en", "s", 9),  # the query embedding's doc
        (1, "spark spark spark spark", "en", "s", 23),
        (2, "spark vector", "en", "s", 12),
        (3, "window dup", "en", "s", 10),
        (4, "the cat sat", "en", "s", 11),  # no query terms
    ]
    embs = [
        (0, [1.0, 0.0], 0),  # probe
        (1, [-1.0, 0.0], 0),  # anti-parallel: last vector rank
        (2, [0.8, 0.2], 0),
        (3, [0.9, 0.1], 0),
        (4, [1.0, 0.0], 0),  # parallel: vector rank 1
    ]
    tmp = tempfile.mkdtemp(prefix="smdp_rrf_")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(tmp, "embeddings.parquet"))

    out = {r.doc_id: r for r in ext_hybrid_rank_fusion(spark, tmp).collect()}
    # vector leg: 4 (dot 1.0) > 3 (0.9) > 2 (0.8) > 0/1; doc 4 has no
    # query terms so its lexical rank is NULL
    assert out[4].vec_rank == 1 and out[4].lex_rank is None
    assert out[3].vec_rank == 2 and out[2].vec_rank == 3
    # lexical leg: idf dominates — doc 3's two df=1 terms beat doc
    # 2's (df=2 spark + df=1 vector) beat doc 1's repeated df=2 term
    assert out[3].lex_rank == 1 and out[2].lex_rank == 2
    assert out[1].lex_rank == 3
    # the probe doc itself hits neither leg (no query terms; the
    # query vector is excluded from its own candidate set)
    assert 0 not in out

    def contrib(r):
        return int(1_000_000 / (RRF_K + r) + 0.5) if r is not None else 0

    for r in out.values():
        assert r.rrf_micros == contrib(r.lex_rank) + contrib(r.vec_rank)
    fused = sorted(out.values(), key=lambda r: r.fused_rank)
    keys = [(-r.rrf_micros, r.doc_id) for r in fused]
    assert keys == sorted(keys)  # fused order = (micros desc, doc_id)


def test_readability_flesch_formula_and_bands(spark):
    """ext_readability_flesch: known word/sentence/syllable counts
    reproduce the Flesch formula exactly; empty text lands in the
    NULL band with zero words; vowel-less words take the 1-syllable
    floor."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_readability_flesch,
    )

    rows = [
        # 6 words, 2 sentence runs (. !), 6 vowel groups
        (1, "the cat sat. the dog ran!", "en", "s", 1),
        (2, "", "en", "s", 0),
        # 2 vowel-less words -> syllable floor 1 each, 1 sentence floor
        (3, "xxzz qq", "en", "s", 1),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_flesch_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.band: r for r in ext_readability_flesch(spark, tmp).collect()}
    s1 = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)  # 119.19
    s3 = 206.835 - 1.015 * (2 / 1) - 84.6 * (2 / 2)  # 120.205
    assert set(out) == {None, 11, 12}
    assert out[11].n_docs == 1 and abs(out[11].min_score - round(s1, 6)) < 1e-9
    assert out[12].n_docs == 1 and abs(out[12].max_score - round(s3, 6)) < 1e-9
    assert out[None].n_docs == 1 and out[None].n_words == 0
    assert out[None].min_score is None


def test_code_detect_flags_decorated_docs(spark):
    """ext_code_detect: the deterministic deco lands on doc_id%5 in
    {2,4}; symbol and keyword counts are exact and only decorated
    docs clear the flag floor."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_code_detect,
    )

    rows = [(i, "hello world", "en", "s", 1) for i in (1, 2, 3, 4)]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_code_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    (r,) = ext_code_detect(spark, tmp).collect()
    # doc 2: ' if ( n > 0 ) { return n ; }' -> 6 syms, 2 kws, 13 tokens
    # doc 4: ' def f ( x ) : return x * 2' -> 4 syms, 2 kws, 12 tokens
    assert r.n_docs == 4 and r.n_flagged == 2
    assert r.n_sym == 10 and r.n_kw == 4
    assert r.max_score_micro == (3 * 2 + 6) * 1000000 // 13


def test_domain_cap_kept_dropped_and_cut(spark):
    """ext_domain_cap: 30 docs with quality (= distinct tokens) 1..30
    under one source — the cap keeps the top 25, the cut sits at
    quality 6, the best casualty at 5, and kept_tokens is the exact
    sum over the keepers."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        DOMAIN_CAP,
        ext_domain_cap,
    )

    pool = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(pool[:i]), "en", "s", 1) for i in range(1, 31)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_cap_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    (r,) = ext_domain_cap(spark, tmp).collect()
    assert DOMAIN_CAP == 25
    assert r.n_docs == 30 and r.n_kept == 25 and r.n_dropped == 5
    assert r.cut_quality == 6 and r.best_dropped_quality == 5
    assert r.kept_tokens == sum(range(6, 31))


def test_kn_continuation_counts_exact(spark):
    """ext_lm_kn_continuation: a planted 3-bigram corpus gives exact
    continuation/right-type counts and the 1/|B| continuation
    probability."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_lm_kn_continuation,
    )

    rows = [
        (1, "a b", "en", "s", 1),
        (2, "c b", "en", "s", 1),
        (3, "b d", "en", "s", 1),
        (4, "", "en", "s", 0),  # no bigrams
        (5, "solo", "en", "s", 1),  # single token: no bigrams
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_kn_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.word: r for r in ext_lm_kn_continuation(spark, tmp).collect()}
    # distinct bigrams: (a,b) (c,b) (b,d) -> B = 3
    assert set(out) == {"a", "b", "c", "d"}
    assert out["b"].n_left_contexts == 2 and out["b"].n_right_types == 1
    assert out["b"].cont_prob == round(2 / 3, 6)
    assert out["d"].n_left_contexts == 1 and out["d"].n_right_types == 0
    assert out["a"].n_left_contexts == 0 and out["a"].n_right_types == 1
    # top-K order: b first (highest continuation count)
    first = ext_lm_kn_continuation(spark, tmp).collect()[0]
    assert first.word == "b"


def test_ttr_mattr_windows_exact(spark):
    """ext_ttr_mattr: a 40-token doc = one all-distinct window plus
    one all-same window; a 19-token doc contributes nothing."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        MATTR_W,
        ext_ttr_mattr,
    )

    assert MATTR_W == 20
    distinct20 = " ".join(f"w{i}" for i in range(20))
    same20 = " ".join(["dup"] * 20)
    rows = [
        (1, f"{distinct20} {same20}", "en", "s", 1),
        (2, " ".join(f"x{i}" for i in range(19)), "en", "s", 1),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_mattr_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    (r,) = ext_ttr_mattr(spark, tmp).collect()
    assert r.n_windows == 2 and r.distinct_sum == 21
    assert r.mattr == round(21 / 40, 6)
    assert r.min_ttr == round(1 / 20, 6) and r.max_ttr == 1.0


def test_char_ngram_profile_counts_and_rank(spark):
    """ext_char_ngram_profile: planted text gives exact trigram
    counts; short docs contribute nothing; ties rank by trigram."""
    import os
    import tempfile

    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        ext_char_ngram_profile,
    )

    rows = [
        (1, "aaaa", "en", "s", 1),   # trigrams: aaa, aaa
        (2, "abab", "en", "s", 1),   # aba, bab
        (3, "xy", "en", "s", 1),     # too short
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    tmp = tempfile.mkdtemp(prefix="smdp_tri_")
    d.coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
    out = {(r.lang, r.tri): r for r in ext_char_ngram_profile(spark, tmp).collect()}
    assert out[("en", "aaa")].n == 2 and out[("en", "aaa")].rank == 1
    # tie between aba and bab -> lexicographic
    assert out[("en", "aba")].rank == 2 and out[("en", "bab")].rank == 3
    assert len(out) == 3


def test_url_content_cross_planted_classes(spark):
    """`ext_dedup_url_content_cross` (r13): at the smoke SF the corpus
    has NO organic exact-text dups, so the classification is fully
    determined by the planted snapshot universe — every
    recrawl_unchanged pair is (original, its re-fetch), mirrored
    pairs always span two different canonical URLs with equal
    content hash, and all three classes are non-empty."""
    from social_media_data_pipeline_recession_political_sentiment_spark.operators.text_analysis import (
        URLX_REFETCH_MOD,
        URLX_REFETCH_OFFSET,
        ext_dedup_url_content_cross,
    )
    from conftest import SF_SMOKE

    rows = ext_dedup_url_content_cross(spark, SF_SMOKE).collect()
    by_rel = {}
    for r in rows:
        by_rel.setdefault(r.relation, []).append(r)
    assert set(by_rel) == {
        "recrawl_unchanged",
        "recrawl_changed",
        "mirrored_content",
    }
    for r in by_rel["recrawl_unchanged"]:
        assert r.doc_b == r.doc_a + URLX_REFETCH_OFFSET
        assert r.doc_a % URLX_REFETCH_MOD == 0
        assert r.url_a == r.url_b
    for r in by_rel["mirrored_content"]:
        assert r.url_a != r.url_b
    for r in by_rel["recrawl_changed"]:
        assert r.url_a == r.url_b
