"""Text-analysis operators on constructed documents (exact expectations)."""

from __future__ import annotations

import pandas as pd
import pytest

from geedim_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        {"doc_id": 0, "text": "The cat and the dog sat. It is that good, for it was fine."},
        {"doc_id": 1, "text": "der hund und die katze das ist nicht ein problem mit allem"},
        {"doc_id": 2, "text": "12345 67890 !!!"},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "le chat est dans la maison et il est pour une vie"},
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_token_stats_exact(spark, docs):
    got = {r["doc_id"]: r for r in text.token_stats(docs).collect()}
    assert got[2]["n_ws_tokens"] == 3
    assert got[2]["n_digit"] == 10
    assert got[2]["n_alpha"] == 0
    assert got[2]["n_punct"] == 3
    assert got[3]["n_ws_tokens"] == 0
    assert got[0]["n_alpha"] > 30


def test_lang_id_heuristic(spark, docs):
    got = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[4] == "fr"
    assert got[2] == "und"  # no stopword hits
    assert got[3] == "und"


def test_quality_score_ranges(spark, docs):
    got = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert 0 <= got[0]["quality"] <= 1
    assert got[0]["quality"] > got[2]["quality"]  # prose beats digit soup
    assert got[3]["quality"] == 0.0
    assert got[0]["stopword_ratio"] > 0.3


def test_fingerprint_prefix_sensitivity(spark, docs):
    got = {r["doc_id"]: r["fp"] for r in text.fingerprint(docs).collect()}
    assert got[0] != got[1]
    assert got[3] == 0  # empty text -> zero hash

def test_top_ngrams_document_vs_term_frequency(spark):
    """Vocabulary op: document frequency counts each doc once per n-gram;
    term frequency counts every occurrence; deterministic tiebreak."""
    import pandas as pd

    from geedim_spark.operators import text as text_ops

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["ababab", "abxyz", None],
    }))
    # document frequency: 'aba'/'bab' appear (distinct) only in doc 0;
    # 'ab' trigrams... n=2 for hand-checkable sets
    out = {r["ngram"]: (r["n_docs"], r["rank"]) for r in
           text_ops.top_ngrams(docs, n=2, k=10).collect()}
    assert out["ab"][0] == 2          # docs 0 and 1 (distinct per doc)
    assert out["ba"][0] == 1          # doc 0 only
    assert out[""][0] == 1 or "" in out  # NULL text -> one empty shingle
    # term frequency: 'ab' occurs 3x in doc 0 + 1x in doc 1 = 4
    tf = {r["ngram"]: r["n_docs"] for r in
          text_ops.top_ngrams(docs, n=2, k=10,
                              distinct_per_doc=False).collect()}
    assert tf["ab"] == 4 and tf["ba"] == 2
    # deterministic order: rank 1 has the max count, ties break by ngram
    ranked = sorted(out.items(), key=lambda kv: kv[1][1])
    counts = [v[0] for _, v in ranked]
    assert counts == sorted(counts, reverse=True)


def test_top_ngrams_plan_is_distributed_topk(spark):
    """Scale guard: the ranking must compile to TakeOrderedAndProject
    (per-partition top-k + driver merge), NOT a global unpartitioned
    window sort over the full n-gram vocabulary."""
    import pandas as pd

    from geedim_spark.operators import text as text_ops

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "text": ["abcabc", "xyzxyz"]}))
    df = text_ops.top_ngrams(docs, n=2, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the only Window node allowed is the k-row rank stamp (post-limit)
    pre_limit = plan.split("TakeOrderedAndProject")[-1]
    assert "Window" not in pre_limit


def test_pack_sequences_contiguous_fill_rule(spark):
    """Packing: pack = floor(tokens-before / max_tokens) within the
    shard's doc_id order; deterministic across layout (repartition must
    not change any assignment)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geedim_spark.operators import text as text_ops

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(8)),
        "text": ["w " * t for t in [3, 4, 2, 6, 1, 5, 2, 2]],
    }))
    out = text_ops.pack_sequences(docs, max_tokens=5, n_shards=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    # one shard -> fill order is doc_id; cum_before: 0,3,7,9,15,16,21,23
    expect = {0: (0, 0), 1: (3, 0), 2: (7, 1), 3: (9, 1),
              4: (15, 3), 5: (16, 3), 6: (21, 4), 7: (23, 4)}
    for d, (cb, pk) in expect.items():
        assert (rows[d]["cum_before"], rows[d]["pack"]) == (cb, pk), d
    # layout independence
    out2 = text_ops.pack_sequences(docs.repartition(7), 5, n_shards=1)
    assert sorted(map(tuple, out.collect())) == \
           sorted(map(tuple, out2.collect()))
    # validation
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_tokens"):
        text_ops.pack_sequences(docs, 0)
    # stats view: token sums per pack add up to the corpus total
    stats = text_ops.pack_stats(docs, 5, n_shards=1)
    assert stats.agg(F.sum("sum_tokens")).first()[0] == 25


def test_redact_and_repetition_closed_forms(spark):
    """Redaction scrubs each category to its token with exact counts;
    repetition stats follow the positional-gram histogram."""
    import pandas as pd

    from geedim_spark.operators import text as text_ops

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a@b.com and c@d.org via https://x.y id 12345678901",
                 "clean prose with no contacts",
                 None],
    }))
    got = {r["doc_id"]: r for r in text_ops.redact(docs).collect()}
    assert (got[0]["n_email"], got[0]["n_url"], got[0]["n_id"]) == (2, 1, 1)
    assert got[0]["redacted"] == "<EMAIL> and <EMAIL> via <URL> id <ID>"
    assert (got[1]["n_email"], got[1]["n_url"], got[1]["n_id"]) == (0, 0, 0)
    assert got[2]["redacted"] == ""  # NULL -> ''

    # 'spamX ' * 4: every 5-gram that recurs is counted positionally
    rep = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "text": ["abcab" * 4, "abcdefghij"]}))
    out = {r["doc_id"]: r for r in
           text_ops.repetition_stats(rep, n=5).collect()}
    # len 20 -> 16 positional 5-grams; period-5 string: each of the 5
    # distinct grams repeats; count: grams at i and i+5 equal
    assert out[0]["n_grams"] == 16
    assert out[0]["n_dup_positions"] == 16
    assert out[0]["max_gram_count"] == 4
    assert out[1]["n_grams"] == 6
    assert out[1]["n_dup_positions"] == 0
    assert out[1]["max_gram_count"] == 1


def test_gopher_rules_each_rule_isolated(spark):
    """One constructed doc per Gopher rule (Rae et al. 2021 A1.1), each
    failing exactly that rule while passing every other."""
    import pandas as pd

    from geedim_spark.operators import text as text_ops

    good = ("the cat and dog have fun with every ball that they find "
            "near the house of our kind old friend today again ") * 2
    rows = [
        {"doc_id": 0, "text": good},                       # passes all
        {"doc_id": 1, "text": "the cat and dog have fun"},  # too few words
        {"doc_id": 2, "text": " ".join(
            ["extraordinarily"] * 50 + ["the", "of", "and"] * 5)},  # mean len
        {"doc_id": 3, "text": good + " " + "#" * 60},      # symbol ratio
        {"doc_id": 4, "text": "\n".join(
            ["- " + good[:40]] * 9 + [good])},              # bullet lines
        {"doc_id": 5, "text": "\n".join(
            [good[:60] + "..."] * 4 + [good] * 6)},         # ellipsis lines
        {"doc_id": 6, "text": good + " " + " ".join(["123"] * 80)},  # alpha
        {"doc_id": 7, "text": " ".join(["zq" + str(i) + "word"
                                        for i in range(50)])},  # stop words
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    out = {r["doc_id"]: r for r in
           text_ops.gopher_rules(docs, min_words=40).collect()}
    flags = ["ok_words", "ok_mean_word_len", "ok_symbol_ratio",
             "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
             "ok_stop_words"]
    assert out[0]["keep"] and all(out[0][f] for f in flags)
    expect_fail = {1: "ok_words", 2: "ok_mean_word_len",
                   3: "ok_symbol_ratio", 4: "ok_bullet_lines",
                   5: "ok_ellipsis_lines", 6: "ok_alpha_words",
                   7: "ok_stop_words"}
    for d, bad in expect_fail.items():
        assert not out[d]["keep"], d
        assert not out[d][bad], (d, bad)
        assert all(out[d][f] for f in flags if f != bad), (d, bad)
    # pure projection: no shuffle anywhere in the plan
    plan = (text_ops.gopher_rules(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_token_rarity_closed_form(spark):
    """Corpus 'a a b' / 'b c' / '': counts a=2 b=2 c=1, N=5; exact
    integer frequency mass + hand-computed unigram NLL; empty doc keeps
    a zero row."""
    import math

    import pandas as pd

    from geedim_spark.operators import text as text_ops

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2], "text": ["a A b", "b c", ""]}))
    out = {r["doc_id"]: r for r in text_ops.token_rarity(docs).collect()}
    assert (out[0]["n_tokens"], out[0]["sum_freq"]) == (3, 6)
    assert out[0]["avg_freq"] == 2.0
    assert out[0]["nll"] == round(-math.log(2 / 5), 6)
    assert (out[1]["n_tokens"], out[1]["sum_freq"]) == (2, 3)
    assert out[1]["nll"] == round(
        -(math.log(2 / 5) + math.log(1 / 5)) / 2, 6)
    assert (out[2]["n_tokens"], out[2]["sum_freq"],
            out[2]["avg_freq"], out[2]["nll"]) == (0, 0, 0.0, 0.0)
    # scale shape: hash aggregates + a 1-row broadcast, no window
    plan = (text_ops.token_rarity(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "HashAggregate" in plan and "WindowExec" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def _dsir_ref(rows, n_buckets, alpha=1.0, salt="dsir-v1"):
    """Independent pure-Python replication of the DSIR model (hashlib
    md5, collections.Counter) — no shared code with the operator."""
    import hashlib
    import math
    import re
    from collections import Counter

    def feats(t):
        toks = [w.lower() for w in re.split(r"\s+", t or "") if w != ""]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(f):
        h = hashlib.md5((f + salt).encode()).hexdigest()[:8]
        return int(h, 16) % n_buckets

    per = {d: Counter(bucket(f) for f in feats(t)) for d, t, _ in rows}
    t_cnt, r_cnt = Counter(), Counter()
    for d, _, tgt in rows:
        if tgt is True:
            t_cnt.update(per[d])
        elif tgt is False:
            r_cnt.update(per[d])
    t_tot, r_tot = sum(t_cnt.values()), sum(r_cnt.values())

    def lr(b):
        return (math.log((t_cnt[b] + alpha) / (t_tot + alpha * n_buckets))
                - math.log((r_cnt[b] + alpha) / (r_tot + alpha * n_buckets)))

    return {d: (sum(per[d].values()),
                round(sum(c * lr(b) for b, c in sorted(per[d].items())), 6))
            for d, _, _ in rows}


def test_dsir_weights_vs_independent_model(spark):
    """Full model parity vs the hashlib/Counter reimplementation;
    target-like raw text outscores junk; empty and NULL-target rows."""
    from pyspark.sql import functions as F

    from geedim_spark.operators import text as text_ops

    rows = [
        (0, "good clean prose is good", True),
        (1, "good clean prose is good", True),
        (2, "zzz qqq xxx junk junk", False),
        (3, "good clean prose", False),
        (4, "zzz qqq xxx", False),
        (5, "", False),
        (6, "good prose maybe", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {r["doc_id"]: r for r in text_ops.dsir_weights(
        df, F.col("tgt"), n_buckets=64).collect()}
    want = _dsir_ref(rows, n_buckets=64)
    for d, (n_feats, lw) in want.items():
        assert got[d]["n_feats"] == n_feats, d
        assert got[d]["log_weight"] == pytest.approx(lw, abs=2e-6), d
    # the importance-resampling contract: target-like raw > junk raw
    assert got[3]["log_weight"] > got[4]["log_weight"]
    assert (got[5]["n_feats"], got[5]["log_weight"]) == (0, 0.0)
    assert got[6]["is_target"] is None and got[6]["n_feats"] > 0
    with pytest.raises(ValueError, match="n_buckets"):
        text_ops.dsir_weights(df, F.col("tgt"), n_buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        text_ops.dsir_weights(df, F.col("tgt"), alpha=0.0)


def test_dsir_weights_layout_independent_and_broadcast_plan(spark):
    """Same rows regardless of partitioning; the model join broadcasts
    (corpus text never shuffles for scoring) and no window exists."""
    from pyspark.sql import functions as F

    from geedim_spark.operators import text as text_ops

    rows = [(i, f"tok{i % 3} tok{i % 5} filler words here", i % 2 == 0)
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = text_ops.dsir_weights(df, F.col("tgt"), n_buckets=32)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, text_ops.dsir_weights(
        df.repartition(7), F.col("tgt"), n_buckets=32).collect()))
    assert a == b
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan and "WindowExec" not in plan


def test_length_quantiles_exact_type1(spark):
    """Lengths [1,2,2,3,100], N=5: type-1 quantiles at known cut points;
    permille=1000 is the max, permille=1 the min; empty corpus -> no
    rows; validation on out-of-range permille."""
    from geedim_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(0, "a"), (1, "a b"), (2, "x  y"), (3, "a b c"),
         (4, " ".join(["t"] * 100))],
        "doc_id long, text string")
    got = {r["permille"]: r for r in text_ops.length_quantiles(
        docs, permille=(1, 200, 500, 800, 1000)).collect()}
    assert all(r["n_docs"] == 5 for r in got.values())
    assert {p: r["value"] for p, r in got.items()} == {
        1: 1, 200: 1, 500: 2, 800: 3, 1000: 100}
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert text_ops.length_quantiles(empty).count() == 0
    with pytest.raises(ValueError, match="permille"):
        text_ops.length_quantiles(docs, permille=(0,))
    with pytest.raises(ValueError, match="permille"):
        text_ops.length_quantiles(docs, permille=(1001,))
    # the only window runs AFTER the histogram agg (bounded value domain):
    # HashAggregate must appear below Window in the plan tree
    plan = (text_ops.length_quantiles(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Window" in plan and "HashAggregate" in plan
    # plans print top-down: the histogram agg (deepest HashAggregate)
    # must sit BELOW the window, i.e. later in the printed tree
    assert plan.rindex("HashAggregate") > plan.index("Window")


def test_domain_stats_closed_form(spark):
    """Source A: 3 docs, one exact dup pair, two langs; source B: one
    NULL-text doc; NULL source groups under ''."""
    import pandas as pd

    from geedim_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(0, "x", "en", "A", 1), (1, "x", "en", "A", 1),
         (2, "y", "de", "A", 1), (3, None, "en", "B", 0),
         (4, "z", "en", None, 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = {r["source"]: r for r in text_ops.domain_stats(docs).collect()}
    a = out["A"]
    assert (a["n_docs"], a["n_chars"], a["n_unique_texts"],
            a["n_langs"]) == (3, 3, 2, 2)
    assert a["dup_ratio"] == round(1.0 - 2.0 / 3.0, 6)
    assert a["mean_chars"] == 1.0
    b = out["B"]
    assert (b["n_docs"], b["n_unique_texts"], b["dup_ratio"]) == (1, 1, 0.0)
    assert (out[""]["n_docs"], out[""]["n_unique_texts"]) == (1, 1)
    # scale shape: 2-phase hash agg only — no window, no sort
    plan = (text_ops.domain_stats(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "HashAggregate" in plan and "WindowExec" not in plan


def test_tfidf_top_terms_closed_form(spark):
    """Corpus 'apple apple banana' / 'banana cherry' / '': hand-computed
    tf/df/score; rank keys are exact integers (tf DESC, df ASC, term)."""
    import math

    import pandas as pd
    import pytest as _pytest

    from geedim_spark.operators import text as text_ops

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["Apple apple banana", "banana cherry", ""]}))
    rows = text_ops.tfidf_top_terms(docs, k=3).collect()
    got = {(r["doc_id"], r["rank"]): r for r in rows}
    assert len(rows) == 4  # 2 + 2 + 0
    r01 = got[(0, 1)]
    assert (r01["term"], r01["tf"], r01["df"]) == ("apple", 2, 1)
    assert r01["score"] == round(2 * math.log(3.0 / 1), 6)
    assert got[(0, 2)]["term"] == "banana"
    # d1: equal tf=1 -> df ASC puts cherry (df=1) above banana (df=2)
    assert got[(1, 1)]["term"] == "cherry"
    assert got[(1, 1)]["score"] == round(math.log(3.0), 6)
    assert got[(1, 2)]["term"] == "banana"
    with _pytest.raises(ValueError, match="k must be"):
        text_ops.tfidf_top_terms(docs, k=0)


def test_quality_prune_closed_form(spark):
    """en: scores 1000/500/250/0, k=ceil(2.0)=2 at permille=500 -> cut
    is the 2nd-best score (500); ties at the cut are kept (both 500s);
    de: singleton always kept."""
    import pandas as pd
    import pytest as _pytest

    from geedim_spark.operators import text as text_ops

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["abcd", "ab12", "a123", "1234", "xy34", ""],
        "lang": ["en", "en", "en", "en", "en", "de"],
    }))
    # en scores: 1000, 500, 250, 0, 500, (de: 0)
    out = text_ops.quality_prune(docs, permille=500)
    rows = {r["doc_id"]: r for r in out.collect()}
    # k = (500*5+999) DIV 1000 = 3 -> cut = 3rd best = 500; keep ties
    assert set(rows) == {0, 1, 4, 5}
    assert rows[0]["score"] == 1000 and rows[0]["cut"] == 500
    assert rows[1]["score"] == 500 and rows[4]["score"] == 500
    assert rows[5]["score"] == 0 and rows[5]["cut"] == 0  # singleton kept
    assert rows[0]["n_group_docs"] == 5
    with _pytest.raises(ValueError, match="permille"):
        text_ops.quality_prune(docs, permille=0)
    # scale shape: the only window runs over the BOUNDED (group, score)
    # histogram — the corpus itself never sorts; cuts broadcast back
    plan = (text_ops.quality_prune(docs)._jdf.queryExecution()
            .executedPlan().toString())
    spec = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert spec and all("_grp" in ln for ln in spec)
    assert "BroadcastExchange" in plan


def test_chunk_documents_closed_form(spark):
    """9-char doc, size 4 / overlap 1 (stride 3): chunks at 0,3,6 with
    the last one short; exact reconstruction property: stripping the
    overlap from every chunk after the first rebuilds the text; empty
    doc yields no chunks."""
    import pandas as pd
    import pytest as _pytest

    from geedim_spark.operators import text as text_ops

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "text": ["abcdefghi", ""]}))
    rows = sorted(
        text_ops.chunk_documents(docs, size=4, overlap=1).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]))
    assert [(r["chunk_idx"], r["chunk_text"], r["chunk_start"]) for r in rows] == [
        (0, "abcd", 0), (1, "defg", 3), (2, "ghi", 6)]
    rebuilt = rows[0]["chunk_text"] + "".join(
        r["chunk_text"][1:] for r in rows[1:])
    assert rebuilt == "abcdefghi"
    assert all(r["doc_id"] == 0 for r in rows)  # empty doc: nothing
    with _pytest.raises(ValueError, match="overlap"):
        text_ops.chunk_documents(docs, size=4, overlap=4)
    with _pytest.raises(ValueError, match="size"):
        text_ops.chunk_documents(docs, size=0)
    # exact-cover boundary: len == size -> exactly one chunk
    one = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["abcd"]}))
    assert text_ops.chunk_documents(one, size=4, overlap=1).count() == 1


def test_dsir_kernel_buckets_match_catalyst(spark):
    """The r6 map-side bucket kernel must replay the Catalyst bucket
    expression exactly — conv(substring(md5(concat(feat, salt)),1,8),16,10)
    % n_buckets — including multi-byte UTF-8 features and features whose
    salted form exceeds one MD5 block (>55 bytes, hashlib fallback), and
    full output parity must hold on such a corpus."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geedim_spark.operators import text as text_ops

    long_tok = "x" * 80                       # salted feature > 55 bytes
    rows = [
        (0, f"héllo wörld {long_tok} the the", True),
        (1, f"{long_tok} {long_tok}", False),  # long bigram too
        (2, "", False),
        (3, "plain ascii words", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = {r["doc_id"]: r for r in text_ops.dsir_weights(
        df, F.col("tgt"), n_buckets=64).collect()}
    want = _dsir_ref(rows, n_buckets=64)
    for d, (n_feats, lw) in want.items():
        assert out[d]["n_feats"] == n_feats, d
        assert out[d]["log_weight"] == pytest.approx(lw, abs=2e-6), d
    assert (out[2]["n_feats"], out[2]["log_weight"]) == (0, 0.0)
