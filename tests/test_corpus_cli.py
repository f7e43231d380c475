"""Corpus CLI: each subcommand end-to-end on a small planted corpus."""

from __future__ import annotations

import pytest

from geedim_spark import corpus_cli


@pytest.fixture()
def corpus(spark, tmp_path):
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest tonight ")
    rows = [
        (0, base * 2, "en", "web", 1),
        (1, base * 2, "en", "web", 1),          # exact dup of 0
        (2, (base * 2).replace("tonight", "today"), "en", "web", 1),  # near
        (3, "unrelated short text entirely", "de", "books", 1),
        (4, "another unrelated document body here", "de", "books", 1),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)
    return p


def test_cli_stats_and_sample(spark, corpus, tmp_path, capsys):
    assert corpus_cli.main(["stats", "--input", corpus], spark=spark) == 0
    out = capsys.readouterr().out
    assert "web" in out and "dup_ratio=0.3333" in out
    dst = str(tmp_path / "sampled")
    corpus_cli.main(["sample", "--input", corpus, "--fraction", "1.0",
                     "--out", dst], spark=spark)
    assert spark.read.parquet(dst).count() == 5


def test_cli_dedup_exact_and_minhash(spark, corpus, capsys):
    corpus_cli.main(["dedup", "--input", corpus], spark=spark)
    assert "5 -> 4 rows" in capsys.readouterr().out  # exact dup collapsed
    corpus_cli.main(["dedup", "--input", corpus, "--method", "minhash"],
                    spark=spark)
    assert "5 -> 3 rows" in capsys.readouterr().out  # near-dup too


def test_cli_prune(spark, corpus, capsys):
    corpus_cli.main(["prune", "--input", corpus, "--permille", "500",
                     "--by", "lang"], spark=spark)
    out = capsys.readouterr().out
    # 3 en docs -> k=2 kept (plus ties), 2 de docs -> k=1 (plus ties)
    assert "prune[500" in out


def test_cli_decontam(spark, corpus, tmp_path, capsys):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog and then "
               "runs far away into the deep dark forest today")],
        "bench_id long, text string")
    bp = str(tmp_path / "bench.parquet")
    bench.write.parquet(bp)
    corpus_cli.main(["decontam", "--input", corpus, "--bench", bp,
                     "--method", "fuzzy"], spark=spark)
    out = capsys.readouterr().out
    # docs 0,1,2 are near-dups of the bench item -> dropped
    assert "5 -> 2 rows" in out
    corpus_cli.main(["decontam", "--input", corpus, "--bench", bp,
                     "--method", "exact", "--min-overlap", "20"],
                    spark=spark)
    assert "rows" in capsys.readouterr().out
    with pytest.raises(SystemExit):
        corpus_cli.main(["decontam", "--input", corpus], spark=spark)
