"""Corpus CLI — the training-data pipeline's operator set as a command
line, the text-side counterpart of the geedim-parity chained CLI
(`cli.py`).  One subcommand per curation stage, documents parquet in,
parquet out:

    python -m geedim_spark.corpus_cli stats  --input docs.parquet
    python -m geedim_spark.corpus_cli dedup  --input docs.parquet \
        --method minhash --out /tmp/deduped
    python -m geedim_spark.corpus_cli prune  --input docs.parquet \
        --permille 400 --by lang --out /tmp/pruned
    python -m geedim_spark.corpus_cli sample --input docs.parquet \
        --fraction 0.25 --salt mix-v1 --out /tmp/sampled
    python -m geedim_spark.corpus_cli decontam --input docs.parquet \
        --bench bench.parquet --method fuzzy --out /tmp/clean

Every stage prints a one-line row-count summary (in -> out) so a
pipeline log shows exactly what each filter cost.  All operators are the
driver-oracled ones from ``geedim_spark.operators`` — the CLI adds no
semantics of its own.
"""

from __future__ import annotations

import argparse


def _write(df, out: str | None, label: str, n_in: int | None = None) -> int:
    n = df.count()
    left = f"{n_in} -> " if n_in is not None else ""
    print(f"{label}: {left}{n} rows" + (f" -> {out}" if out else ""))
    if out:
        df.write.mode("error").parquet(out)
    return n


def main(argv: list[str] | None = None, spark=None) -> int:
    from geedim_spark.operators import dedup, sampling, text
    from geedim_spark.session import get_session

    p = argparse.ArgumentParser(prog="geedim_spark.corpus_cli")
    p.add_argument("cmd", choices=(
        "stats", "dedup", "prune", "sample", "decontam"))
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--out", default=None, help="output parquet dir")
    p.add_argument("--master", default=None)
    # dedup
    p.add_argument("--method", default="exact",
                   choices=("exact", "minhash", "fuzzy"),
                   help="dedup: exact|minhash; decontam: exact|fuzzy")
    # prune
    p.add_argument("--permille", type=int, default=500)
    p.add_argument("--by", default="lang")
    # sample
    p.add_argument("--fraction", type=float, default=0.1)
    p.add_argument("--salt", default="")
    # decontam
    p.add_argument("--bench", default=None,
                   help="benchmark parquet with (bench_id, text)")
    p.add_argument("--min-overlap", type=int, default=1)
    args = p.parse_args(argv)

    spark = spark or get_session("geedim_spark_corpus", master=args.master)
    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    if args.cmd == "stats":
        out = text.domain_stats(docs)
        for r in out.orderBy("source").collect():
            print(f"  {r['source'] or '<none>':<12} docs={r['n_docs']:<7} "
                  f"dup_ratio={r['dup_ratio']:.4f} langs={r['n_langs']}")
        _write(out, args.out, "stats")
    elif args.cmd == "dedup":
        if args.method == "minhash":
            pairs = dedup.minhash_lsh_pairs(docs)
            comps = dedup.dup_components(docs, pairs)
            survivors = dedup.apply_components(docs, comps)
        else:
            survivors = docs.join(
                dedup.apply_exact(docs).select("doc_id"), "doc_id")
        _write(survivors, args.out, f"dedup[{args.method}]", n_in)
    elif args.cmd == "prune":
        kept = text.quality_prune(docs, permille=args.permille, by=args.by)
        out = docs.join(kept.select("doc_id"), "doc_id")
        _write(out, args.out, f"prune[{args.permille}‰ by {args.by}]", n_in)
    elif args.cmd == "sample":
        out = sampling.deterministic_sample(
            docs, "doc_id", args.fraction, salt=args.salt)
        _write(out, args.out, f"sample[{args.fraction}]", n_in)
    elif args.cmd == "decontam":
        if not args.bench:
            p.error("decontam requires --bench")
        bench = spark.read.parquet(args.bench)
        if args.method == "fuzzy":
            flagged = (
                dedup.fuzzy_decontam(docs, bench)
                .where("contaminated").select("doc_id").distinct()
            )
            out = docs.join(flagged, "doc_id", "left_anti")
        else:
            out = dedup.decontaminate(
                docs, bench, min_overlap=args.min_overlap)
        _write(out, args.out, f"decontam[{args.method}]", n_in)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
