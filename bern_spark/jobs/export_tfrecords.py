"""Offline training-data export: framed NER features → TFRecord shards.

The reference's offline batch path is one program: examples →
``filed_based_convert_examples_to_features`` writing a TFRecord file
(run_ner.py:864-885), each example framed by ``convert_single_example``
(run_ner.py:785-847) and serialized under the NER feature schema
(run_ner.py:663-700 — int64 features input_ids / input_mask /
segment_ids / label_ids). This job is the Spark-first composition of the
already-tested pieces:

    W1-W3 sentence_index  →  W4 word_windows (per sentence)
        →  W5/W6 frame_features (Arrow-batched mapInPandas)
        →  S9 write_examples (one TFRecord shard per partition)

Everything between the two Python kernels (sentence split, framing) is
relational; the framing vocab rides as a SparkContext broadcast, so at
10^12-turn scale each executor deserializes it once, not per task
closure. Labels come from an optional mentions relation ((conv_id,
turn_idx, start, end) char spans → BIO over window tokens by overlap);
without one, every token is labeled ``O`` (inference framing — the
reference's predict-path framing does the same, run_ner.py:960-966).

spark-submit usage (cluster contract identical to jobs/resolve.py):

    zip -r bern_spark.zip bern_spark
    spark-submit --master <cluster> --py-files bern_spark.zip \
        bern_spark/jobs/export_tfrecords.py \
        --input  /data/transcripts \
        --vocab  /data/vocab.txt \
        --out    /data/tfrecords \
        --mentions /data/mentions \
        --shuffle-partitions 4096

``--vocab`` is the public BERT ``vocab.txt`` format: one token per line,
id = line number (reference tokenization.py load_vocab:286-296).
"""

from __future__ import annotations

import argparse
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAMED_SCHEMA = (
    "conv_id string, turn_idx int, sent_idx int, win_idx int, n_words int, "
    "ntokens array<string>, input_ids array<long>, input_mask array<long>, "
    "segment_ids array<long>, label_ids array<long>"
)


def bio_labels(
    tokens: list[tuple[str, int, int]],
    base: int,
    spans: list[tuple[int, int]],
    carry_in: bool = False,
    carry_boundary: int | None = None,
) -> list[str]:
    """BIO over W2 tokens by char-span overlap: the first token of each
    mention span gets ``B``, later overlapping tokens ``I``, the rest
    ``O``. ``base`` shifts token offsets (window-relative) into the
    coordinate system of ``spans`` (turn-absolute). ``carry_in=True``
    seeds the previous-span state from the span still open at the window
    boundary, so a mention split by a 30-token window boundary continues
    as ``I`` in the next window instead of restarting ``B`` (the
    reference's CoNLL chunking carries labels through the W4 split,
    run_ner.py; sentence starts still begin fresh). ``carry_boundary``
    is the previous window's last-token END: a span only carries if it
    starts BEFORE that boundary (``s < carry_boundary``) — i.e. it
    actually overlapped a previous token and therefore got its ``B``
    there. Without it a span starting in the inter-window whitespace gap
    would seed ``I`` with no ``B`` opener anywhere (invalid BIO).
    Defaults to ``base`` when the caller has no boundary. Pure kernel."""
    labels = []
    prev_span = None
    if carry_in:
        bound = base if carry_boundary is None else min(carry_boundary, base)
        # the span still open across the boundary: it must reach this
        # window (e >= base) AND have overlapped a previous token
        # (s < bound, where bound is the previous last-token end)
        for s, e in spans:
            if s < bound and e >= base:
                prev_span = (s, e)
                break
    for _tok, ts, te in tokens:
        a, b = base + ts, base + te
        hit = None
        for s, e in spans:
            if a < e and b > s:
                hit = (s, e)
                break
        if hit is None:
            labels.append("O")
        else:
            labels.append("I" if hit == prev_span else "B")
        prev_span = hit
    return labels


def frame_turns(
    turns: DataFrame,
    vocab_ids: dict[str, int],
    mentions: DataFrame | None = None,
    window_tokens: int = 30,
    max_seq_length: int = 128,
    long_word_cap: tuple[int, int] | None = (20, 10),
) -> DataFrame:
    """W1-W6 composed: sentence-split each turn, window each sentence at
    ``window_tokens`` W2 tokens, frame each window with
    :func:`bern_spark.functions.pytext.frame_features`. Returns one row
    per (conv_id, turn_idx, sent_idx, win_idx) with the four NER feature
    arrays plus ``ntokens`` (the framed WordPiece stream, for W7
    detokenize round-trips) and ``n_words`` (the window's W2 word count
    BEFORE WordPiece/framing — sentence spans tile the text and windows
    tile each sentence's tokens, so per turn ``sum(n_words)`` equals the
    turn's whole-text CoNLL token count; the driver's
    ``ner_framing_shape`` oracle pins that invariant in SQL). Window/
    token offsets stay turn-absolute so mention spans label without
    re-anchoring."""
    import pandas as pd

    from bern_spark.functions.pytext import (
        frame_features,
        sentence_spans,
        tokenize_with_offsets,
    )

    # ROUND-7 FUSION: the old composition ran THREE chained Python stages
    # (sentence_spans UDF -> tokens UDF inside word_windows -> framing
    # mapInPandas), paying the JVM<->Arrow transpose + worker launch three
    # times and re-tokenizing each window chunk it had already tokenized
    # (guide §4.1 — control how many times columns cross the boundary).
    # The same per-window computation now runs in ONE mapInPandas over the
    # turns, composing the identical pure kernels (sentence_spans,
    # tokenize_with_offsets, bio_labels, frame_features). Values are
    # unchanged: window chunk boundaries are token boundaries, so a
    # window's token list sliced from the sentence tokenization (offsets
    # re-based to the chunk) IS tokenize_with_offsets(chunk) — the regex
    # cannot merge across a boundary that starts/ends exactly at a token.
    if mentions is not None:
        # sort_array: collect_list order is task-scheduling-dependent, and
        # bio_labels takes the first overlapping span — unsorted spans made
        # labels nondeterministic across runs wherever mentions overlap
        spans = mentions.groupBy("conv_id", "turn_idx").agg(
            F.sort_array(F.collect_list(F.struct("start", "end"))).alias("spans")
        )
        src = turns.select("conv_id", "turn_idx", "text").join(
            spans, ["conv_id", "turn_idx"], "left"
        )
    else:
        src = turns.select("conv_id", "turn_idx", "text").withColumn(
            "spans", F.lit(None).cast("array<struct<start:int,end:int>>")
        )

    sc = turns.sparkSession.sparkContext
    bc_vocab = sc.broadcast(dict(vocab_ids))
    win_t = window_tokens

    def _frame(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab = bc_vocab.value
        cols = [
            "conv_id", "turn_idx", "sent_idx", "win_idx", "n_words",
            "ntokens", "input_ids", "input_mask", "segment_ids", "label_ids",
        ]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                text = r.text
                if not text:
                    continue
                spans = None
                if r.spans is not None and len(r.spans):
                    spans = [(int(s["start"]), int(s["end"])) for s in r.spans]
                for sent_idx, (ss, se) in enumerate(sentence_spans(text)):
                    toks = tokenize_with_offsets(text[ss:se])
                    if not toks:
                        continue
                    n_win = -(-len(toks) // win_t)  # ceil
                    for w in range(n_win):
                        win = toks[w * win_t : (w + 1) * win_t]
                        tstart = win[0][1]
                        # offsets re-based to the window chunk == the old
                        # tokenize_with_offsets(chunk) output (see above)
                        ctoks = [(t, a - tstart, b - tstart) for (t, a, b) in win]
                        words = [t[0] for t in ctoks]
                        if spans is not None:
                            labels = bio_labels(
                                ctoks,
                                ss + tstart,
                                spans,
                                carry_in=w > 0,
                                carry_boundary=(
                                    ss + toks[w * win_t - 1][2] if w > 0 else None
                                ),
                            )
                        else:
                            labels = ["O"] * len(words)
                        f = frame_features(
                            words,
                            labels,
                            vocab,
                            max_seq_length=max_seq_length,
                            long_word_cap=long_word_cap,
                        )
                        rows.append(
                            (
                                r.conv_id, r.turn_idx, sent_idx, w,
                                len(words),
                                f["ntokens"], f["input_ids"], f["input_mask"],
                                f["segment_ids"], f["label_ids"],
                            )
                        )
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(_frame, schema=FRAMED_SCHEMA)


def export_tfrecords(
    turns: DataFrame,
    vocab_ids: dict[str, int],
    out_dir: str,
    mentions: DataFrame | None = None,
    window_tokens: int = 30,
    max_seq_length: int = 128,
    long_word_cap: tuple[int, int] | None = (20, 10),
    shards: int | None = None,
) -> DataFrame:
    """The full job: frame (see :func:`frame_turns`) then sink to
    TFRecord shards via :func:`bern_spark.sources.tfrecord.write_examples`
    (one ``part-NNNNN.tfrecord`` per partition, executor-written, atomic
    publish). ``shards`` repartitions the framed relation first — at
    cluster scale pick it so each shard lands in the 100 MB-1 GB range a
    training dataloader wants, rather than inheriting the upstream
    partitioning. Returns the collected manifest as a DataFrame
    (shard, n_records); calling this function PERFORMS the write."""
    from bern_spark.sources.tfrecord import write_examples

    framed = frame_turns(
        turns,
        vocab_ids,
        mentions=mentions,
        window_tokens=window_tokens,
        max_seq_length=max_seq_length,
        long_word_cap=long_word_cap,
    )
    if shards is not None:
        framed = framed.repartition(shards)
    manifest = write_examples(framed, out_dir)
    # the manifest action drives the sink; checkpoint the tiny result so
    # re-reads never re-run the export
    return manifest.localCheckpoint(eager=True)


def load_vocab(path: str) -> dict[str, int]:
    """BERT ``vocab.txt``: one token per line, id = line number
    (reference tokenization.py:286-296)."""
    with open(path, encoding="utf-8") as f:
        # strip() like the reference loader: a CRLF vocab.txt would
        # otherwise key every token as 'tok\r' and frame pure [UNK]s
        return {line.strip(): i for i, line in enumerate(f) if line.strip()}


def build_vocab(
    turns: DataFrame, text_col: str = "text", top_words: int = 20000
) -> dict[str, int]:
    """Deterministic corpus-derived WordPiece vocab for when no trained
    ``vocab.txt`` exists (benches, tests): specials + the ``top_words``
    most frequent W2 tokens + full single-char and ``##``-continuation
    coverage of those tokens' alphabet, so framing degrades to char
    pieces instead of ``[UNK]`` floods. One distributed count + one
    bounded collect (``limit(top_words)`` — never more than ``top_words``
    rows reach the driver, whatever the corpus size). The count itself
    still scans the full corpus though: at production scale derive the
    vocab ONCE offline and load it with :func:`load_vocab` per job,
    rather than paying a corpus scan inside every export."""
    from bern_spark.operators.extract import tokens_udf

    top = (
        turns.select(F.explode(tokens_udf(F.col(text_col))).alias("t"))
        .groupBy(F.col("t.tok").alias("tok"))
        .count()
        .orderBy(F.desc("count"), "tok")
        .limit(top_words)
    )
    words = [r["tok"] for r in top.collect()]
    chars = sorted({c for w in words for c in w})
    vocab: list[str] = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    seen = set(vocab)
    for t in words + chars + [f"##{c}" for c in chars]:
        if t not in seen:
            seen.add(t)
            vocab.append(t)
    return {t: i for i, t in enumerate(vocab)}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="bern_spark TFRecord export job")
    p.add_argument("--input", required=True, help="transcripts path (parquet)")
    p.add_argument("--vocab", required=True, help="vocab.txt (one token per line)")
    p.add_argument("--out", required=True, help="TFRecord shard directory")
    p.add_argument("--mentions", default=None, help="optional mention spans parquet")
    p.add_argument("--window-tokens", type=int, default=30)
    p.add_argument("--max-seq-length", type=int, default=128)
    p.add_argument("--shards", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("bern_spark_export_tfrecords")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = b.getOrCreate()
    turns = spark.read.parquet(args.input)
    mentions = spark.read.parquet(args.mentions) if args.mentions else None
    manifest = export_tfrecords(
        turns,
        load_vocab(args.vocab),
        args.out,
        mentions=mentions,
        window_tokens=args.window_tokens,
        max_seq_length=args.max_seq_length,
        shards=args.shards,
    )
    for row in manifest.collect():
        print(f"{row['shard']}\t{row['n_records']}")
    spark.stop()


if __name__ == "__main__":
    main()
