"""PubTator source scan + sinks (S1/S7/S8) and regex taggers (U4/J11)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from bern_spark.sources.pubtator import (
    pubtator_docs_to_transcripts,
    quarantine_pubtator,
    read_pubtator,
    to_pub_annotation,
    to_pubtator,
)

PUBTATOR_SAMPLE = """\
123|t|A title here.
123|a|The abstract text with p.V600E mutation.
123\t23\t30\tp.V600E\tProteinMutation\tp.V600E
123\t5\t10\tjunk\tWildType\tx
123\tbad line with few cols

456|t|Only title doc.
789|t|T.
789|a|Abstract.
789\t0\t1\tNo text\tSNP\trs1
"""


@pytest.fixture(scope="module")
def pubtator_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("pub") / "sample.pubtator"
    p.write_text(PUBTATOR_SAMPLE, encoding="utf-8")
    return str(p)


def test_read_pubtator_docs(spark, pubtator_path):
    docs = {r.pmid: r for r in read_pubtator(spark, pubtator_path).collect()}
    assert set(docs) == {"123", "456", "789"}
    assert docs["123"].title == "A title here."
    assert docs["123"].abstract.startswith("The abstract")
    muts = docs["123"].mutations
    assert len(muts) == 1  # WildType filtered (P6)
    assert muts[0].mention == "p.V600E" and muts[0].start == 23
    assert docs["456"].abstract == ""
    assert docs["789"].mutations == []  # 'No text' dropped (P7)


def test_quarantine(spark, pubtator_path):
    q = quarantine_pubtator(spark, pubtator_path).collect()
    assert any("bad line" in r.raw for r in q)


def test_docs_to_transcripts_concat_rule(spark, pubtator_path):
    t = {r.conv_id: r.text for r in
         pubtator_docs_to_transcripts(read_pubtator(spark, pubtator_path)).collect()}
    assert t["123"] == "A title here. The abstract text with p.V600E mutation."
    assert t["456"] == "Only title doc."  # no trailing space when no abstract


def _ann_df(spark):
    from pyspark.sql import types as T

    deno_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("start", T.IntegerType()),
                T.StructField("end", T.IntegerType()),
                T.StructField("mention", T.StringType()),
                T.StructField("etype", T.StringType()),
                T.StructField("oid", T.StringType()),
                T.StructField("norm_ids", T.ArrayType(T.StringType())),
                T.StructField("cluster_id", T.StringType()),
            ]
        )
    )
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("denotations", deno_t),
        ]
    )
    rows = [
        (
            "c1",
            0,
            "take aspirin now",
            [(5, 12, "aspirin", "drug", "C1", ["MESH:D001241", "BERN:C1"], "k1")],
        )
    ]
    return spark.createDataFrame(rows, schema)


def test_pub_annotation_sink(spark):
    out = to_pub_annotation(_ann_df(spark)).collect()[0].value
    d = json.loads(out)
    assert d["sourcedb"] == "c1" and d["sourceid"] == "0"
    assert d["denotations"][0]["span"] == {"begin": 5, "end": 12}
    assert d["denotations"][0]["obj"] == "drug"
    assert d["denotations"][0]["ids"] == ["MESH:D001241", "BERN:C1"]


def test_pubtator_sink(spark):
    out = to_pubtator(_ann_df(spark)).collect()[0].value
    lines = out.strip().split("\n")
    assert lines[0] == "c1_0|t|take aspirin now"
    assert lines[1] == "c1_0\t5\t12\taspirin\tdrug\tMESH:D001241|BERN:C1"


def test_mirna_tagger_and_j11(spark):
    from bern_spark.operators.taggers import (
        mirna_spans_udf,
        normalize_mirna,
        tag_regex_mentions,
    )

    turns = spark.createDataFrame(
        [("c1", 0, "levels of miR-21 and hsa-mir-021-5p and MIR155 rose")],
        ["conv_id", "turn_idx", "text"],
    )
    m = tag_regex_mentions(turns, "miRNA", mirna_spans_udf)
    got = {r.mention for r in m.collect()}
    assert got == {"miR-21", "hsa-mir-021-5p", "MIR155"}
    d = spark.createDataFrame(
        [("MIRBASE:hsa21", "hsa-mir-21"), ("MIRBASE:mmu21", "mmu-mir-21"),
         ("MIRBASE:x155", "xtr-mir-155")],
        ["oid", "name"],
    )
    n = {r.mention: r.oid for r in normalize_mirna(m, d).collect()}
    assert n["miR-21"] == "MIRBASE:hsa21"  # hsa- preferred
    assert n["hsa-mir-021-5p"] == "MIRBASE:hsa21"  # -5p strip + zero strip
    assert n["MIR155"] == "MIRBASE:x155"  # lone candidate wins


def test_pathway_tagger(spark):
    from bern_spark.operators.taggers import make_pathway_udf, tag_regex_mentions

    turns = spark.createDataFrame(
        [("c1", 0, "the MAPK pathway and wnt signaling")],
        ["conv_id", "turn_idx", "text"],
    )
    m = tag_regex_mentions(turns, "pathway", make_pathway_udf(["MAPK", "notch"]))
    got = {r.mention for r in m.collect()}
    assert got == {"MAPK pathway"}


_BIOC = """<?xml version="1.0" encoding="UTF-8"?>
<collection>
  <source>PubTator</source>
  <document>
    <id>123</id>
    <passage>
      <infon key="type">title</infon>
      <offset>0</offset>
      <text>A title with c.1847G&gt;T here.</text>
      <annotation id="0">
        <infon key="identifier">tmVar:c|SUB|G|1847|T</infon>
        <infon key="type">DNAMutation</infon>
        <location offset="13" length="9"/>
        <text>c.1847G&gt;T</text>
      </annotation>
      <annotation id="1">
        <infon key="identifier">MESH:D000001</infon>
        <infon key="type">Chemical</infon>
        <location offset="2" length="5"/>
        <text>title</text>
      </annotation>
    </passage>
    <passage>
      <infon key="type">abstract</infon>
      <offset>30</offset>
      <text>Abstract text with p.V600E variant.</text>
      <annotation id="2">
        <infon key="identifier">tmVar:p|SUB|V|600|E</infon>
        <infon key="type">ProteinMutation</infon>
        <location offset="49" length="7"/>
        <text>p.V600E</text>
      </annotation>
    </passage>
  </document>
  <document>
    <id>456</id>
    <passage>
      <infon key="type">title</infon>
      <offset>0</offset>
      <text>No mutations here.</text>
    </passage>
  </document>
</collection>
"""


def test_bioc_xml_scan(spark, tmp_path):
    from bern_spark.sources.bioc import parse_bioc_collection, read_bioc_xml
    from bern_spark.sources.pubtator import pubtator_docs_to_transcripts

    # pure kernel: mutation-type filter, sort by start, P7 drop
    docs = parse_bioc_collection(_BIOC)
    assert [d["pmid"] for d in docs] == ["123", "456"]
    assert docs[0]["mutations"] == [
        (13, 22, "c.1847G>T", "DNAMutation", "tmVar:c|SUB|G|1847|T"),
        (49, 56, "p.V600E", "ProteinMutation", "tmVar:p|SUB|V|600|E"),
    ]
    assert docs[1]["mutations"] == []
    # unfiltered keeps the Chemical annotation, still sorted by start
    all_docs = parse_bioc_collection(_BIOC, filter_mutation_types=False)
    assert [m[3] for m in all_docs[0]["mutations"]] == [
        "Chemical", "DNAMutation", "ProteinMutation",
    ]

    # distributed scan: same schema as read_pubtator, feeds the
    # transcripts mapper unchanged
    p = tmp_path / "bioc"
    p.mkdir()
    (p / "batch1.xml").write_text(_BIOC)
    df = read_bioc_xml(spark, str(p))
    rows = {r.pmid: r for r in df.collect()}
    assert rows["123"].title == "A title with c.1847G>T here."
    assert rows["123"].mutations[0].asDict() == {
        "start": 13, "end": 22, "mention": "c.1847G>T",
        "mutation_type": "DNAMutation", "normalized_name": "tmVar:c|SUB|G|1847|T",
    }
    assert rows["456"].abstract == ""
    tr = pubtator_docs_to_transcripts(df)
    got = {r.conv_id: r.text for r in tr.collect()}
    assert got["123"] == "A title with c.1847G>T here. Abstract text with p.V600E variant."
    assert got["456"] == "No mutations here."


# ---------------------------------------------------------------------------
# S4: remote PubTator fetch (injectable transport; no network in container)
# ---------------------------------------------------------------------------


def _make_fake_transport():
    """Deterministic stand-in for the NCBI export endpoint: serves one
    PubTator doc per requested pmid (parsed off the real URL shape), with
    an HTML entity to exercise the unescape branch; pmid 999 errors.
    Returned as a NESTED function so cloudpickle ships it by value to
    executors (a module-level test function pickles by reference and the
    workers cannot import the test module)."""

    def fake(url):
        from urllib.parse import parse_qs, urlparse

        pmids = parse_qs(urlparse(url).query)["pmids"][0].split(",")
        if "999" in pmids:
            raise ConnectionError("boom")
        out = []
        for p in pmids:
            out.append(f"{p}|t|Title &amp; co for {p}.")
            out.append(f"{p}|a|Abstract with p.V600E here.")
            out.append(f"{p}\t14\t21\tp.V600E\tProteinMutation\tp.V600E")
            out.append("")
        return "\n".join(out)

    return fake


def test_fetch_pubtator_parses_like_file_scan(spark, tmp_path):
    from bern_spark.sources.remote import fetch_pubtator

    fake = _make_fake_transport()
    pmids = spark.createDataFrame([("11",), ("22",)], ["pmid"])
    docs, errors = fetch_pubtator(pmids, transport=fake)
    assert errors.count() == 0
    got = {r.pmid: r for r in docs.collect()}
    assert set(got) == {"11", "22"}
    assert got["11"].title == "Title & co for 11."  # html.unescape applied
    assert got["22"].mutations[0].mention == "p.V600E"
    assert got["22"].mutations[0].start == 14

    # row-identical to the S1 file scan of the same body
    body = fake("https://x/export/pubtator?pmids=11,22").replace("&amp;", "&")
    f = tmp_path / "same.pubtator"
    f.write_text(body, encoding="utf-8")
    from bern_spark.sources.pubtator import read_pubtator

    scanned = read_pubtator(spark, str(f))
    assert docs.exceptAll(scanned).count() == 0
    assert scanned.exceptAll(docs).count() == 0


def test_fetch_pubtator_quarantines_failed_batches(spark):
    from bern_spark.sources.remote import fetch_pubtator

    # batch_size=1 => pmid 999's request fails alone; others succeed
    pmids = spark.createDataFrame([("11",), ("999",), ("22",)], ["pmid"]).coalesce(1)
    docs, errors = fetch_pubtator(
        pmids, transport=_make_fake_transport(), batch_size=1
    )
    assert {r.pmid for r in docs.collect()} == {"11", "22"}
    errs = errors.collect()
    assert len(errs) == 1
    assert errs[0].batch_pmids == ["999"]
    assert "ConnectionError" in errs[0].error


def test_fetch_pubtator_batches_requests(spark):
    from bern_spark.sources.remote import fetch_pubtator_raw

    fake = _make_fake_transport()

    def spy(url):
        return fake(url)

    pmids = spark.createDataFrame([(str(i),) for i in range(5)], ["pmid"]).coalesce(1)
    raw = fetch_pubtator_raw(pmids, transport=spy, batch_size=2).collect()
    assert len(raw) == 3  # 2+2+1 — batched, not one URL per pmid
    assert all(len(r.batch_pmids) <= 2 for r in raw)
