"""BioC-XML source scan (SURVEY §2.1 S3).

The reference parses BioC-XML responses from the PubTator service with a
driver-side ElementTree loop (pubtator_biocxml2dict_list,
convert.py:201-298): per <document>, the <id> is the pmid, <passage>
elements carry an ``infon key="type"`` of title/abstract plus the text,
and <annotation> elements with a mutation type contribute (offset,
length, mention, type, identifier).

Spark re-expression: XML is not offset-splittable (unlike the PubTator
text format), so the parallel unit is the FILE — ``spark.read.text(...,
wholetext=True)`` distributes whole collections across tasks and an
Arrow-batched ``mapInPandas`` parses each into document rows. BioC
corpora ship as many collection files (one per batch/journal), so file
granularity is the natural 100 TB partitioning; a single pathological
multi-TB collection would need a streaming XML splitter, which no
consumer of the reference has.

Output schema matches ``read_pubtator`` exactly, so
``pubtator_docs_to_transcripts`` accepts either source unchanged.
"""

from __future__ import annotations

import xml.etree.ElementTree as ElTree
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bern_spark.sources.pubtator import MUTATION_TYPES

DOC_SCHEMA = T.StructType(
    [
        T.StructField("pmid", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("abstract", T.StringType()),
        T.StructField(
            "mutations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("start", T.IntegerType()),
                        T.StructField("end", T.IntegerType()),
                        T.StructField("mention", T.StringType()),
                        T.StructField("mutation_type", T.StringType()),
                        T.StructField("normalized_name", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def parse_bioc_collection(xml_text: str, filter_mutation_types: bool = True) -> list[dict]:
    """Parse one BioC collection string into document dicts (pure kernel,
    unit-testable off-Spark). Mirrors convert.py:220-276: passage
    ``infon key='type'`` selects title/abstract, mutation annotations
    keep (offset, offset+length) exclusive-end spans, identifier = first
    infon; mutations sorted by start (O1)."""
    docs: list[dict] = []
    if not xml_text or not xml_text.strip():
        return docs
    root = ElTree.fromstring(xml_text)
    for child in root:
        if child.tag != "document":
            continue
        id_el = child.find("id")
        pmid = id_el.text if id_el is not None else ""
        texts = {"title": "", "abstract": ""}
        mutations: list[tuple] = []
        for passage in child.iter("passage"):
            type_el = passage.find(".//*[@key='type']")
            ptype = type_el.text if type_el is not None else None
            for p_child in passage:
                if p_child.tag == "text" and ptype in texts:
                    texts[ptype] = p_child.text or ""
                elif p_child.tag == "annotation":
                    a_type_el = p_child.find(".//*[@key='type']")
                    etype = a_type_el.text if a_type_el is not None else None
                    if filter_mutation_types and etype not in MUTATION_TYPES:
                        continue
                    loc = p_child.find("location")
                    text_el = p_child.find("text")
                    if loc is None or text_el is None:
                        continue
                    mention = text_el.text or ""
                    if "No text" in mention:  # P7 parity with read_pubtator
                        continue
                    start = int(loc.get("offset"))
                    infons = p_child.findall("infon")
                    mutations.append(
                        (
                            start,
                            start + int(loc.get("length")),
                            mention,
                            etype,
                            infons[0].text if infons else None,
                        )
                    )
        mutations.sort(key=lambda m: m[0])
        docs.append(
            {
                "pmid": pmid,
                "title": texts["title"],
                "abstract": texts["abstract"],
                "mutations": mutations,
            }
        )
    return docs


def read_bioc_xml(
    spark: SparkSession, path: str, filter_mutation_types: bool = True
) -> DataFrame:
    """Scan BioC-XML collection files into one row per document with the
    ``read_pubtator`` schema: (pmid, title, abstract, mutations)."""
    files = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for xml_text in pdf["value"]:
                rows.extend(parse_bioc_collection(xml_text, filter_mutation_types))
            yield pd.DataFrame(
                rows, columns=["pmid", "title", "abstract", "mutations"]
            )

    return files.mapInPandas(parse, schema=DOC_SCHEMA)
